package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates for vector columns. Element-wise mean of an
  * array<double> column as ONE aggregation (the alternative —
  * posexplode → per-position avg → collect_list reassembly — shuffles
  * dim× more rows and pays two aggregations; this buffer is a single
  * running (sum[dim], count) per group, partial-aggregated map-side
  * exactly like any built-in agg).
  */
object VectorAgg {

  /** (running element-wise sum, row count) */
  type Buf = (Array[Double], Long)

  val vectorAvgAggregator: Aggregator[Seq[Double], Buf, Seq[Double]] =
    new Aggregator[Seq[Double], Buf, Seq[Double]] {
      override def zero: Buf = (Array.emptyDoubleArray, 0L)

      override def reduce(b: Buf, v: Seq[Double]): Buf = {
        if (v == null) return b
        val sum = if (b._1.length == 0) new Array[Double](v.length) else b._1
        var i = 0
        while (i < v.length) { sum(i) += v(i); i += 1 }
        (sum, b._2 + 1)
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a._2 == 0) return b
        if (b._2 == 0) return a
        val sum = a._1
        var i = 0
        while (i < sum.length) { sum(i) += b._1(i); i += 1 }
        (sum, a._2 + b._2)
      }

      override def finish(b: Buf): Seq[Double] =
        if (b._2 == 0) Seq.empty
        else b._1.map(_ / b._2).toSeq

      override def bufferEncoder: Encoder[Buf] =
        Encoders.tuple(
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
          Encoders.scalaLong)

      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Element-wise mean of an array<double> column. */
  def vectorAvg(v: Column): Column = udaf(vectorAvgAggregator).apply(v)

  /** Element-wise SUM of an array<long> column — the ORDER-INDEPENDENT
    * (and therefore engine-portable) sibling of [[vectorAvg]]: integer
    * addition is exact and commutative, so the result is identical
    * under any partial-aggregation order, which is what lets the
    * quantized IVF centroids sit under an exact DuckDB oracle
    * (cosine is scale-invariant, so a sum vector ranks exactly like
    * the mean vector it is n× of). */
  val vectorSumLongAggregator: Aggregator[Seq[Long], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray

      override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
        if (v == null) return b
        val sum = if (b.length == 0) new Array[Long](v.length) else b
        var i = 0
        while (i < v.length) { sum(i) += v(i); i += 1 }
        sum
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.length == 0) return b
        if (b.length == 0) return a
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

      override def finish(b: Array[Long]): Seq[Long] = b.toSeq

      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Element-wise sum of an array<long> column. */
  def vectorSumLong(v: Column): Column = udaf(vectorSumLongAggregator).apply(v)
}
