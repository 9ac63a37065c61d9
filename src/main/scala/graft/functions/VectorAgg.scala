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
}
