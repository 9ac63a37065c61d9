package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark plans a plain
  * `p BETWEEN start AND end` join as BroadcastNestedLoop/cartesian —
  * O(n·m) and a driver OOM at scale. The scalable composition: pick a
  * bucket width, register each interval in every fixed-width bucket it
  * overlaps, route each point to its single bucket, hash-join on the
  * bucket, exact-filter the survivors.
  *
  * Cost: one shuffle of (points + interval×overlap) on bucket ids. Pick
  * `bucketWidth` near the typical interval length so replication stays
  * O(1) per interval (log the replication factor when tuning).
  */
object RangeJoin {

  /** Inner join: every (point row, interval row) pair with
    * start <= point <= end. Point/start/end are long-valued columns
    * (callers convert timestamps via unix_micros first). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals.withColumn("__b",
      explode(sequence(floorDiv(col(startCol), bucketWidth),
                       floorDiv(col(endCol), bucketWidth))))
    p.join(iv, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }

  /** Exact floor division on longs: subtract the non-negative pmod so
    * the numerator divides exactly, then integer `div`. (Float division
    * would round in the 53-bit mantissa for large epoch values; bare
    * `div` truncates toward zero for negatives.) */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    val q = c.cast("long")
    val exact = q - pmod(q, lit(w)) // exactly divisible by w
    toColumn(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpression(exact), toExpression(lit(w))))
  }
}
