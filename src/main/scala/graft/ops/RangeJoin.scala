package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Driver-checked query: events routed into 20 derived half-open
    * "maintenance windows" (each covers the first half of its 1/20th
    * slice of the event-time span — so a meaningful fraction of events
    * match nothing and windows genuinely select). Every boundary is
    * integer microsecond arithmetic from min/max(ts), so the oracle
    * rebuilds the identical intervals; the join itself is the bucketed
    * composition above (hash join on bucket ids — PlanSpec asserts no
    * nested-loop fallback), with a 1-hour bucket near the window
    * length. */
  def windowAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val bounds = ev.agg(min("t").as("lo"), max("t").as("hi"))
    val wins = bounds
      .withColumn("window_id", explode(sequence(lit(0L), lit(19L))))
      .select(col("window_id"),
        (col("lo") + col("window_id") * expr("(hi - lo) div 20")).as("w_start"),
        (col("lo") + col("window_id") * expr("(hi - lo) div 20")
          + expr("(hi - lo) div 40")).as("w_end"))
    pointInInterval(ev, wins, "t", "w_start", "w_end",
        bucketWidth = 3600L * 1000000L)
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
           count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .orderBy("window_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x74_range_join_windows" -> windowAudit)

  val oracles: Map[String, String] = Map(
    "x74_range_join_windows" -> """
      WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
      ks(k) AS (SELECT unnest(range(0, 20))),
      wins AS (SELECT k AS window_id,
          lo + k * ((hi - lo) // 20) AS w_start,
          lo + k * ((hi - lo) // 20) + (hi - lo) // 40 AS w_end
        FROM b CROSS JOIN ks)
      SELECT w.window_id, COUNT(*) AS n_events,
        COUNT(*) FILTER (e.event_type = 'purchase') AS n_purchases
      FROM events e JOIN wins w
        ON epoch_us(e.ts) BETWEEN w.w_start AND w.w_end
      GROUP BY 1 ORDER BY 1""")
}
