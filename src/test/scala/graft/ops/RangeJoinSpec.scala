package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val intervals = Seq( // (iv_id, lo, hi)
    (1L, 0L, 99L),
    (2L, 50L, 149L),      // overlaps iv 1
    (3L, 1000L, 1000L),   // zero-length
    (4L, -250L, -100L))   // negative range (floor-div edge)
    .toDF("iv_id", "lo", "hi")

  private val points = Seq( // (p_id, p)
    (10L, 75L),    // in iv1 + iv2
    (11L, 149L),   // iv2 boundary (inclusive)
    (12L, 1000L),  // exactly the zero-length iv3
    (13L, -150L),  // in iv4
    (14L, 5000L))  // nowhere
    .toDF("p_id", "p")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed range join equals the naive inequality join") {
    val naive = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))
    for (width <- Seq(7L, 64L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", width)
      assert(pairs(bucketed) == pairs(naive), s"width $width diverged")
    }
  }

  test("expected matches, including boundaries, zero-length and negatives") {
    val out = pairs(RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64L))
    assert(out == Set((10L, 1L), (10L, 2L), (11L, 2L), (12L, 3L), (13L, 4L)))
  }

  test("plan is a hash join on buckets, not a nested-loop product") {
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated:\n$plan")
  }
}
