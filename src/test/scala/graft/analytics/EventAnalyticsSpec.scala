package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  test("daily spine covers every day in span, zero-filling the gaps") {
    val rows = EventAnalytics.dailySpine(spark, sfDir).collect()
    val days = rows.map(_.getString(0))
    // contiguous: one row per calendar day from min to max, no holes
    assert(days.length ==
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last)) + 1)
    assert(days.sorted.sameElements(days))
    // the rare-event filter leaves genuine gaps, and they carry zeros
    val zeros = rows.filter(_.getLong(1) == 0L)
    assert(zeros.nonEmpty && zeros.forall(_.getDouble(2) == 0.0))
  }

  test("tumbling window counts sum to total events") {
    val ev = graft.Tables.load(spark, sfDir, "events").count()
    val agg = EventAnalytics.tumblingCounts(spark, sfDir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(agg == ev)
  }

  test("sliding 1h/30m windows: every event lands in exactly 2 windows") {
    val ev = graft.Tables.load(spark, sfDir, "events").count()
    val agg = EventAnalytics.slidingCounts(spark, sfDir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(agg == 2 * ev)
  }

  test("sessionize: session counts sum to total events; gaps respected") {
    import spark.implicits._
    val out = EventAnalytics.sessionize(spark, sfDir).cache()
    val ev = graft.Tables.load(spark, sfDir, "events").count()
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == ev)
    // session ids are dense 1..n per user
    val bad = out.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("sessionize splits on gap > 30 min (synthetic frame)") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:10:00", 2L),  // same session (10 min)
      (1L, "2024-01-01 11:00:00", 3L),  // new session (50 min gap)
      (2L, "2024-01-01 10:00:00", 4L))
      .toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    df.select("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sess = EventAnalytics.sessionize(spark, dir).collect()
    assert(sess.count(_.getAs[Long]("user_id") == 1L) == 2)
    assert(sess.count(_.getAs[Long]("user_id") == 2L) == 1)
  }

  test("funnel: converted <= purchasers <= users") {
    val r = EventAnalytics.funnel(spark, sfDir).collect()(0)
    val (users, viewers, purchasers, converted) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(converted <= purchasers && purchasers <= users && viewers <= users)
  }

  test("sampled percentiles track the exact form within sampling error") {
    val exact = EventAnalytics.valuePercentiles(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Long]("n"))).toMap
    val sampled = EventAnalytics.sampledPercentiles(spark, sfDir).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (p50e, p95e, n) = exact(et)
      val nS = r.getAs[Long]("n_sampled")
      // 10% deterministic sample: size within a loose binomial band
      assert(nS > n / 20 && nS < n / 5, s"$et sample size $nS of $n")
      // values are uniform[0,200] at sf0.001 (~200 events/type sampled
      // to ~20): the p50 of a 20-row sample sits within ±25 units; the
      // p95 is effectively the sample max (order statistic 19/20) whose
      // spread is wider — ±50 covers it (measured 41 on one type)
      assert(math.abs(r.getAs[Double]("p50") - p50e) < 25.0, s"$et p50 off")
      assert(math.abs(r.getAs[Double]("p95") - p95e) < 50.0, s"$et p95 off")
    }
  }

  test("SCD2 intervals: one open interval per user, compacted, chained") {
    val out = EventAnalytics.scd2StateIntervals(spark, sfDir).cache()
    val ev = graft.Tables.load(spark, sfDir, "events")
    val nUsers = ev.select("user_id").distinct().count()
    // exactly one current (open) interval per user
    assert(out.filter(col("is_current") === 1).count() == nUsers)
    assert(out.groupBy("user_id")
      .agg(sum("is_current").as("n_open"))
      .filter(col("n_open") =!= 1).count() == 0)
    // compaction: row count equals the independent state-change count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val nChanges = ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("event_type") =!= col("prev")).count()
    assert(out.count() == nChanges)
    // chaining: within a user, every non-current interval's valid_to is
    // some interval's valid_from (the history has no holes)
    val holes = out.filter(col("is_current") === 0).alias("a")
      .join(out.alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.valid_to") === col("b.valid_from"), "left_anti")
    assert(holes.count() == 0)
    out.unpersist()
  }

  test("point-in-time attribution covers every event exactly once") {
    val out = EventAnalytics.pitAttribution(spark, sfDir)
    val total = out.agg(sum("n_events")).head().getLong(0)
    // the half-open containment means each event matches ONE interval —
    // double-counting or dropped events both break this equality
    assert(total == graft.Tables.load(spark, sfDir, "events").count())
    // the event that OPENS an interval lands in it: the diagonal
    // (state == event_type) is populated for every observed event type
    val diag = out.filter(col("state") === col("event_type")).count()
    assert(diag == out.select("event_type").distinct().count())
  }
}
