package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq( // (sym, qts, px)
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 102.0),
    ("B", ts("2024-01-01 10:02:00"), 50.0))
    .toDF("sym", "qts", "px")

  private val trades = Seq( // (sym, tts, qty)
    ("A", ts("2024-01-01 10:03:00"), 5L),   // → 10:00 quote
    ("A", ts("2024-01-01 10:05:00"), 6L),   // equal ts → 10:05 (<= semantics)
    ("A", ts("2024-01-01 11:00:00"), 7L),   // → latest (10:10)
    ("B", ts("2024-01-01 10:00:00"), 8L),   // before any quote → null
    ("C", ts("2024-01-01 10:00:00"), 9L))   // no quotes at all → null
    .toDF("sym", "tts", "qty")

  test("asofBackward picks latest quote at-or-before each trade") {
    val out = AsOfJoin.asofBackward(trades, quotes, "sym", "tts", "qts")
      .orderBy("qty").collect()
    val px = out.map(r => Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))
    assert(px.toSeq == Seq(Some(100.0), Some(101.0), Some(102.0), None, None))
    // every left row survives exactly once (left-join semantics)
    assert(out.length == 5)
  }

  test("asofForward picks earliest quote at-or-after each trade") {
    val out = AsOfJoin.asofForward(trades, quotes, "sym", "tts", "qts")
      .orderBy("qty").collect()
    val px = out.map(r => Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))
    // 10:03→10:05; 10:05→10:05; 11:00→none; B 10:00→10:02; C→none
    assert(px.toSeq == Seq(Some(101.0), Some(101.0), None, Some(50.0), None))
    // forward flips time twice — timestamps must round-trip intact
    val t = out.map(_.getAs[java.sql.Timestamp]("tts"))
    assert(t(0) == ts("2024-01-01 10:03:00"))
  }

  test("AsOfJoinPlan rejects non-Long key/time columns at construction") {
    // the merge scan reads getLong — timestamp/double columns must be
    // rejected before they can be read as garbage
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofNative(trades, quotes, "sym", "tts", "qts")
    }
    assert(e.getMessage.contains("must be LongType"), e.getMessage)
  }

  test("native AsOfJoinExec agrees with the union+window composition") {
    // long-typed key/time fixtures for the native operator
    val q = quotes.withColumn("qts_us", unix_micros(col("qts"))).drop("qts")
    val t = trades.withColumn("tts_us", unix_micros(col("tts"))).drop("tts")
      .withColumn("symk", xxhash64(col("sym"))).drop("sym")
    val qk = q.withColumn("symk", xxhash64(col("sym"))).drop("sym")

    val composed = AsOfJoin.asofBackward(t, qk, "symk", "tts_us", "qts_us")
      .select(col("qty"), col("asof_px")).orderBy("qty").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("asof_px"))))

    val native = AsOfJoin.asofNative(t, qk, "symk", "tts_us", "qts_us")
      .select(col("qty"), col("asof_px")).orderBy("qty").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("asof_px"))))

    assert(native.sameElements(composed),
      s"\nnative  =${native.mkString(", ")}\ncomposed=${composed.mkString(", ")}")

    // and the physical plan really is the custom operator
    val plan = AsOfJoin.asofNative(t, qk, "symk", "tts_us", "qts_us")
      .queryExecution.executedPlan.toString
    // the exec node prints its nodeName ("AsOfJoin"), not the class name
    assert(plan.contains("AsOfJoin "), s"custom strategy not used:\n$plan")
  }

  test("native as-of matches composition on the full events attribution (sf0.001)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")).agg(min("event_id").as("view_event_id"))
      .select(col("user_id"), unix_micros(col("ts")).as("vts"), col("view_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pts"))
    val a = AsOfJoin.asofBackward(purchases, views, "user_id", "pts", "vts")
      .select("event_id", "asof_view_event_id").orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("asof_view_event_id"))))
    val b = AsOfJoin.asofNative(purchases, views, "user_id", "pts", "vts")
      .select("event_id", "asof_view_event_id").orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("asof_view_event_id"))))
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("tolerance nulls out stale matches in both composition and native paths") {
    // timestamps cast to long = epoch seconds in the composition path
    val composed = AsOfJoin.asofBackward(trades, quotes, "sym", "tts", "qts",
        tolerance = Some(600L)) // 10 minutes
      .orderBy("qty").collect()
      .map(r => Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))
    // trade 11:00 is 50 min after the 10:10 quote → now unmatched
    assert(composed.toSeq == Seq(Some(100.0), Some(101.0), None, None, None))

    val q = quotes.withColumn("qts_us", unix_micros(col("qts"))).drop("qts")
      .withColumn("symk", xxhash64(col("sym"))).drop("sym")
    val t = trades.withColumn("tts_us", unix_micros(col("tts"))).drop("tts")
      .withColumn("symk", xxhash64(col("sym"))).drop("sym")
    val native = AsOfJoin.asofNative(t, q, "symk", "tts_us", "qts_us",
        tolerance = Some(600L * 1000000)) // native times are micros
      .orderBy("qty").collect()
      .map(r => Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))
    assert(native.toSeq == composed.toSeq)
  }

  test("asofBackward plan shuffles once on the key (no cross join)") {
    val plan = AsOfJoin.asofBackward(trades, quotes, "sym", "tts", "qts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of degenerated to a product join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"more shuffles than the union+window plan needs:\n$plan")
  }
}
