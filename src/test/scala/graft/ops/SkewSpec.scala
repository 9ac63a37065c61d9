package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that stalls a reducer
  private def skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  private def dim = (0L to 99L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "id", "v", "name").orderBy("id").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8)
      .select("k", "id", "v", "name").orderBy("id").collect()
    assert(salted.sameElements(plain))
  }

  test("twoPhaseAgg equals the direct groupBy for algebraic aggregates") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.twoPhaseAgg(skewed, "k", salt = 8)(
        Seq(count(lit(1)).as("n"), sum("v").as("s")),
        Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getLong(0) == s.getLong(0))
      assert(d.getLong(1) == s.getLong(1))
      assert(math.abs(d.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("salting actually spreads the hot key across partitions") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(8)))
    val spread = salted.filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 salt buckets")
  }

  // AQE's OptimizeSkewedJoin splits oversized shuffle partitions of a
  // sort-merge/shuffled-hash JOIN at runtime — so manual salting is NOT
  // needed for plain shuffle joins; Skew.saltedJoin exists for the shapes
  // AQE can't touch (aggregations, and joins whose partitioning is
  // pre-committed, e.g. feeding a bucketed write). This test pins that
  // boundary by showing the runtime split actually firing.
  test("AQE OptimizeSkewedJoin splits the hot join partition at runtime") {
    // ~24k rows with an 80-char payload on one key → the hot shuffle
    // partition carries ~2 MB while the median partition is near-empty,
    // far past factor×median AND the lowered byte threshold below.
    val pad = "x" * 80
    val hot = (1 to 25000).map { i =>
      (if (i % 25 == 0) i.toLong % 100 else 7L, i.toLong, pad)
    }.toDF("k", "id", "payload")
    val right = (0L to 99L).flatMap(k => (1 to 5).map(r => (k, r.toLong)))
      .toDF("k", "r")

    val overrides = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // no broadcast: force both sides through the shuffle so the
      // skew detector has partitions to inspect
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (key, _) => key -> spark.conf.getOption(key) }
    overrides.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val joined = hot.join(right, Seq("k"))
      // execute THIS dataset (an aggregating action would plan its own
      // query and leave joined's adaptive plan unfinalized); the skew
      // split is a runtime re-plan, so it only shows after execution
      assert(joined.collect().length == 25000 * 5)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to fire (skew=true in plan):\n$plan")
    } finally saved.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None)    => spark.conf.unset(key)
    }
  }

  test("skewReport: shares and load factors are internally consistent") {
    val rows = Skew.skewReport(spark, sfDir).collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse), "must be heaviest-first")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 100.0)
      assert(r.getDouble(3) > 0)
    }
    // the maximum is always >= the mean, so the heaviest key's load
    // factor must be >= 1 (lighter top-10 keys may legitimately sit
    // below it when the distribution has few heavy keys)
    assert(rows.head.getDouble(3) >= 1.0,
      s"heaviest key below uniform load: ${rows.head.getDouble(3)}")
  }
}
