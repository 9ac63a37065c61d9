package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSpec {

  import spark.implicits._

  // skewed values with heavy ties: ~half the rows share v=7, bucket
  // boundaries land mid-tie, and ids interleave across partitions
  private def skewed = (1 to 5000).map { i =>
    (i.toLong, if (i % 2 == 0) 7.0 else (i % 97) * 1.3)
  }.toDF("id", "v")

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("global_rank",
      row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))

  test("globalRowNumber equals the naive global window (ties + skew)") {
    val got = GlobalOrder.globalRowNumber(skewed,
        lit(1000L) - floor(col("v") * 10).cast("long"),
        Seq(col("v").desc, col("id").asc))
      .orderBy("id").collect()
    val exp = naive(skewed).orderBy("id").collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      assert(g.getLong(2) == e.getLong(2),
        s"id=${g.getLong(0)}: bucketed=${g.getLong(2)} naive=${e.getLong(2)}")
    }
  }

  test("ranks are a permutation of 1..n") {
    val ranks = GlobalOrder.globalRowNumber(skewed,
        lit(1000L) - floor(col("v") * 10).cast("long"),
        Seq(col("v").desc, col("id").asc))
      .select("global_rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 5000L))
  }

  test("empty input yields an empty ranked frame with the rank column") {
    val out = GlobalOrder.globalRowNumber(skewed.limit(0),
      -col("v").cast("long"), Seq(col("v").asc))
    assert(out.columns.contains("global_rank") && out.count() == 0)
  }

  test("the corpus-scale window is partitioned by bucket, not global") {
    val plan = GlobalOrder.globalRowNumber(skewed,
        -floor(col("v")).cast("long"), Seq(col("v").asc, col("id").asc))
      .queryExecution.executedPlan.toString
    // the row_number over the data frame must carry the bucket in its
    // partition spec; only the bucket-count running total (bounded by
    // #buckets rows) may be unpartitioned
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val rowNumberLines = windowLines.filter(_.contains("row_number"))
    assert(rowNumberLines.nonEmpty && rowNumberLines.forall(_.contains("__go_bucket")))
  }

  test("prefixSum equals the naive global windowed cumsum (integer, ties + skew)") {
    val df = skewed.withColumn("weight", (col("id") % 17 + 1).cast("long"))
    val got = GlobalOrder.prefixSum(df,
        lit(1000L) - floor(col("v") * 10).cast("long"),
        Seq(col("v").desc, col("id").asc), col("weight"), "cum")
      .orderBy("id").select("id", "cum").collect()
    val naiveW = Window.orderBy(col("v").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("cum", sum("weight").over(naiveW))
      .orderBy("id").select("id", "cum").collect()
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0) && g.getLong(1) == e.getLong(1),
        s"id=${g.getLong(0)}: bucketed=${g.getLong(1)} naive=${e.getLong(1)}")
    }
  }

  test("driver queries agree with each other: shard totals cover the corpus") {
    val dir = "/root/testdata/sf0.001"
    val shards = GlobalOrder.shardManifest(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(shards.map(_.getLong(1)).sum == docs.count())
    // LPT round-robin bounds shard token spread by one max document
    val totals = shards.map(_.getLong(2))
    val maxDoc = shards.map(_.getLong(4)).max
    assert(totals.max - totals.min <= maxDoc)
  }

  test("curriculum manifest: bijective positions, bands best-first, slots interleave") {
    val dir = "/root/testdata/sf0.001"
    val rows = GlobalOrder.curriculumManifest(spark, dir).orderBy("position").collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(rows.length == docs.count(), "manifest must cover the corpus")
    // positions are exactly 1..N — the bucketed rank produced no gap/dup
    assert(rows.map(_.getAs[Long]("position")).sameElements(1L to rows.length),
      "positions are not a bijection onto 1..N")
    // quality bands emit best-first (non-increasing along the order)
    val bands = rows.map(_.getAs[Long]("band"))
    assert(bands.zip(bands.tail).forall { case (a, b) => a >= b },
      "a lower band precedes a higher one")
    // inside a band, the round-robin emits whole slot-waves in order:
    // each source's docs appear in slot order, and slot never decreases
    // along the band (all rank-1 docs precede all rank-2 docs)
    rows.groupBy(_.getAs[Long]("band")).foreach { case (_, band) =>
      val inOrder = band.sortBy(_.getAs[Long]("position"))
      // reconstruct each doc's slot: running per-source counter
      val seen = scala.collection.mutable.Map[String, Long]()
      val slots = inOrder.map { r =>
        val src = r.getAs[String]("source")
        val s = seen.getOrElse(src, 0L) + 1; seen(src) = s; s
      }
      assert(slots.zip(slots.tail).forall { case (a, b) => a <= b },
        "slot decreased inside a band — sources are not interleaved")
    }
  }
}
