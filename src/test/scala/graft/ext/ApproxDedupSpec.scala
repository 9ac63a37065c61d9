package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDedupSpec extends SparkSpec {

  test("HLL++ distinct counts stay within 5% of exact per source") {
    val approx = Dedup.approxDistinctEstimates(spark, sfDir)
    val exact = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count_distinct(col("text")).as("exact_distinct"))
    val joined = approx.join(exact, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_distinct_texts").toDouble
      val e = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"source ${r.getAs[String]("source")}: approx $a vs exact $e")
    }
  }

  test("x26 audit query reports every source within the HLL 5% bound") {
    val out = Dedup.approxDedupStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"source ${r.getAs[String]("source")}: HLL estimate outside 5% of " +
          s"exact ${r.getAs[Long]("exact_distinct")}")
    }
  }

  test("KMV distinct estimates land within the sketch's statistical error") {
    val est = Dedup.kmvDistinct(spark, sfDir)
    val exact = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count_distinct(col("text")).as("exact_distinct"))
    val joined = est.join(exact, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Double]("est_distinct")
      val e = r.getAs[Long]("exact_distinct").toDouble
      // k=16 → relative stderr ≈ 1/sqrt(k-2) ≈ 27%; 3σ bound with slack
      assert(math.abs(a - e) / e <= 1.0,
        s"source ${r.getAs[String]("source")}: KMV $a vs exact $e")
    }
    // and the estimator is unbiased-ish in aggregate: the MEAN estimate
    // across 20 independent sources must sit much closer than any
    // single sketch is required to
    val (sa, se) = joined.foldLeft((0.0, 0.0)) { case ((x, y), r) =>
      (x + r.getAs[Double]("est_distinct"),
       y + r.getAs[Long]("exact_distinct").toDouble) }
    assert(math.abs(sa - se) / se <= 0.25,
      s"aggregate KMV bias too large: $sa vs $se")
  }

  test("count-min estimates never underestimate and stay near exact for heavy hitters") {
    val out = Dedup.cmsHeavyHitters(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= exact,
        s"CMS underestimated '${r.getAs[String]("token")}': $est < $exact")
      // w=1024 cells over a small vocab: collision mass is a tiny
      // fraction of a heavy hitter's own count
      assert(est <= exact * 2,
        s"CMS estimate for a heavy hitter too loose: $est vs $exact")
    }
  }
}
