package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k: k rows per query, ranks 1..k, cos non-increasing") {
    val out = Similarity.topKBruteForce(spark, sfDir).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 5L))
      val cs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("no self-matches in top-k") {
    val out = Similarity.topKBruteForce(spark, sfDir)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("LSH top-k recall vs brute force is high") {
    val exact = Similarity.topKBruteForce(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.topKLsh(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall below 0.6")
  }

  test("IVF top-k recall >= 0.8 at both spec scale factors; output is deterministic") {
    // floor rationale: recall is deterministic (seeded init, total-order
    // tie-breaks), measured 0.90 / 0.84 at the two SFs with the default
    // 8/16 probes — see the sweep notes on Similarity.IvfProbes
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val exact = Similarity.topKBruteForce(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf1 = Similarity.topKIvf(spark, dir).collect()
      val ivf2 = Similarity.topKIvf(spark, dir).collect()
      assert(ivf1.sameElements(ivf2), s"IVF result not deterministic at $dir")
      val approx = ivf1.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.8, s"IVF recall $recall below 0.8 at $dir")
    }
  }

  test("label centroid sims: 45 unordered label pairs, cos in [-1, 1]") {
    val rows = Similarity.labelCentroidSims(spark, sfDir).collect()
    assert(rows.length == 45) // C(10, 2)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Int]("label1") < r.getAs[Int]("label2"))
    }
  }
}
