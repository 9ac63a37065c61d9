package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("labelPropagation resolves transitive chains to one component") {
    // chain 1-2-3-4 plus pair 10-11 plus isolated 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val cc = ConnectedComponents.labelPropagation(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L)
  }

  test("labelPropagation handles a cycle and direction-agnostic edges") {
    val nodes = Seq(5L, 6L, 7L).toDF("id")
    val edges = Seq((7L, 6L), (6L, 5L), (5L, 7L)).toDF("src", "dst")
    val cc = ConnectedComponents.labelPropagation(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(5L))
  }

  test("starEdges are O(m) per gram and a hot gram is dropped at the cap") {
    // gram "g" shared by docs 1,5,9 → star (1,5),(1,9): 2 edges, not 3 pairs
    val grams = Seq((1L, "g"), (5L, "g"), (9L, "g"), (2L, "solo"))
      .toDF("doc_id", "gram")
    val edges = ConnectedComponents.starEdges(grams, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 5L), (1L, 9L)))
    // same components as all-pairs: 1-5-9 connect through root 1
    val cc = ConnectedComponents.labelPropagation(
      Seq(1L, 2L, 5L, 9L).toDF("id"),
      ConnectedComponents.starEdges(grams, cap = 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(5L) == 1L && cc(9L) == 1L && cc(2L) == 2L)

    // a boilerplate gram in > cap documents contributes no edges at all
    val hot = (1L to 70L).map(i => (i, "boiler")).toDF("doc_id", "gram")
    assert(ConnectedComponents.starEdges(hot, cap = 64).count() == 0)
    // ... and below the cap it contributes exactly m-1 star edges
    assert(ConnectedComponents.starEdges(hot, cap = 128).count() == 69)
  }

  test("labelPropagation throws instead of returning split components at maxIter") {
    // path graph 1-2-3-...-8 has diameter 7; maxIter=2 cannot converge
    val nodes = (1L to 8L).toDF("id")
    val edges = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.labelPropagation(nodes, edges, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same graph resolves to one component
    val cc = ConnectedComponents.labelPropagation(nodes, edges, maxIter = 20)
      .collect().map(r => r.getLong(1)).toSet
    assert(cc == Set(1L))
  }

  test("dupClusters: cluster id is the min member; exact dup pairs land together") {
    val out = ConnectedComponents.dupClusters(spark, sfDir).cache()
    // cluster id is a member and is minimal
    assert(out.filter(col("cluster") > col("doc_id")).count() == 0)
    val clusterIds = out.select("cluster").distinct()
    val members = out.select("doc_id")
    assert(clusterIds.join(members, clusterIds("cluster") === members("doc_id"), "left_anti")
      .count() == 0, "every cluster id must itself be a member")
    // exact text duplicates (with >= 8 tokens) must share a cluster
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val dupTexts = docs.groupBy("text").agg(count(lit(1)).as("n"), min("doc_id").as("leader"))
      .filter(col("n") > 1 && size(split(trim(col("text")), "\\s+")) >= 8)
    val pairs = docs.join(dupTexts, "text")
      .filter(col("doc_id") =!= col("leader"))
      .select(col("doc_id"), col("leader"))
    val split2 = pairs
      .join(out.select(col("doc_id"), col("cluster").as("c1")), "doc_id")
      .join(out.select(col("doc_id").as("leader"), col("cluster").as("c2")), "leader")
      .filter(col("c1") =!= col("c2"))
    assert(split2.count() == 0, "exact dups must be in the same cluster")
    out.unpersist()
  }

  test("canonicalDocs keeps exactly one best-quality member per cluster") {
    val kept = ConnectedComponents.canonicalDocs(spark, sfDir).collect()
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    // membership totals cover the corpus; one row per cluster
    assert(kept.map(_.getLong(2)).sum == nDocs)
    assert(kept.map(_.getLong(0)).distinct.length == kept.length)
    // the representative leads its cluster: no member may beat it
    // (cluster ids are min member ids, so kept_doc_id >= cluster)
    kept.foreach(r => assert(r.getLong(1) >= r.getLong(0)))
    assert(kept.exists(_.getLong(2) > 1), "fixture must have non-trivial clusters")
  }

  test("leak-free splits: whole clusters per split, zero cross-split duplication") {
    import org.apache.spark.sql.functions._
    val splits = ConnectedComponents.leakFreeSplits(spark, sfDir).cache()
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(splits.count() == nDocs, "every document gets a split")
    // every cluster lands wholly in ONE split — the defining invariant
    val fractured = splits.groupBy("cluster")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
    assert(fractured.count() == 0, "a cluster straddles splits")
    // zero leakage under the x79 measure: no near-dup EDGE crosses splits
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.TextExpressions.wordShingleStrings(col("text"), 8)).as("gram"))
    val edges = ConnectedComponents.starEdges(grams, ConnectedComponents.GramDfCap)
    val leaks = edges
      .join(splits.select(col("doc_id").as("src"), col("split").as("s1")), "src")
      .join(splits.select(col("doc_id").as("dst"), col("split").as("s2")), "dst")
      .filter(col("s1") =!= col("s2"))
    assert(leaks.count() == 0, "near-dup edge crosses a split boundary")
    // the 90/5/5 hash thresholds hold loosely at cluster granularity
    val frac = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / nDocs).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, s"train fraction off: $frac")
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) > 0.03, s"holdout too small: $frac")
    splits.unpersist()
  }

  test("cluster source matrix: unordered pairs, positive counts, pair bound holds") {
    val rows = ConnectedComponents.clusterSourceMatrix(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be unordered (a < b)")
      assert(r.getLong(2) > 0 && r.getLong(3) >= r.getLong(2),
        "each shared cluster contributes at least one cross-source doc pair")
    }
  }
}
