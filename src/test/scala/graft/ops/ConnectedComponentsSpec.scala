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
}
