package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate PAIRS into actionable CLUSTERS (keep one
  * representative per component). Pairs alone cannot drive deletion:
  * A~B and B~C must resolve to one {A,B,C} group even when A~C was
  * never emitted. No reference analog; the iteration shape follows the
  * standard large-graph min-label algorithm (converges in graph-diameter
  * rounds; near-dup clusters have tiny diameters).
  *
  * Scale notes: each round is one join (edges ⋈ labels on src) + one
  * min-aggregate, both hash-shuffles on 8-byte ids. Labels persist per
  * round (unpersisted once the next round materializes) and the plan is
  * checkpointed every few rounds — caching alone does NOT truncate
  * lineage, so without the checkpoint a lost partition in round k
  * recomputes through all k rounds. The driver loop is control flow
  * only — per-round work is fully distributed; the `changed` count that
  * gates convergence rides the same aggregate.
  */
object ConnectedComponents {

  /** @param nodes one column `id`
    * @param edges columns `src`, `dst` (undirected; either orientation)
    * @return (id, cluster) where cluster = min id reachable */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      var next = labels.select("id", "label").union(prop)
        .groupBy("id").agg(min("label").as("label"))
      // truncate lineage periodically: cache does not — a lost partition
      // would otherwise recompute through every previous round
      next = if ((iter + 1) % 5 == 0) next.localCheckpoint() else next.persist()
      changed = next.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") < col("prev")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /** Driver query: cluster documents that share any word 8-gram (the
    * same deterministic edge relation DuckDB can rebuild, closed
    * transitively by a recursive CTE on the oracle side). Output: one
    * row per document in a non-trivial cluster, with its cluster id
    * (= min member doc_id) and the cluster size. */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.TextExpressions.wordShingleStrings(col("text"), 8)).as("gram"))
    val a = grams.alias("a")
    val b = grams.alias("b")
    val edges = a.join(b,
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .distinct()
    val nodes = docs.select(col("doc_id").as("id"))
    val cc = labelPropagation(nodes, edges)
    val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster")
      .filter(col("cluster_size") > 1)
      .select(col("id").as("doc_id"), col("cluster"), col("cluster_size"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x43_dup_clusters" -> dupClusters)

  val oracles: Map[String, String] = Map(
    "x43_dup_clusters" -> """
      WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t)-7, 1)+1)) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram FROM idx),
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id <> b.doc_id),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
      cc AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a),
      sizes AS (SELECT cluster, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
      SELECT cc.doc_id, cc.cluster, s.cluster_size
      FROM cc JOIN sizes s USING (cluster)
      WHERE s.cluster_size > 1
      ORDER BY cc.doc_id""")
}
