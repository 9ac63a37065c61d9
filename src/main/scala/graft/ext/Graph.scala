package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedCacheOps
import graft.Tables.load

/** Graph centrality over the relational catalog: fixed-point PageRank
  * (Page et al. 1999) on the symmetrized customer–supplier
  * co-transaction graph — the iterative whole-graph computation rung
  * beyond connected components (x43/x96/x126 label propagation finds
  * WHICH component; PageRank weighs HOW CENTRAL each node is inside
  * it — the importance signal a curation pipeline uses to weight
  * sources or seed crawls).
  *
  * Scale shape (100 TB): the edge build (orders ⋈ lineitem keyed on
  * orderkey, then DISTINCT pairs) is the corpus-sized work; the edge
  * list itself is bounded by distinct (customer, supplier) pairs and
  * every iteration is one keyed join (edges ⋈ ranks on src) plus one
  * groupBy(dst) — partial aggregation does the map-side combine, no
  * window, no driver loop, no collect. Rank/degree tables are
  * node-bounded. Iterations are UNROLLED in-plan (fixed
  * [[Graph.Iterations]] — the x28 Lloyd / x142 MMR precedent).
  *
  * Engine portability: pure fixed-point integer arithmetic. Ranks are
  * ppm of 1.0 (start 10⁶ per node); a node's per-edge contribution is
  * `r div deg` (exact integer division), received mass is an integer
  * SUM (order-free), and the damped update is
  * `150000 + (mass · 85) div 100` — the textbook
  * (1−d) + d·Σ r(u)/deg(u) with d = 0.85 as the exact rational
  * 85/100. No floating point anywhere, so every engine replays every
  * iteration cell-for-cell. Symmetrized edges mean no dangling nodes
  * (every node with an out-edge has in-edges), so mass is conserved up
  * to the documented truncation loss of the integer divisions.
  */
object Graph {

  /** Damped-update constants: d = 0.85 exactly, as integers. */
  private val DampNum = 85L
  private val DampDen = 100L
  /** (1 − d) · 10⁶ — the uniform teleport mass per node, ppm. */
  private val TeleportPpm = 150000L
  private val UnitPpm = 1000000L
  private val Iterations = 3
  private val TopK = 20

  /** Fixed-point PageRank core: `iterations` damped sweeps over a
    * symmetric `(src, dst)` long edge list (no dangling nodes —
    * callers symmetrize). Returns `(node_id, rank_ppm)` for every node
    * with at least one edge. Exposed for spec-ability on hand graphs. */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    val ed = edges.join(deg, Seq("src")).scopedCache()
    var r = deg.select(col("src").as("node_id"), lit(UnitPpm).as("r"))
    for (_ <- 1 to iterations) {
      r = ed.join(r, ed("src") === r("node_id"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").cast("long").as("mass"))
        .select(col("dst").as("node_id"),
          (lit(TeleportPpm) +
            expr(s"(mass * $DampNum) div $DampDen")).as("r"))
        .scopedCache()
    }
    r.select(col("node_id"), col("r").as("rank_ppm"))
  }

  /** x143: supply-chain centrality — PageRank over the symmetrized
    * bipartite graph linking each customer to every supplier that
    * filled one of its orders (customer c ↔ node 2c, supplier s ↔ node
    * 2s+1 — disjoint id spaces, decoded on output). Reports the
    * `TopK` most central nodes; the global top-k is an
    * orderBy+limit (TakeOrderedAndProject — per-partition heaps, never
    * a global sort) before the trivial 20-row rank window. */
  def supplyRank(s: SparkSession, dir: String): DataFrame = {
    val pairs = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("su")).distinct()
      .scopedCache()
    val edges = pairs
      .select((col("c") * 2).as("src"), (col("su") * 2 + 1).as("dst"))
      .union(pairs
        .select((col("su") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
    val top = pageRank(edges, Iterations)
      .orderBy(col("rank_ppm").desc, col("node_id")).limit(TopK)
    val w = Window.orderBy(col("rank_ppm").desc, col("node_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("node_id"),
        when(pmod(col("node_id"), lit(2)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        expr("node_id div 2").as("entity_id"), col("rank_ppm"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x143_pagerank_supply" -> supplyRank)

  /** Oracle: the iterations unroll into CTE blocks r1..rN; `//` is
    * DuckDB's integer division (≡ Spark's `div` on positive longs),
    * and the damped update CASTs back to BIGINT because DuckDB widens
    * SUM(BIGINT) to HUGEINT. */
  private def pageRankOracle: String = {
    val iters = (1 to Iterations).map { k =>
      s"""
      r$k AS (SELECT ed.dst AS node_id,
                CAST($TeleportPpm +
                  (SUM(r${k - 1}.r // ed.deg) * $DampNum) // $DampDen
                  AS BIGINT) AS r
              FROM ed JOIN r${k - 1} ON r${k - 1}.node_id = ed.src
              GROUP BY 1)"""
    }.mkString(",")
    s"""
      WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS su
                     FROM orders o
                     JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (SELECT c * 2 AS src, su * 2 + 1 AS dst FROM pairs
                UNION ALL
                SELECT su * 2 + 1 AS src, c * 2 AS dst FROM pairs),
      deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
              FROM edges GROUP BY 1),
      ed AS (SELECT e.src, e.dst, d.deg
             FROM edges e JOIN deg d ON d.src = e.src),
      r0 AS (SELECT src AS node_id, CAST($UnitPpm AS BIGINT) AS r
             FROM deg),
      $iters,
      top AS (SELECT node_id, r AS rank_ppm FROM r$Iterations
              ORDER BY r DESC, node_id LIMIT $TopK)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rank_ppm DESC, node_id)
               AS BIGINT) AS rank,
             node_id,
             CASE WHEN node_id % 2 = 0 THEN 'customer'
                  ELSE 'supplier' END AS kind,
             node_id // 2 AS entity_id, rank_ppm
      FROM top ORDER BY rank"""
  }

  val oracles: Map[String, String] = Map(
    "x143_pagerank_supply" -> pageRankOracle)
}
