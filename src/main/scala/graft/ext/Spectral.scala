package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedCacheOps
import graft.Tables.load

/** Spectral audit of the embedding table: dominant principal component
  * via distributed power iteration (x144) — the anisotropy check an
  * embedding pipeline gates on (Mu & Viswanath 2018, "All-but-the-Top":
  * strong mean/dominant-direction components are a known defect of
  * encoder outputs and hurt cosine retrieval; the fix starts with
  * MEASURING them). Complements x100 (norm sanity) and x110
  * (quantization): x100 says vectors are well-formed, x144 says where
  * their variance lives.
  *
  * Scale shape (100 TB): the covariance matrix is never materialized —
  * each power step computes C·v as two corpus passes over the exploded
  * centered table ce(vec_id, i, ci): s_n = ⟨c_n, v⟩ (groupBy vec_id —
  * the 64 per-vector rows combine map-side, the exchange carries N
  * rows) then w_i = Σ_n c_{n,i}·s_n (groupBy dim — the exchange
  * carries 64 rows per partition). `ce` is built once and reused by
  * every step; the direction vector is a 64-row broadcast. No window,
  * no collect, iterations unrolled in-plan (x28/x143 precedent).
  *
  * Engine portability: pure integer arithmetic end-to-end. Embeddings
  * quantize to thousandths (the x28 recipe), means use truncating
  * integer division (BOTH engines truncate toward zero — verified for
  * Spark `div` and DuckDB `//`, including negatives), every sum is an
  * order-free integer SUM, and the per-step renormalization divides by
  * `max(|w|) div 1000` (greatest-guarded) instead of multiplying w by
  * 1000 — same result scale, no overflow. Exactness bound: |w_i| ≤
  * N·2000·|s| ≈ N·2.6·10¹¹ must fit a long → exact to N ≈ 3·10⁷
  * vectors. A 100-TB corpus audits a bounded PPS sample (x93 — the
  * x112/x129 bounded-ground-truth pattern); the direction estimate is
  * statistical, not per-row, so a sample is the production path
  * anyway.
  */
object Spectral {

  /** Embedding quantization: thousandths, floor (the x28 recipe). */
  private val QScale = 1000.0
  /** Direction renormalization target: max|v| ≈ 1000 after each step. */
  private val VScale = 1000L
  private val Iterations = 3

  /** Exploded, quantized, centered embedding table `(vec_id, i, ci)`
    * plus the per-dim integer means — shared by every power step. */
  private def centered(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ex = load(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        graft.functions.VectorExpressions.quantizeLong(col("embedding"), QScale)))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "qi")
    val mu = ex.groupBy("i")
      .agg(expr("sum(qi) div count(1)").as("mu"))
    val ce = ex.join(broadcast(mu), Seq("i"))
      .select(col("vec_id"), col("i"), (col("qi") - col("mu")).as("ci"))
    (ce, mu)
  }

  /** One power step: v ← normalize(C·v), all integer. */
  private def step(ce: DataFrame, v: DataFrame): DataFrame = {
    val sd = ce.join(broadcast(v), Seq("i"))
      .groupBy("vec_id").agg(sum(expr("ci * v")).cast("long").as("sd"))
    val w = ce.join(sd, Seq("vec_id"))
      .groupBy("i").agg(sum(expr("ci * sd")).cast("long").as("w"))
    val mx = w.agg(max(abs(col("w"))).cast("long").as("mx"))
    w.crossJoin(broadcast(mx))
      .select(col("i"),
        expr(s"w div greatest(mx div $VScale, 1)").as("v"))
  }

  /** x144: dominant-PC power iteration — per dim the integer mean and
    * the converged direction component (scale ±~1000), plus two
    * constant energy scalars: `lambda_q` = mean squared projection
    * onto the direction (in (q·v/1000)² units) and `trace_q` = mean
    * squared centered norm. Their ratio → 1 exactly when all variance
    * lives on the direction (spec-asserted on an axis-aligned
    * fixture); ≪ 1 means isotropy. */
  def powerIteration(s: SparkSession, dir: String): DataFrame = {
    val (ce0, mu) = centered(s, dir)
    val ce = ce0.scopedCache()
    var v = mu.select(col("i"), lit(VScale).as("v"))
    // r19-opt: each step's 64-row direction vector gets its OWN cache
    // boundary. Without it v_{k+1}'s lineage embeds v_k TWICE (sd and
    // w both reference v), so the logical plan grew 2^k copies of the
    // centered-corpus subtree — a 14k-line physical plan whose Catalyst
    // planning/codegen time rivaled its execution (guide §3.3 "very
    // large plans: planning time itself becomes the bottleneck"). A
    // 64-row cache per step bounds the tree linearly; measured ~0.8 s
    // off the isolated bench read.
    for (_ <- 1 to Iterations) v = step(ce, v).scopedCache()
    val vb = broadcast(v.withColumnRenamed("v", "vf")).scopedCache()
    val sd = ce.join(vb, Seq("i"))
      .groupBy("vec_id").agg(sum(expr("ci * vf")).cast("long").as("sd"))
    val n = load(s, dir, "embeddings")
      .agg(count(lit(1)).cast("long").as("n"))
    val lam = sd
      .select(expr(s"(sd div $VScale) * (sd div $VScale)").as("k2"))
      .agg(sum("k2").cast("long").as("sk2"))
      .crossJoin(broadcast(n))
      .select(expr("sk2 div n").as("lambda_q"))
    val tr = ce.select(expr("ci * ci").as("c2"))
      .agg(sum("c2").cast("long").as("sc2"))
      .crossJoin(broadcast(n))
      .select(expr("sc2 div n").as("trace_q"))
    vb.join(broadcast(mu), Seq("i"))
      .crossJoin(broadcast(lam)).crossJoin(broadcast(tr))
      .select(col("i").cast("long").as("dim_idx"), col("mu"),
        col("vf").as("v_dir"), col("lambda_q"), col("trace_q"))
      .orderBy("dim_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x144_spectral_audit" -> powerIteration)

  /** Oracle: the same integer pipeline, iterations unrolled into v1..vN
    * CTE blocks; `generate_subscripts` is 1-based so dims shift by one,
    * and every HUGEINT-widened SUM casts back to BIGINT before the
    * truncating `//`. */
  private def spectralOracle: String = {
    val steps = (1 to Iterations).map { k =>
      s"""
      s$k AS (SELECT ce.vec_id,
                CAST(SUM(ce.ci * v.v) AS BIGINT) AS sd
              FROM ce JOIN v${k - 1} v ON v.i = ce.i GROUP BY 1),
      w$k AS (SELECT ce.i, CAST(SUM(ce.ci * s.sd) AS BIGINT) AS w
              FROM ce JOIN s$k s ON s.vec_id = ce.vec_id GROUP BY 1),
      mx$k AS (SELECT MAX(ABS(w)) AS mx FROM w$k),
      v$k AS (SELECT i, w // GREATEST(mx // $VScale, 1) AS v
              FROM w$k, mx$k)"""
    }.mkString(",")
    s"""
      WITH q AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qv
             FROM embeddings),
      ex AS (SELECT vec_id, generate_subscripts(qv, 1) - 1 AS i,
               unnest(qv) AS qi FROM q),
      mu AS (SELECT i, CAST(SUM(qi) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS mu FROM ex GROUP BY 1),
      ce AS (SELECT ex.vec_id, ex.i, ex.qi - mu.mu AS ci
             FROM ex JOIN mu ON mu.i = ex.i),
      v0 AS (SELECT i, CAST($VScale AS BIGINT) AS v FROM mu),
      $steps,
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
      sf AS (SELECT ce.vec_id, CAST(SUM(ce.ci * v.v) AS BIGINT) AS sd
             FROM ce JOIN v$Iterations v ON v.i = ce.i GROUP BY 1),
      lam AS (SELECT CAST(SUM((sd // $VScale) * (sd // $VScale)) AS BIGINT)
                // (SELECT n FROM nn) AS lambda_q FROM sf),
      tr AS (SELECT CAST(SUM(ci * ci) AS BIGINT)
               // (SELECT n FROM nn) AS trace_q FROM ce)
      SELECT CAST(v.i AS BIGINT) AS dim_idx, mu.mu, v.v AS v_dir,
             lam.lambda_q, tr.trace_q
      FROM v$Iterations v JOIN mu ON mu.i = v.i
      CROSS JOIN lam CROSS JOIN tr
      ORDER BY dim_idx"""
  }

  val oracles: Map[String, String] = Map(
    "x144_spectral_audit" -> spectralOracle)
}
