package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the shapes AQE's runtime skew-join
  * split does NOT cover (aggregations, and joins that must pre-commit a
  * partitioning). Both are pure plan rewrites — semantics identical to
  * the unsalted form, verified by SkewSpec.
  *
  * At 100 TB a handful of hot keys (the empty document, a default
  * user_id, a null-ish country) can put one shuffle partition hours
  * behind the rest; salting spreads each hot key over `salt` partitions
  * for the expensive stage and folds the partials afterwards.
  */
object Skew {

  /** Inner equi-join of a skewed `large` side against a `small` side:
    * each large row gets a deterministic salt in [0, salt); the small
    * side is replicated `salt` ways; the join key becomes (key, salt),
    * so one hot key spreads over `salt` shuffle partitions.
    *
    * Salt is derived by hashing ALL large-side columns (deterministic
    * under retries, unlike rand(); uniform even when the key itself is
    * constant). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    val saltCol = pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salt))
    val l = large.withColumn("__salt", saltCol)
    val s = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: phase 1 aggregates on
    * (key, salt) — hot keys split across partitions — phase 2 folds the
    * per-salt partials. Caller supplies both phases; for algebraic
    * aggregates they're the same function (sum/sum, count/sum, ...).
    *
    * Spark's map-side partial aggregation already does this per input
    * partition; explicit salting matters when the partial-agg reduction
    * ratio is poor (high-cardinality secondary grouping, collect-style
    * aggregates) and one reducer would still own the whole hot key. */
  def twoPhaseAgg(df: DataFrame, key: String, salt: Int)(
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    require(salt > 0)
    val saltCol = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt))
    df.withColumn("__salt", saltCol)
      .groupBy(col(key), col("__salt"))
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(col(key))
      .agg(phase2.head, phase2.tail: _*)
  }

  /** Driver-checked query: a weighted per-event-type rollup computed
    * through BOTH skew tools — salted join of the events fact (5
    * distinct keys over 10k+ rows: maximal key skew, the shape where
    * one reducer would own a fifth of the table) against a small
    * weight dim, then the two-phase salted aggregation. The salt is an
    * internal plan detail; the result is identical to the plain
    * join+group — which is exactly what the DuckDB oracle runs, making
    * the equivalence a hash-checked gate, not just a spec. Weighted
    * values go through integer cents per row so partial-sum order
    * can't perturb the result. */
  def skewRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.load(s, dir, "events")
      .select(col("event_type"),
        (round(col("value") * 100, 0).cast("long")).as("cents"))
    val dim = s.createDataFrame(Seq(
      ("click", 1L), ("view", 2L), ("purchase", 10L), ("signup", 5L), ("error", 0L)))
      .toDF("event_type", "weight")
    val joined = saltedJoin(ev, dim, "event_type", salt = 8)
      .withColumn("wcents", col("cents") * col("weight"))
    twoPhaseAgg(joined, "event_type", salt = 8)(
      Seq(count(lit(1)).as("n1"), sum("wcents").as("c1")),
      Seq(sum("n1").as("n_events"), sum("c1").as("weighted_cents")))
      .orderBy("event_type")
  }

  /** x94: join-key skew diagnostic — the measurement that decides
    * whether a key needs salting BEFORE the job stalls on one reducer.
    * Reports the top-10 heaviest user_id keys with their row share and
    * the key's load factor vs a perfectly uniform spread (count ×
    * n_distinct_keys / n_rows — >> 1 means that key alone can stall a
    * partition). One count aggregate + a broadcast 1-row totals frame;
    * the top-10 is a TakeOrdered, never a full sort. */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.load(s, dir, "events")
    val perKey = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val totals = perKey.agg(
      sum("n").as("total_rows"), count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(totals))
      .withColumn("share_pct",
        round(col("n") * lit(100.0) / col("total_rows"), 4))
      .withColumn("load_factor",
        // cast BEFORE multiplying: at billion-row × billion-key scale
        // the long×long product overflows int64 and non-ANSI Spark
        // wraps silently — the exact hazard this diagnostic hunts
        round(col("n").cast("double") * col("n_keys") / col("total_rows"), 4))
      .orderBy(desc("n"), col("user_id"))
      .select(col("user_id"), col("n"), col("share_pct"), col("load_factor"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x94_key_skew_report" -> skewReport,
    "x75_skew_rollup" -> skewRollup)

  val oracles: Map[String, String] = Map(
    "x94_key_skew_report" -> """
      WITH k AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
                   COUNT(*) AS n_keys FROM k)
      SELECT user_id, n,
        ROUND(n * 100.0 / total_rows, 4) AS share_pct,
        ROUND(CAST(n AS DOUBLE) * n_keys / total_rows, 4) AS load_factor
      FROM k CROSS JOIN t
      ORDER BY n DESC, user_id LIMIT 10""",
    "x75_skew_rollup" -> """
      WITH dim(event_type, weight) AS (VALUES
        ('click', 1), ('view', 2), ('purchase', 10), ('signup', 5), ('error', 0))
      SELECT e.event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(round(e.value * 100, 0) AS BIGINT) * d.weight) AS BIGINT)
          AS weighted_cents
      FROM events e JOIN dim d USING (event_type)
      GROUP BY 1 ORDER BY 1""")
}
