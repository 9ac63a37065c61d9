package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedCacheOps
import graft.Tables.load
import graft.functions.TextFunctions._

/** Exact global ordering without a global sort — the scale-safe form of
  * `row_number() OVER (ORDER BY …)`.
  *
  * A naive global window funnels the whole table through ONE partition —
  * the canonical 100 TB scale-killer (a single task sorts the corpus).
  * This operator computes the identical number in three bounded steps,
  * generalizing the threshold-refinement trick TextAnalysis.budgetFill
  * uses for its budget boundary:
  *
  *   1. histogram: count rows per coarse integer bucket of the sort key
  *      (one map-side-combined aggregate; #buckets ≈ thousands);
  *   2. offsets: running-total the TINY bucket-count frame (the only
  *      unpartitioned window in the plan runs over #buckets rows, not
  *      the corpus) and broadcast-join each row its bucket's offset;
  *   3. rank within bucket: `row_number()` partitioned BY BUCKET — every
  *      partition is bounded by its bucket's row count, all buckets sort
  *      in parallel — then add the broadcast offset.
  *
  * Contract: `bucket` must be monotone non-decreasing along the intended
  * sort order (rows earlier in `order` land in ≤ buckets) — floor-style
  * coarsenings of the leading sort key satisfy this by construction.
  * Ties across rows in the same bucket resolve by `order`, exactly as
  * the naive window would; GlobalOrderSpec asserts plan ≡ naive on
  * skewed, tied, and empty inputs (no reference counterpart: the
  * reference's pandas sorts are single-process by definition,
  * main.py:648-676 ORDER BY paths).
  */
object GlobalOrder {

  /** Exact `row_number() OVER (ORDER BY order…)` as a long column named
    * `out`, computed via the bucketed path above.
    *
    * Contract (both primitives): `bucket` must be NON-NULL for every row
    * — a null bucket key would drop the row at the offsets equi-join.
    * Floor/div coarsenings of a non-null sort key satisfy this. */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
                      out: String = "global_rank"): DataFrame = {
    val withB = df.withColumn("__go_bucket", bucket.cast("long"))
    val counts = withB.groupBy("__go_bucket").agg(count(lit(1)).as("__go_n"))
    // running total over the bucket-count frame: #buckets rows, so the
    // unpartitioned window here is deliberate and bounded
    val offW = Window.orderBy(col("__go_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("__go_off", sum(col("__go_n")).over(offW) - col("__go_n"))
      .select("__go_bucket", "__go_off")
    val inBucket = Window.partitionBy(col("__go_bucket")).orderBy(order: _*)
    withB
      .join(broadcast(offsets), "__go_bucket")
      .withColumn(out,
        row_number().over(inBucket).cast("long") + col("__go_off"))
      .drop("__go_bucket", "__go_off")
  }

  /** Exact INCLUSIVE global prefix sum of an integer column along
    * (bucket, order…) — `sum(v) OVER (ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` without the single-partition window, by the same
    * bucket/offset/within-bucket decomposition as [[globalRowNumber]].
    * Integer-only by contract: per-bucket partials re-associate the
    * additions, which is exact for longs and would drift for doubles. */
  def prefixSum(df: DataFrame, bucket: Column, order: Seq[Column],
                value: Column, out: String = "prefix_sum"): DataFrame = {
    val withB = df.withColumn("__go_bucket", bucket.cast("long"))
      .withColumn("__go_v", value.cast("long"))
    val totals = withB.groupBy("__go_bucket").agg(sum("__go_v").as("__go_n"))
    val offW = Window.orderBy(col("__go_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = totals
      .withColumn("__go_off", sum(col("__go_n")).over(offW) - col("__go_n"))
      .select("__go_bucket", "__go_off")
    val inBucket = Window.partitionBy(col("__go_bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsets), "__go_bucket")
      .withColumn(out, sum(col("__go_v")).over(inBucket) + col("__go_off"))
      .drop("__go_bucket", "__go_off", "__go_v")
  }

  /** x88: exact global quality ranking of the document corpus — the
    * curriculum-ordering primitive (highest-quality docs first). The
    * bucket is the budgetFill histogram key reversed to align ascending
    * with quality-descending order. */
  def qualityRank(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    // r20 (guide §5): globalRowNumber evaluates its input twice (bucket
    // histogram + rank join); caching the two-column per-doc frame runs
    // the qualitySignals text kernel once instead of twice.
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), qs.getField("quality").as("quality"))
      .scopedCache()
    globalRowNumber(docs,
        lit(1000L) - floor(col("quality") * 10).cast("long"),
        Seq(col("quality").desc, col("doc_id").asc))
      .select(col("doc_id"), col("quality"), col("global_rank"))
  }

  /** x89: balanced training-shard manifest — rank docs by token count
    * (descending, doc_id ties) and deal them round-robin into 16 shards,
    * the classic longest-processing-time-first balancing that bounds
    * shard spread by one document. Reports per-shard doc/token totals. */
  def shardManifest(s: SparkSession, dir: String): DataFrame = {
    // r20: same double-evaluation as qualityRank — cache the narrow
    // frame so the tokenCount kernel scans the text once.
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .scopedCache()
    globalRowNumber(docs,
        -col("n_tokens"),
        Seq(col("n_tokens").desc, col("doc_id").asc))
      .withColumn("shard", (col("global_rank") - 1) % 16)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("total_tokens"),
           min("n_tokens").as("min_tokens"),
           max("n_tokens").as("max_tokens"))
      .orderBy("shard")
  }

  /** x111: interleaved curriculum manifest — the exact global training
    * order for quality-descending curriculum WITH source diversity.
    * Naive quality ordering (x88) emits long same-source runs (one
    * crawl's docs cluster at similar quality), and a training window
    * that sees one source for millions of steps is a distribution
    * shift, not a curriculum. The fix is the standard interleave: band
    * quality into deciles, rank docs WITHIN (band, source) by quality,
    * then emit bands best-first, round-robin across sources inside each
    * band (all sources' rank-1 docs, then all rank-2, …).
    *
    * Total order: (band desc, slot, source) — unique because slot is a
    * per-(band, source) row_number. The global position comes from
    * [[globalRowNumber]], never a global sort: the bucket refines
    * (band, slot) so per-bucket partitions hold ~64 slots of one band
    * across all sources (the cap keeps the bucket space ≤ 2^20 per
    * band; a corpus overflowing it — 67M docs per band-source — just
    * coarsens the tail buckets, it never loses exactness). The slot
    * window itself partitions by (band, source) — strata, not the
    * corpus. */
  def curriculumManifest(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"), qs.getField("quality").as("q"))
      .withColumn("band", floor(col("q") / 10).cast("long"))
    val slotW = Window.partitionBy(col("band"), col("source"))
      .orderBy(desc("q"), col("doc_id"))
    // r20: globalRowNumber reads `ranked` twice — without the cache both
    // the quality kernel AND the slot window re-ran per evaluation.
    val ranked = docs.withColumn("slot", row_number().over(slotW).cast("long"))
      .scopedCache()
    globalRowNumber(ranked,
        (lit(10L) - col("band")) * lit(1L << 20)
          + least(shiftright(col("slot"), 6), lit((1L << 20) - 1)),
        Seq(col("band").desc, col("slot").asc, col("source").asc),
        "position")
      .select(col("position"), col("doc_id"), col("band"), col("source"))
      .orderBy("position")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x111_curriculum" -> curriculumManifest,
    "x88_global_rank" -> qualityRank,
    "x89_shard_manifest" -> shardManifest)

  // Shared quality CTE: identical to the x12 oracle (TextAnalysis.oracles)
  private val qualityCte = """
      base AS (
        SELECT doc_id, source, n_chars,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> list_contains(['the','a','and','of','to','in','is','that','it','for','on','with'], x))) AS DOUBLE)
            / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS stopword_ratio,
          CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE)
            / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS avg_token_len,
          least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS length_score
        FROM documents),
      scored AS (
        SELECT base.*,
          length_score * 25.0 +
          (1.0 - least(punct_ratio * 5.0, 1.0)) * 25.0 +
          least(stopword_ratio * 4.0, 1.0) * 25.0 +
          (CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 25.0 AS q
        FROM base)"""

  val oracles: Map[String, String] = Map(
    "x111_curriculum" -> s"""
      WITH $qualityCte,
      banded AS (
        SELECT doc_id, source, q, CAST(floor(q / 10) AS BIGINT) AS band
        FROM scored),
      slotted AS (
        SELECT doc_id, source, band,
          CAST(row_number() OVER (PARTITION BY band, source
            ORDER BY q DESC, doc_id) AS BIGINT) AS slot
        FROM banded)
      SELECT CAST(row_number() OVER (ORDER BY band DESC, slot, source)
          AS BIGINT) AS position,
        doc_id, band, source
      FROM slotted ORDER BY position""",
    "x88_global_rank" -> s"""
      WITH $qualityCte
      SELECT doc_id, q AS quality,
        row_number() OVER (ORDER BY q DESC, doc_id) AS global_rank
      FROM scored ORDER BY doc_id""",
    "x89_shard_manifest" -> """
      WITH toks AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      ranked AS (
        SELECT *, row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
        FROM toks)
      SELECT (rk - 1) % 16 AS shard,
        COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
      FROM ranked GROUP BY 1 ORDER BY 1""")
}
