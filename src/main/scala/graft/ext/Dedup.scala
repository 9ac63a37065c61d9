package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.TextFunctions._
import graft.functions.Sketches._

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB. Five methods, one per fidelity/cost
  * point:
  *
  *  - exact:        hash-groupBy on content (one shuffle of 8-byte keys)
  *  - MinHash+LSH:  shingle → signature → band → bucket-join (near-dup)
  *  - SimHash:      64-bit sketch + pigeonhole bands (near-dup, 8 bytes/doc)
  *  - n-gram Jaccard: prefix-blocked exact Jaccard on token-shingle sets
  *  - embedding:    cosine near-dup via random-hyperplane LSH
  *
  * Scale notes: every method is (scan → per-row sketch → groupBy on a
  * compact key → within-bucket verify). Nothing here is O(n²) in the
  * corpus — candidate generation is always a bucket join; only verified
  * candidate pairs touch the (re-broadcast or re-shuffled) originals.
  * Per-doc summary outputs keep result sizes bounded (no pair blow-up).
  */
object Dedup {

  /** Exact dedup: keep the smallest doc_id per identical text. At scale
    * group on the 64-bit content hash first (8-byte shuffle keys), then
    * within-group on text to disambiguate hash collisions. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_chars")).as("n_chars"))
      .select(col("doc_id"), col("n_chars"), col("text"))
      .orderBy("doc_id")

  /** Exact-dedup survivor count by content hash — the 100 TB shape:
    * the full text never shuffles, only (hash, min_id). */
  def exactDedupStats(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    docs.agg(count(lit(1)).as("n_docs"),
             count_distinct(col("text")).as("n_distinct_texts"))
  }

  /** HyperLogLog++ variant of the dedup survey: per-source approximate
    * distinct texts at 1% target error. At 100 TB this replaces the
    * exact count-distinct's full shuffle of text hashes with fixed-size
    * mergeable sketches — the right first pass before an exact dedup.
    * (No DuckDB oracle: HLL implementations differ; DedupSpec bounds
    * the error against the exact count instead.) */
  def approxDedupStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           approx_count_distinct(col("text"), rsd = 0.01).as("approx_distinct_texts"))
      .orderBy("source")

  private val MinhashK = 64
  private val Bands = 16
  private val RowsPerBand = 4 // s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** MinHash+LSH near-duplicate detection (word 3-gram shingles,
    * 64-slot signatures, 16×4 banding, Jaccard ≥ 0.5 verify).
    * Output: one row per document with its candidate and verified
    * near-dup counts — bounded regardless of cluster sizes. */
  def minhashNearDups(s: SparkSession, dir: String): DataFrame = {
    // cache the sketched docs: the self-join + two verify joins below
    // would otherwise recompute the (expensive) shingle+minhash lineage
    // up to 4×. At cluster scale this is persist(MEMORY_AND_DISK) on a
    // frame of (id, hashes) — tiny next to the raw text.
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), shingleHashes(col("text"), 3).as("shingles"))
      .cache()
    val sigs = docs.select(col("doc_id"), col("shingles"),
      minhashSignature(col("shingles"), MinhashK).as("sig"))

    val banded = sigs.select(col("doc_id"),
        explode(lshBandKeys(col("sig"), Bands, RowsPerBand)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .cache()

    // candidate pairs: same (band, key) bucket, ordered ids, de-duped
    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    // verify with exact Jaccard on the shingle sets
    val withSets = pairs
      .join(docs.select(col("doc_id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(docs.select(col("doc_id").as("id2"), col("shingles").as("sh2")), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
    val verified = withSets.filter(col("jaccard") >= 0.5)

    perDocSummary(load(s, dir, "documents"), pairs, verified.select("id1", "id2"))
  }

  /** SimHash near-duplicate detection: 64-bit sketch, 4×16-bit
    * pigeonhole bands (catches all pairs with Hamming ≤ 3), Hamming
    * verify. The cheapest sketch: 8 bytes per document. */
  def simhashNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sim"))
      .cache()
    val bandedS = docs.select(col("doc_id"), col("sim"),
        explode(simhashBandKeys(col("sim"))).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band").as("band"), col("bk.key").as("key"))

    val a = bandedS.alias("a")
    val b = bandedS.alias("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
              col("a.sim").as("sim1"), col("b.sim").as("sim2"))
      .distinct()
      .withColumn("hamming", hamming64(col("sim1"), col("sim2")))

    val verified = pairs.filter(col("hamming") <= 3)
    perDocSummary(load(s, dir, "documents"),
      pairs.select("id1", "id2"), verified.select("id1", "id2"))
  }

  /** n-gram Jaccard near-dup with prefix blocking: block key = hash of
    * the 4 smallest token-hashes (documents sharing a block share rare
    * tokens), exact Jaccard ≥ 0.6 on distinct token 2-gram sets within
    * blocks. Prefix filtering keeps candidate generation a bucket join. */
  def ngramJaccardNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), shingleHashes(col("text"), 2).as("grams"))
      .withColumn("block", xxhash64(slice(array_sort(col("grams")), 1, 4)))
      .cache()

    val a = docs.alias("a")
    val b = docs.alias("b")
    val pairs = a.join(b,
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
              jaccard(col("a.grams"), col("b.grams")).as("jaccard"))

    val verified = pairs.filter(col("jaccard") >= 0.6)
    perDocSummary(load(s, dir, "documents"),
      pairs.select("id1", "id2"), verified.select("id1", "id2"))
  }

  private val Planes = hyperplanes(nBits = 64, dim = 64)
  private val EmbBands = 8
  private val BitsPerBand = 8

  /** Embedding-cosine near-dup: random-hyperplane signatures, 8×8-bit
    * bands, exact cosine ≥ 0.95 verify within buckets. */
  def embeddingNearDups(s: SparkSession, dir: String): DataFrame = {
    val embs = load(s, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bits", hyperplaneBits(col("v"), Planes))
      .cache()
    val banded = embs.select(col("doc_id"),
        explode(bitBandKeys(col("bits"), EmbBands, BitsPerBand)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    val withVecs = pairs
      .join(embs.select(col("doc_id").as("id1"), col("v").as("v1")), "id1")
      .join(embs.select(col("doc_id").as("id2"), col("v").as("v2")), "id2")
      .withColumn("cos", cosine(col("v1"), col("v2")))
    val verified = withVecs.filter(col("cos") >= 0.95)

    perDocSummary(
      load(s, dir, "embeddings").select(col("vec_id").as("doc_id")),
      pairs, verified.select("id1", "id2"))
  }

  /** One row per source document: candidate-pair count and verified
    * near-dup count (0 for documents with no matches). */
  private def perDocSummary(all: DataFrame, pairs: DataFrame, verified: DataFrame): DataFrame = {
    def sideCounts(p: DataFrame, name: String) =
      p.select(col("id1").as("doc_id"))
        .union(p.select(col("id2").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as(name))
    all.select(col("doc_id"))
      .join(sideCounts(pairs, "n_candidates"), Seq("doc_id"), "left")
      .join(sideCounts(verified, "n_near_dups"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates", "n_near_dups"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_dedup_exact" -> exactDedup,
    "x02_dedup_stats" -> exactDedupStats,
    "x26_dedup_approx_stats" -> approxDedupStats,
    "x03_dedup_minhash" -> minhashNearDups,
    "x04_dedup_simhash" -> simhashNearDups,
    "x05_dedup_ngram_jaccard" -> ngramJaccardNearDups,
    "x06_dedup_embedding" -> embeddingNearDups)

  val oracles: Map[String, String] = Map(
    "x01_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars, text
         FROM documents GROUP BY text ORDER BY doc_id""",
    "x02_dedup_stats" ->
      """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_distinct_texts
         FROM documents""")
}
