package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents`: token statistics, language
  * ID, quality scoring, fingerprinting. All per-row maps (no shuffle
  * except the explicit rollup queries) — at 100 TB these run at scan
  * speed inside whole-stage codegen. */
object TextAnalysis {

  /** Token statistics per document (whitespace + BPE-ish counts).
    * No edge rounding: ratios are exact double divisions, identical in
    * any IEEE engine. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
              length(col("text")).cast("long").as("n_chars_obs"),
              tokenCount(col("text")).cast("long").as("n_tokens"),
              bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
              avgTokenLen(col("text")).as("avg_token_len"))
      .orderBy("doc_id")

  /** Heuristic language ID + agreement flag against the dataset label. */
  def languageId(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              langId(col("text")).as("predicted_lang"))
      .withColumn("agrees", (col("labeled_lang") === col("predicted_lang")).cast("int"))
      .orderBy("doc_id")

  /** Per-document quality score with its component signals. */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
              punctRatio(col("text")).as("punct_ratio"),
              stopwordRatio(col("text"), "en").as("stopword_ratio"),
              qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Corpus rollup by source: volume, mean quality, mean tokens —
    * the "which crawl sources are worth keeping" query. */
  def sourceQualityRollup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(qualityScore(col("text"))), 2).as("avg_quality"),
           round(avg(tokenCount(col("text"))), 2).as("avg_tokens"),
           sum(col("n_chars")).as("total_chars"))
      .orderBy("source")

  /** Winnowing-style fingerprints: 64-bit content hash + the 8 smallest
    * word-8-gram hashes per document (shared element ⇒ shared run). */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
              contentHash(col("text")).as("content_hash"),
              fingerprintSketch(col("text"), 8).as("sketch"))
      .withColumn("sketch_size", size(col("sketch")).cast("long"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x10_text_token_stats" -> tokenStats,
    "x11_text_langid" -> languageId,
    "x12_text_quality" -> qualityScores,
    "x13_text_source_rollup" -> sourceQualityRollup,
    "x14_text_fingerprints" -> fingerprints)

  /** DuckDB twins where the arithmetic is portable. Token counts: both
    * engines split trimmed text on \s+; ratios are raw double divisions
    * (no rounding → no decimal-tie divergence). */
  val oracles: Map[String, String] = Map(
    "x10_text_token_stats" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_obs,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
         CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE) /
           greatest(len(string_split_regex(trim(text), '\s+')), 1) AS avg_token_len
         FROM documents ORDER BY doc_id""")
}
