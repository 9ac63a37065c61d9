package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedCacheOps
import graft.Tables.load
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents`: token statistics, language
  * ID, quality scoring, fingerprinting. All per-row maps (no shuffle
  * except the explicit rollup queries) — at 100 TB these run at scan
  * speed inside whole-stage codegen. */
object TextAnalysis {

  /** Token statistics per document (whitespace + BPE-ish counts).
    * No edge rounding: ratios are exact double divisions, identical in
    * any IEEE engine. One compiled TokenStats evaluation per row (CSE
    * collapses the field extractions); the per-signal Column forms ran
    * three separate regexes per document and materialized token arrays
    * just to count them — 25.8× at the 100× ScaleCheck volume. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val ts = graft.functions.TextExpressions.tokenStats(col("text"))
    load(s, dir, "documents")
      .select(col("doc_id"),
              length(col("text")).cast("long").as("n_chars_obs"),
              ts.getField("n_tokens").as("n_tokens"),
              ts.getField("n_bpe_tokens").as("n_bpe_tokens"),
              ts.getField("avg_token_len").as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID + agreement flag against the dataset label. */
  def languageId(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              langId(col("text")).as("predicted_lang"))
      .withColumn("agrees", (col("labeled_lang") === col("predicted_lang")).cast("int"))
      .orderBy("doc_id")

  /** Per-document quality score with its component signals. One compiled
    * QualitySignals evaluation per row (CSE collapses the three field
    * extractions); the old per-signal Column forms re-tokenized the text
    * twice through an interpreted HOF — 7.1 s at sf0.1 vs ~1 s here. */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    load(s, dir, "documents")
      .select(col("doc_id"),
              qs.getField("punct_ratio").as("punct_ratio"),
              qs.getField("stopword_ratio").as("stopword_ratio"),
              qs.getField("quality").as("quality"))
      .orderBy("doc_id")
  }

  /** Corpus rollup by source: volume, mean quality, mean tokens —
    * the "which crawl sources are worth keeping" query. Both averaged
    * signals come from the one-pass QualitySignals struct. */
  def sourceQualityRollup(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(qs.getField("quality")), 2).as("avg_quality"),
           round(avg(qs.getField("n_tokens")), 2).as("avg_tokens"),
           sum(col("n_chars")).as("total_chars"))
      .orderBy("source")
  }

  /** Per-document discriminative terms by tf-idf, rational-idf form:
    * score = tf · N / df — a single integer-derived multiply and one
    * IEEE division per row, so every engine computes the identical
    * double (log-idf ranks by tf·ln(N/df); ln is NOT bit-specified
    * across engines, so the portable form uses the raw rarity ratio —
    * swapping `ln` in is one line for deployments that don't need an
    * external oracle). Top-3 per doc, ties broken by token.
    *
    * Scale shape: tf = one token-keyed aggregate with map-side
    * partials, CACHED because both df and the final score read it (the
    * uncached form re-ran the tokenize lineage — 3 parquet scans,
    * plan-asserted); df = a second aggregate over tf + a token-keyed
    * join back. NOT a window count over the token partition: a hot
    * token ("the" in a web corpus) puts its whole partition on one
    * task, and window skew — unlike join skew — is something AQE
    * cannot split. The df aggregate map-side-combines and the join is
    * AQE-skew-splittable; N broadcasts; final top-k is a per-doc
    * window on the doc-keyed shuffle. */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    // r20: compiled per-doc counting pass — the exploded rows are
    // already unique per (doc, token), so the corpus-mass hash
    // aggregate disappears (see Retrieval.postings; value-identical)
    val tf = docs
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .scopedCache()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), col("token"))
    tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Corpus profile over ALL grouping combinations of (lang, source) —
    * CUBE: per-cell, per-lang, per-source, and grand-total doc counts
    * and char mass in ONE pass (Spark expands the grouping sets in the
    * aggregate, not by re-scanning per dimension). Null grouping keys
    * are labeled 'ALL' so every engine sorts/compares them identically.
    * avg_chars = one integer-exact sum divided once — portable. */
  def corpusCube(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum("n_chars").cast("long").as("total_chars"),
           round(sum("n_chars").cast("double") / count(lit(1)).cast("double"), 2)
             .as("avg_chars"),
           // grouping(), not coalesce-on-null: a genuine NULL data value
           // must stay distinguishable from the rolled-up marginal rows
           grouping(col("lang")).as("gl"), grouping(col("source")).as("gs"))
      .select(when(col("gl") === 1, "ALL").otherwise(col("lang")).as("lang"),
              when(col("gs") === 1, "ALL").otherwise(col("source")).as("source"),
              col("n_docs"), col("total_chars"), col("avg_chars"))
      .orderBy("lang", "source")

  /** Winnowing-style fingerprints, exploded to one row per sketch slot:
    * (doc_id, content_hash, rank, gram_hash) where gram_hash is the
    * rank-th smallest MD5 of the doc's word 8-grams (shared element ⇒
    * shared 8-gram run). MD5 everywhere so DuckDB rebuilds the identical
    * sketch; the scalar row shape (vs the previous ArrayType column) is
    * what the driver's pandas harness can sort and hash. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
              md5(col("text")).as("content_hash"),
              posexplode(fingerprintSketch(col("text"), 8)))
      .select(col("doc_id"), col("content_hash"),
              (col("pos") + 1).cast("long").as("rank"),
              col("col").as("gram_hash"))
      .orderBy("doc_id", "rank")

  /** End-to-end curation pipeline — the composed shape of a
    * training-data pass: predicted-English only, quality ≥ 50, exact
    * dedup (min doc_id survives), per-source survivor stats. One scan,
    * one dedup shuffle, one rollup shuffle — every stage is a filter or
    * hash-agg that scales linearly. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .filter(langId(col("text")) === "en")
      .filter(qualityScore(col("text")) >= 50.0)
    // dedup groups on the 192-bit content key, not the text itself —
    // the document payload never rides the dedup exchange (same
    // hash-first contract as exactDedup, x01)
    val surviving = docs
      .groupBy(xxhash64(col("text")).as("h1"), md5(col("text")).as("h2"))
      .agg(min(col("doc_id")).as("doc_id"),
           min_by(col("source"), col("doc_id")).as("source"),
           min_by(col("n_chars"), col("doc_id")).as("n_chars"))
    surviving.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy("source")
  }

  /** Email-ish and phone-ish character patterns (the two PII shapes the
    * synthetic corpus can contain; a production pass has a longer list —
    * the operator shape is identical). */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9()\\s.-]{7,}[0-9]"

  /** PII redaction pass: replace email/phone-shaped spans with fixed
    * sentinels, report per-document match counts and the size delta.
    * Pure per-row regex maps — scan speed, no shuffle; the redacted
    * text column is what a real pipeline would write back out.
    * The synthetic corpus contains no PII, so every 7th document gets a
    * deterministic email+phone suffix first (identically rebuilt by the
    * oracle) — the counts then prove the regexes fire, not just parse.
    * One compiled PiiRedactionStats evaluation per row (the per-signal
    * Column forms ran FOUR regex passes per document, materializing two
    * match arrays just to count them — 14.3× at the 100× ScaleCheck
    * volume before the fuse). */
  def piiRedaction(s: SparkSession, dir: String): DataFrame = {
    val contact = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1 (555) 010-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val t = when(col("doc_id") % 7 === 0, contact).otherwise(col("text"))
    val pii = graft.functions.TextExpressions.piiRedactionStats(t, EmailRe, PhoneRe)
    load(s, dir, "documents")
      .select(col("doc_id"),
        pii.getField("n_emails").as("n_emails"),
        pii.getField("n_phones").as("n_phones"),
        pii.getField("len_raw").as("len_raw"),
        pii.getField("len_redacted").as("len_redacted"))
      .orderBy("doc_id")
  }

  /** Repetition signals (the rule-based repetition filters of published
    * quality pipelines): fraction of tokens that are repeats of an
    * earlier token, and the frequency share of the single most common
    * token. High values mean boilerplate/spam; thresholding these is a
    * standard pre-training filter. One compiled RepetitionStats pass per
    * row (the per-signal forms split the text twice more and allocated
    * an array_distinct per row just to count it) — no shuffle. */
  def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    val rs = graft.functions.TextExpressions.repetitionStats(col("text"))
    load(s, dir, "documents")
      .select(col("doc_id"),
        rs.getField("n_tokens").as("n_tokens"),
        rs.getField("dup_token_ratio").as("dup_token_ratio"),
        rs.getField("top_token_ratio").as("top_token_ratio"))
      .orderBy("doc_id")
  }

  /** Top-5 tokens per source by frequency, via the algebraic TopKAgg
    * aggregator (map-side partial top-k — the shuffle after the count
    * carries ≤5 rows per (source, partition), not the whole vocab). */
  def topTermsPerSource(s: SparkSession, dir: String): DataFrame = {
    val counts = load(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    graft.functions.TopKAgg.topKPerKey(counts, Seq("source"), col("cnt"), col("token"), 5)
      .select(col("source"), col("rank"),
        get_json_object(col("entry_json"), "$.token").as("token"),
        get_json_object(col("entry_json"), "$.cnt").cast("long").as("cnt"))
      .orderBy("source", "rank")
  }

  /** Tokenizer fertility by language: mean BPE-ish subword tokens per
    * whitespace word — the "how expensive is this language for the
    * tokenizer" audit every multilingual mix needs (high fertility =
    * more compute per word). Per-row ratio is a raw IEEE division
    * (portable); only the aggregated mean is rounded. Pure scan +
    * 5-group agg — scan speed at any corpus size. */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val ts = graft.functions.TextExpressions.tokenStats(col("text"))
    load(s, dir, "documents")
      .select(col("lang"),
        ts.getField("n_bpe_tokens").as("n_bpe"),
        ts.getField("n_tokens").as("n_ws"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_bpe").as("total_bpe_tokens"),
           sum("n_ws").as("total_ws_tokens"),
           round(avg(col("n_bpe").cast("double") / greatest(col("n_ws"), lit(1L)).cast("double")), 4)
             .as("avg_fertility"))
      .orderBy("lang")
  }

  /** Quality-score distribution per source: exact interpolated quartiles
    * + p90 (same fused array-percentile shape as x24; at 100 TB switch
    * to approx_percentile and trade the oracle for an error spec).
    * The "where do I set the quality threshold per crawl" calibration
    * query. */
  def qualityPercentiles(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    load(s, dir, "documents")
      .select(col("source"), qs.getField("quality").as("q"))
      .groupBy("source")
      .agg(expr("percentile(q, array(0.25D, 0.5D, 0.75D, 0.9D))").as("ps"),
           count(lit(1)).as("n_docs"))
      .select(col("source"),
        round(element_at(col("ps"), 1), 6).as("p25"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p75"),
        round(element_at(col("ps"), 4), 6).as("p90"),
        col("n_docs"))
      .orderBy("source")
  }

  /** Corpus bigram language model: P(w2 | w1) = c(w1 w2) / c(w1 ·) as
    * exact integer-count division, for the 20 highest-volume context
    * words and their top-5 continuations (count-desc, word-asc
    * tie-break — fully deterministic). Bigram extraction is a
    * shuffle-free per-row zip of the token array against its own tail
    * (codegen slice/arrays_zip — no interpreted lambda, no window);
    * the only shuffles are the two count aggregates. The shape of every
    * "n-gram statistics over the corpus" pass. */
  def bigramLm(s: SparkSession, dir: String): DataFrame = {
    // cached: both the context rollup and the join back read this
    // corpus-wide aggregate — without persistence the scan+explode+agg
    // (the dominant cost) executes twice. r20: the explode rides the
    // compiled per-doc BigramCounts pass, so the aggregate sums
    // per-doc partials (sum(m) ≡ the occurrence count) instead of
    // hashing the raw pair mass.
    val bigrams = load(s, dir, "documents")
      .select(explode(
        graft.functions.TextExpressions.bigramCounts(col("text"))).as("bi"))
      .select(col("bi.w1").as("w1"), col("bi.w2").as("w2"), col("bi.m").as("m"))
      .groupBy("w1", "w2").agg(sum("m").as("c12"))
      .scopedCache()
    val contexts = bigrams.groupBy("w1").agg(sum("c12").as("c1"))
    val topContexts = contexts
      .orderBy(col("c1").desc, col("w1")).limit(20)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w1").orderBy(col("c12").desc, col("w2"))
    bigrams.join(broadcast(topContexts), Seq("w1"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("w1"), col("rank"), col("w2"), col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1").cast("double")).as("p"))
      .orderBy("w1", "rank")
  }

  /** x125: model-based fluency filter (the CCNet idea, Wenzek et al.
    * 2020: score every document under a language model trained over a
    * corpus and gate on the score; CCNet uses a KenLM 5-gram
    * perplexity, here the corpus bigram LM the x47 machinery builds).
    * Per-bigram transition probability P(w2|w1) = c12/c1 rides as the
    * INTEGER per-mille floor(c12·1000/c1), and the per-doc score is
    * the occurrence-weighted integer mean — exact, portable arithmetic
    * end-to-end (true log-space perplexity would hang the gate on
    * libm's last-ulp ln() differences; a monotone fluency score ranks
    * documents identically for a threshold gate). Deciles come from
    * the bucketed exact global rank (ops.GlobalOrder — no
    * single-partition window; the integer score IS the bucket key);
    * keep = everything above the bottom decile.
    *
    * Scale shape: doc-side bigrams pre-aggregate per (doc_id, w1, w2)
    * with map-side combine, so the LM scoring join shuffles distinct
    * doc-bigram rows, never raw token mass; the LM tables are
    * vocab-bounded aggregates (the doc-bigram frame is scopedCached —
    * the LM build and the scoring join both read it). Self-scored like
    * x98's novelty (every doc bigram exists in its own corpus LM, so
    * the join is inner and total); a production filter swaps the LM
    * side for a reference-corpus table and left-joins with an OOV
    * floor. Docs under 2 tokens have no bigrams and are not scored
    * (mirrored by the oracle). */
  def perplexityFilter(s: SparkSession, dir: String): DataFrame = {
    // r20 (guide §5, profiled): `scored` is consumed THREE times — the
    // total count, GlobalOrder's bucket histogram, and its rank join —
    // and each evaluation re-ran the doc-bigram ⋈ LM join (the query's
    // dominant compute; only docBigrams below was cached). Caching the
    // NARROW per-doc score frame (3 longs/doc — cache-sane at any
    // corpus size, unlike the bigram mass) runs the join once: 4.4 →
    // 2.7 s isolated, identical rows.
    val scored = fluencyScoresFor(load(s, dir, "documents")).scopedCache()
    val total = scored.agg(count(lit(1)).as("__n"))
    graft.ops.GlobalOrder.globalRowNumber(scored,
        col("fluency_permille"),
        Seq(col("fluency_permille").asc, col("doc_id").asc))
      .crossJoin(broadcast(total))
      .withColumn("decile", expr("(global_rank - 1) * 10 div __n + 1"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_permille"),
        col("decile"), (col("decile") > 1).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Frame-level x125 scoring core (docs needs doc_id + text) —
    * factored so the property spec replays the SAME pipeline over
    * generated corpora against an independent in-memory computation.
    * Returns (doc_id, n_bigrams, fluency_permille) for every doc with
    * ≥ 1 bigram; all arithmetic integer-exact (see
    * [[perplexityFilter]]). */
  def fluencyScoresFor(docs: DataFrame): DataFrame = {
    // r20: compiled per-doc bigram counting (see TextExpressions
    // .BigramCounts) — the exploded rows are already unique per
    // (doc, w1, w2), so the corpus-mass hash aggregate disappears
    val docBigrams = docs
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.bigramCounts(col("text"))).as("bi"))
      .select(col("doc_id"), col("bi.w1").as("w1"), col("bi.w2").as("w2"),
        col("bi.m").as("m"))
      .scopedCache()
    val bigrams = docBigrams.groupBy("w1", "w2").agg(sum("m").as("c12"))
    val contexts = bigrams.groupBy("w1").agg(sum("c12").as("c1"))
    // r19-opt (guide §2.3/§2.4): pre-join the two VOCAB-BOUNDED LM
    // tables on w1 first, then hit the doc-bigram mass with ONE keyed
    // join on (w1,w2). The former shape joined docBigrams twice, so the
    // per-(doc,bigram) mass crossed an exchange once per LM table (by
    // (w1,w2), then AGAIN by w1); now it crosses once and the extra
    // exchange moves to the vocab-bounded side. Same inner-join algebra
    // — c1 aggregates the same bigram table — so results are identical.
    val lm = bigrams.join(contexts, Seq("w1"))
    docBigrams
      .join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("m").cast("long").as("n_bigrams"),
           sum(expr("m * (c12 * 1000 div c1)")).cast("long").as("mass"))
      .withColumn("fluency_permille", expr("mass div n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_permille"))
  }

  /** OOV floor for [[externalFluencyFilter]], in per-mille: a bigram
    * the reference LM never saw scores 1‰, not 0 — rare, not
    * impossible (the Laplace-flavored floor CCNet's KenLM gets from
    * its backoff smoothing). Integer so the whole score stays exact. */
  private val OovFloorPermille = 1L

  /** x131: the PRODUCTION shape of the x125 fluency filter (round-11
    * verdict item 6) — score corpus A under an EXTERNAL reference LM
    * trained on corpus B, the way CCNet scores a crawl snapshot under
    * a Wikipedia-trained model. x125 self-scores (inner join, total by
    * construction); here the scored side LEFT-joins the LM tables and
    * every transition the reference model never saw takes the
    * [[OovFloorPermille]] floor, with the OOV occurrence count carried
    * in the deliverable (`n_oov`) so a drifting corpus is visible, not
    * silently floored. The A/B split is doc_id parity — deterministic,
    * oracle-trivial, and disjoint so no document scores under a model
    * that saw it.
    *
    * Scale shape identical to x125: per-(doc,bigram) pre-aggregation
    * with map-side combine is the only token-mass shuffle; the LM
    * tables stay vocab-bounded aggregates; the left joins ride the
    * same distinct doc-bigram rows. */
  def externalFluencyFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    externalFluencyScoresFor(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
      .orderBy("doc_id")
  }

  /** Frame-level x131 core (both frames need doc_id + text), factored
    * for the spec like [[fluencyScoresFor]]. Returns (doc_id,
    * n_bigrams, n_oov, fluency_permille) for every scored doc with
    * ≥ 1 bigram; `n_oov` counts bigram OCCURRENCES whose (w1,w2) the
    * LM corpus lacks — a context-only miss (w1 known, pair unseen)
    * is OOV too, exactly like an unseen-word transition. */
  def externalFluencyScoresFor(docs: DataFrame, lmDocs: DataFrame): DataFrame = {
    // r20: compiled per-doc bigram counting (see fluencyScoresFor)
    def docBigramsOf(d: DataFrame) = d
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.bigramCounts(col("text"))).as("bi"))
      .select(col("doc_id"), col("bi.w1").as("w1"), col("bi.w2").as("w2"),
        col("bi.m").as("m"))
    val lmBigrams = docBigramsOf(lmDocs)
      .groupBy("w1", "w2").agg(sum("m").as("c12"))
    val lmContexts = lmBigrams.groupBy("w1").agg(sum("c12").as("c1"))
    // r19-opt: pre-join the vocab-bounded LM tables (see
    // fluencyScoresFor) — the scored side's doc-bigram mass crosses ONE
    // exchange instead of two. LEFT-join equivalence: c1 is only read
    // when c12 is non-null, and an inner lm pre-join keeps exactly the
    // (w1,w2) rows with c12 non-null, so a context-only miss (w1 seen,
    // pair unseen) lands in the same OOV branch either way.
    val lm = lmBigrams.join(lmContexts, Seq("w1"))
    docBigramsOf(docs)
      .join(lm, Seq("w1", "w2"), "left")
      // c12 non-null implies c1 non-null (c1 aggregates the same table).
      // Seen branch floored at the OOV floor: integer div scores a
      // seen-but-rarer-than-1-in-1000 transition 0 ‰, which would rank
      // it BELOW an unseen one — monotonicity demands observed ≥ floor.
      .withColumn("p", when(col("c12").isNotNull,
        greatest(expr("c12 * 1000 div c1"), lit(OovFloorPermille)))
        .otherwise(lit(OovFloorPermille)))
      .groupBy("doc_id")
      .agg(sum("m").cast("long").as("n_bigrams"),
           sum(when(col("c12").isNull, col("m")).otherwise(lit(0L)))
             .cast("long").as("n_oov"),
           sum(col("m") * col("p")).cast("long").as("mass"))
      .withColumn("fluency_permille", expr("mass div n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"), col("fluency_permille"))
  }

  /** Absolute rare floor for [[invertedIndex]] postings: a token in
    * fewer docs than this is noise regardless of corpus size. The
    * REST of the df band is relative — see below. */
  private val PostingsDfMinAbs = 5L

  /** Inverted-index postings for discriminative terms: one row per
    * (token, doc_id) with the within-doc term frequency, for tokens
    * whose document frequency sits inside the band
    * `max(PostingsDfMinAbs, N/1000) ≤ df ≤ 8N/10` (N = corpus docs).
    * The band is RELATIVE to corpus size by necessity: an absolute
    * band (this query shipped with df ∈ [5, 50]) empties as the
    * corpus grows — at 10× every token's df exceeded the ceiling and
    * the index silently indexed NOTHING (the VOLUME_AUDIT zero-row
    * trap, caught by the r19 hard-fail). The relative form is the
    * standard IR rule: drop stopwords above a df share (80%), drop
    * noise below a per-mille share with an absolute floor — both
    * cuts pure integer arithmetic, so every engine draws the same
    * band. The search-index build pass itself: tf by (token, doc)
    * with map-side combine, df as a token-keyed aggregate of the tf
    * table (already tiny), the 1-row corpus count broadcast,
    * semi-joined back. Both shuffles ride compact keys. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // cached: the df band derives from this frame and joins back to it —
    // the corpus-wide tokenize+agg would otherwise run twice
    // r20: compiled per-doc counting pass (see Retrieval.postings) —
    // same tokenization, same counts, same length>0 filter
    val tf = docs
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"), col("tc.tf").as("tf"))
      .filter(length(col("token")) > 0)
      .scopedCache()
    val banded = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") >= greatest(lit(PostingsDfMinAbs),
          expr("n_docs div 1000")) &&
        col("df") <= expr("(n_docs * 8) div 10"))
      .select("token", "df")
    tf.join(banded, Seq("token"))
      .select(col("token"), col("df"), col("doc_id"), col("tf"))
      .orderBy("token", "doc_id")
  }

  /** Quality deciles: the corpus split into 10 equal-count bins by
    * quality score — the curriculum/threshold view ("what does the
    * corpus's 3rd decile actually look like"). EXACT ntile semantics
    * (the first N mod 10 deciles take ⌈N/10⌉ rows, the rest ⌊N/10⌋ —
    * the standard NTILE rule both engines implement) but NOT the
    * engine's ntile window: that is an unpartitioned global sort, the
    * canonical 100 TB scale-killer. Instead the global rank comes from
    * the bucketed two-phase [[graft.ops.GlobalOrder.globalRowNumber]]
    * (bucket = floor(q·10), monotone along the (q, doc_id) order; ties
    * broken by doc_id so both engines rank identically) and the decile
    * is integer arithmetic on (rank, broadcast 1-row total). */
  def qualityDeciles(s: SparkSession, dir: String): DataFrame = {
    // r20 (guide §5): consumed three times — GlobalOrder's histogram,
    // its rank join, and the total count — and every evaluation re-ran
    // the qualityScore text kernel over the corpus. The cached frame is
    // two columns per doc (cache-sane at any corpus size).
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), qualityScore(col("text")).as("q")).scopedCache()
    val ranked = graft.ops.GlobalOrder.globalRowNumber(
      docs, floor(col("q") * lit(10)).cast("long"),
      Seq(col("q").asc, col("doc_id").asc), out = "rn")
    val total = broadcast(docs.agg(count(lit(1)).as("n_total")))
    val d = call_function("div", col("n_total"), lit(10L))      // ⌊N/10⌋
    val r = col("n_total") - d * lit(10L)                       // N mod 10
    val cutoff = r * (d + lit(1L))         // rows living in the big tiles
    ranked.crossJoin(total)
      .withColumn("decile",
        when(col("rn") <= cutoff,
          call_function("div", col("rn") + d, d + lit(1L)))
        .otherwise(lit(10L) - call_function("div",
          col("n_total") - col("rn"), greatest(d, lit(1L)))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
           min("q").as("min_quality"),
           max("q").as("max_quality"))
      .orderBy("decile")
  }

  /** Quality-weighted Bernoulli sampling: keep each document with
    * probability quality/100 — importance sampling for the training mix
    * (better documents are likelier to survive), deterministic and
    * re-runnable like all Sampling operators: selection is a pure
    * function of (doc_id, quality). A stateless scan-level filter — no
    * shuffle, no global pass; the threshold floor(q · 2^32/100) and the
    * u32 hash reproduce bit-for-bit in any engine. */
  def qualityWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    load(s, dir, "documents")
      .select(col("doc_id"), col("source"), qs.getField("quality").as("quality"))
      .filter(graft.ext.Sampling.u32(col("doc_id")) <
        floor(col("quality") * lit(42949672.96)).cast("long"))
      .orderBy("doc_id")
  }

  /** Cross-modal label audit: join the text corpus to its embedding
    * labels (doc_id = vec_id) and profile text quality per embedding
    * cluster label — the "is cluster 7 junk" question that pairs the
    * vector and text views of the same corpus. Equi-join on the 8-byte
    * id + one rollup; at scale the label side is a column in the same
    * table and this is a single pass. */
  def labelQualityProfile(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), qs.getField("quality").as("q"))
    val labels = load(s, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    docs.join(labels, Seq("doc_id"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("q"), 2).as("avg_quality"),
           round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("label")
  }

  /** Global token budget for [[budgetFill]], and the per-source share
    * cap (30% of the budget) that stops one crawl source from filling
    * the whole mix. Absolute-token constants like a real mix plan; at
    * sf0.001 the whole corpus fits (selection = everything), at sf0.01
    * the budget binds (~40% selected), at sf0.1 it binds hard (~4%). */
  val BudgetTokens = 10000L
  val SourceCapTokens = 3000L

  /** Token-budget corpus selection — "fill a 10k-token training budget
    * with the best documents, no source above 30%": the final assembly
    * step of a pretraining mix, downstream of scoring/dedup. Selection
    * rule (the spec, what the oracle states directly): order docs by
    * (quality DESC, doc_id), cap each source's running tokens at
    * [[SourceCapTokens]], then keep the prefix of the survivors whose
    * global running token total fits [[BudgetTokens]].
    *
    * The PLAN is deliberately not the spec's global-sort window — that
    * would put a 100 TB corpus through one ordered partition. Stage 1
    * (source caps) partitions by source: parallel, skew bounded by the
    * cap itself. Stage 2 resolves the global prefix by THRESHOLD
    * REFINEMENT: histogram token mass into 1001 integer quality buckets
    * (floor(q·10) — one tiny aggregate, broadcast), find the boundary
    * bucket where the running total crosses the budget, select every doc
    * above the boundary outright, and run the ordered prefix ONLY
    * inside the boundary bucket — itself through the two-phase
    * range-partitioned [[graft.ops.GlobalOrder.prefixSum]], because the
    * boundary bucket is corpus-derived and can hold ~10% of it. No
    * unpartitioned window in this plan ever sees corpus-sized input;
    * the single-partition frames left are the ≤1001-row histogram and
    * prefixSum's per-sub-bucket offsets, bounded by construction.
    * Provably the same set as the spec: floor is monotone, so bucket
    * order agrees with quality order across buckets, and the boundary
    * bucket's docs see the exact same global cumulative (full-bucket
    * prefix + in-bucket running sum). Hash-checked against the naive
    * spec in DuckDB — the plan-vs-spec equivalence is the gate. */
  def budgetFill(s: SparkSession, dir: String): DataFrame = {
    val qs = qualitySignals(col("text"))
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        qs.getField("quality").as("q"))
    val srcW = Window.partitionBy("source").orderBy(desc("q"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cached: the bucket histogram and both selection branches read it
    val eligible = docs.withColumn("src_cum", sum("n_tokens").over(srcW))
      .filter(col("src_cum") <= lit(SourceCapTokens))
      .withColumn("qb", floor(col("q") * lit(10)).cast("long"))
      .scopedCache()
    val bw = Window.orderBy(desc("qb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤1001 rows — the running sum's single partition is over the
    // histogram, never the corpus
    val runs = eligible.groupBy("qb").agg(sum("n_tokens").as("bt"))
      .withColumn("run", sum("bt").over(bw))
    // boundary = highest bucket whose running total crosses the budget;
    // null ⇒ the whole eligible corpus fits. prefix_above = tokens in
    // buckets strictly above it (≤ budget by minimality of the crossing)
    val bnd = broadcast(runs.agg(
      max(when(col("run") > lit(BudgetTokens), col("qb"))).as("qb_b"),
      max_by(col("run") - col("bt"),
        when(col("run") > lit(BudgetTokens), col("qb"))).as("prefix_above")))
    val withBnd = eligible.crossJoin(bnd)
    val above = withBnd.filter(col("qb_b").isNull || col("qb") > col("qb_b"))
    // in-bucket ordered prefix via the range-partitioned two-phase
    // prefix sum, NOT a bare Window.orderBy: the boundary bucket can
    // hold ~10% of the corpus (quality mass concentrates), and an
    // unpartitioned window there is the single-task sort this operator
    // exists to avoid. The sub-bucket key refines quality inside the
    // boundary band (floor is monotone, so -floor(q·10⁴) is
    // non-decreasing along the (q DESC, doc_id) order, as
    // GlobalOrder.prefixSum's contract requires); sub-buckets sort in
    // parallel and the only unpartitioned window left in this plan is
    // prefixSum's offsets frame — one row per sub-bucket, ≤ ~1000.
    val atBoundary = graft.ops.GlobalOrder.prefixSum(
        withBnd.filter(col("qb") === col("qb_b")),
        -floor(col("q") * lit(10000)).cast("long"),
        Seq(desc("q"), col("doc_id")),
        col("n_tokens"), out = "bcum")
      .filter(col("prefix_above") + col("bcum") <= lit(BudgetTokens))
      .drop("bcum")
    above.unionByName(atBoundary)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** x98: per-document novelty — the share of a document's distinct
    * 8-grams that it introduces FIRST into the corpus (ingest order =
    * doc_id). A doc whose grams were all seen earlier contributes
    * nothing new; curation pipelines use exactly this marginal-
    * contribution signal to cut late near-copies that slipped past
    * pairwise dedup. One gram-keyed min-aggregate (the same first-owner
    * relation the cluster star edges use) joined back per doc — the
    * x50 overlap-matrix plan shape, linear in total gram mass.
    *
    * HASH-FIRST SHUFFLE (the x01 exact-dedup rule): the gram is a pure
    * key here — never output — so both the first-owner groupBy and the
    * join back shuffle a 128-bit hash pair, not the ~50-byte 8-gram
    * string (accidental collision astronomically unlikely at any corpus
    * size, for a multi-× reduction in shuffled bytes). The pair is two
    * SALTED xxhash64 values: the keys never leave Spark (the oracle
    * keys on the strings), and md5 per gram occurrence was the dominant
    * remaining per-row cost of the first (xxhash64, md5) form — the
    * x42/x73 lesson applied here. The two engines agree exactly
    * whenever the pair is injective on the observed grams, the same
    * bet every content-hash dedup in the tree makes. */
  /** WINNOWED since r19 (the r18 verdict's worst-ratio task): novelty
    * is defined over the doc-locally winnowed fingerprint stream
    * (min-hash per window of 8, Schleimer et al. — the x73 selection,
    * [[graft.functions.TextExpressions.winnowedPositional]]), not over
    * every 8-gram. First-seen semantics transfer to fingerprints
    * unchanged: an exact later copy selects the SAME fingerprints as
    * its source (winnowing is doc-local and text-deterministic) and
    * scores 0, the corpus opener owns all of its and scores 100, and a
    * doc sharing a span ≥ w+g−1 tokens with an earlier doc is
    * GUARANTEED to share a fingerprint from it (the winnowing
    * guarantee) — while the shuffled mass drops to ~2/(w+1) ≈ 22% of
    * gram mass, the same cut that took x73's t100 from 21.9 s to
    * 9.1 s. The oracle replays the selection via the shared x73 CTE
    * chain ([[Contamination.WinnowSelCtes]]). */
  def noveltyScores(s: SparkSession, dir: String): DataFrame = {
    val grams = load(s, dir, "documents").select(col("doc_id"),
      explode(graft.functions.TextExpressions
        .winnowedPositional(col("text"), 8, 8)).as("pg"))
      .select(col("doc_id"),
        xxhash64(col("pg.gram")).as("g1"), xxhash64(col("pg.gram"), lit(1L)).as("g2"))
      .distinct()
    val firstOwner = grams.groupBy("g1", "g2").agg(min("doc_id").as("first_doc"))
    grams.join(firstOwner, Seq("g1", "g2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
             .as("novel_grams"))
      .withColumn("novelty_pct",
        round(col("novel_grams") * lit(100.0) / col("n_grams"), 2))
      .orderBy("doc_id")
  }

  /** Total 8-gram mass of the x98 novelty scan — its ScaleCheck
    * adjudication axis: both the first-owner aggregate and the join
    * back shuffle one (hash-pair) row per gram OCCURRENCE, so x98's
    * runtime must track this mass (≈ token volume), never outgrow it.
    * One scan, one scalar. */
  def noveltyGramMass(s: SparkSession, dir: String): Long =
    load(s, dir, "documents")
      .select(size(graft.functions.TextExpressions
        .wordShingleStrings(col("text"), 8)).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)

  /** ScaleCheck mass axis for the lm_join family (x125/x131): the
    * DISTINCT (doc, bigram) row count — the only token-mass frame the
    * fluency joins shuffle (the LM-side tables are vocab-bounded). */
  private[graft] def lmJoinRowMass(s: SparkSession, dir: String): Long = {
    val t = tokens(col("text"))
    val n = greatest(size(t) - 1, lit(0))
    load(s, dir, "documents")
      .select(col("doc_id"), slice(t, lit(1), n).as("a"), slice(t, lit(2), n).as("b"))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("bi"))
      .select(col("doc_id"), col("bi.a").as("w1"), col("bi.b").as("w2"))
      .distinct().count()
  }

  /** x99: vocabulary growth across ingest order — distinct terms seen
    * by the end of each doc_id decile (the Heaps'-law curve). A corpus
    * whose curve flattens early is saturating (more data, no new
    * language); a straight curve says keep crawling. Deciles are pure
    * integer arithmetic on the doc_id range (one 1-row min/max
    * aggregate, broadcast) — no ntile, no global window; the only
    * ordered window runs over the 10 decile rows. */
  def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val bounds = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    // integer `div` on BOTH engines (oracle uses `//`): floor(double
    // division) can land one decile off once (id-lo)*10 nears 2^53 —
    // the repo-wide exact-integer convention for oracle-replayed math
    def decileOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(call_function("div", (c - col("lo")) * 10,
        col("hi") - col("lo") + 1), lit(9)).cast("long")
    val terms = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val firstSeen = terms.groupBy("term").agg(min("doc_id").as("first_doc"))
    val perDecile = firstSeen.crossJoin(broadcast(bounds))
      .groupBy(decileOf(col("first_doc")).as("decile"))
      .agg(count(lit(1)).as("new_terms"))
    val nDocs = docs.crossJoin(broadcast(bounds))
      .groupBy(decileOf(col("doc_id")).as("decile"))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    nDocs.join(perDecile, Seq("decile"), "left")
      .select(col("decile"), col("n_docs"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("cum_vocab", sum("new_terms").over(w))
      .orderBy("decile")
  }

  /** x103: quality drift across ingest order — mean/extreme quality per
    * doc_id decile. A crawl whose recent deciles trend down is pulling
    * in junk; the monitoring twin of x99's vocabulary curve, same
    * integer decile arithmetic, one aggregate. */
  def qualityDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val bounds = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    val qs = qualitySignals(col("text"))
    docs.select(col("doc_id"), qs.getField("quality").as("q"))
      .crossJoin(broadcast(bounds))
      .groupBy(least(call_function("div", (col("doc_id") - col("lo")) * 10,
          col("hi") - col("lo") + 1), lit(9)).cast("long").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg("q"), 2).as("mean_quality"),
           min("q").as("min_quality"),
           max("q").as("max_quality"))
      .orderBy("decile")
  }

  /** Frozen-vocabulary size for the x107 OOV audit. Data-dependent the
    * same way RangeTau is: this synthetic corpus draws from ~31 distinct
    * terms, so 20 leaves a measurable OOV tail; a real tokenizer audit
    * would load its actual vocab (32k-256k entries — still broadcast
    * range) instead of deriving one from corpus frequency. */
  val OovVocabSize = 20

  /** x107: out-of-vocabulary audit — token coverage of a FROZEN
    * vocabulary per (lang, source), in integer ppm. The tokenizer-fit
    * question every pretraining corpus must answer before training: a
    * slice whose OOV rate is high will fragment into byte-fallback
    * tokens (fertility blow-up, wasted context) — x45 measures the
    * fertility symptom, this measures the vocabulary cause.
    *
    * Scale shape: the vocab is a capped top-K aggregate (map-side
    * combined, K rows out) and then BROADCAST against the token stream
    * — real vocabs are ≤256k entries, comfortably broadcast range; the
    * token stream is never shuffled on the token itself, only on the
    * (lang, source) rollup key. Integer ppm (`div`) keeps the ratio
    * exact on both engines. */
  def oovAudit(s: SparkSession, dir: String): DataFrame = {
    val terms = load(s, dir, "documents")
      .select(col("lang"), col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("term")).limit(OovVocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    terms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_ppm", expr("(oov_tokens * 1000000) div n_tokens"))
      .orderBy("lang", "source")
  }

  /** T5-style span-corruption MASK PLAN: for every document, the
    * deterministic set of token spans a denoising-pretraining pass
    * would replace with sentinels — 15% noise density, mean span 3,
    * the T5 defaults. The plan (not the rewritten text) is the
    * deliverable: a manifest the tokenize/pack stage applies, exactly
    * like x33/x71 are applied downstream.
    *
    * Placement must be deterministic AND non-overlapping without
    * sequential driver logic, so the token axis is cut into n_spans
    * equal segments and each span lands inside its own segment at a
    * seeded offset — start = lo + h(doc_id, span_idx) mod slack, h =
    * the md5-prefix integer hash (house portable-hash idiom, x03/x78).
    * Segments are ≥ ~20 tokens at 15%/3 by construction, so the slack
    * is always nonnegative (smallest masked doc: 7 tokens, 1 span of
    * 1). Pure per-row arithmetic + one explode — scan-speed, zero
    * shuffles; every number is integer-exact in any engine. */
  def maskPlan(s: SparkSession, dir: String): DataFrame =
    maskPlanFor(load(s, dir, "documents"))

  /** Frame-level mask planner (docs needs doc_id + text) — factored so
    * the property spec drives the SAME pipeline over generated
    * corpora. */
  def maskPlanFor(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("n_masked", expr("n_tokens * 15 div 100"))
      .filter(col("n_masked") >= 1)
      .withColumn("n_spans", expr("(n_masked + 2) div 3"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("span_idx"))
      .withColumn("lo", expr("span_idx * n_tokens div n_spans"))
      .withColumn("hi", expr("(span_idx + 1) * n_tokens div n_spans"))
      .withColumn("span_len",
        expr("CASE WHEN span_idx = n_spans - 1 THEN n_masked - 3 * (n_spans - 1) ELSE 3L END"))
      .withColumn("start_tok",
        expr("""lo + CAST(conv(substr(md5(concat(doc_id, ':', span_idx)), 1, 15), 16, 10)
                AS BIGINT) % (hi - lo - span_len + 1)"""))
      .select(col("doc_id"), col("span_idx"), col("start_tok"), col("span_len"))
      .orderBy("doc_id", "span_idx")

  /** Fused curation: the multi-signal keep decision a production
    * pretraining pass actually makes — language gate ∩ quality gate ∩
    * exact-dedup survivor ∩ SEMANTIC-dedup keep (x109's SemDeDup list,
    * joined on the doc's embedding id) — rolled up per source. Each
    * family keeps its own factored machinery (the compiled text gates,
    * the hash-first dedup, the shared x109 clustering), so the fusion
    * is three joins, not re-implementations; the oracle composes the
    * same factored CTE chains (`semKeepCtes` + `CurationGateSql`), so
    * neither engine's composition can drift from its parts. The keep
    * list comes from [[Similarity.semKeepList]] — the copy x109
    * PUBLISHED through the WAP path when it ran (or a fresh
    * build-and-publish if it hasn't) — so a suite run pays the IVF
    * clustering once, not twice; at 100 TB the keep-list is exactly
    * such a published table every curation pass joins against. */
  def curationFused(s: SparkSession, dir: String): DataFrame = {
    val semKeep = Similarity.semKeepList(s, dir)
      .filter(col("kept") === 1).select(col("vec_id").as("doc_id"))
    val gated = load(s, dir, "documents")
      .filter(langId(col("text")) === "en")
      .filter(qualityScore(col("text")) >= 50.0)
    val surviving = gated
      .groupBy(xxhash64(col("text")).as("h1"), md5(col("text")).as("h2"))
      .agg(min(col("doc_id")).as("doc_id"),
           min_by(col("source"), col("doc_id")).as("source"),
           min_by(col("n_chars"), col("doc_id")).as("n_chars"))
    surviving.join(semKeep, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
           sum("n_chars").cast("long").as("kept_chars"))
      .orderBy("source")
  }

  /** x136: BPE tokenizer-training merge rules (Sennrich et al. 2016,
    * the public subword algorithm). The corpus pass reduces to a
    * VOCAB-BOUNDED word-frequency table — the classic BPE trick: pair
    * statistics are weighted by word count, so the 100-TB corpus is
    * scanned exactly once and every merge iteration runs over the
    * small vocabulary table. Each iteration: adjacent symbol-pair
    * counts (the x47 shuffle-free slice/arrays_zip shape), argmax by
    * (count desc, pair asc), and an in-plan merge via `replace()`
    * against the BROADCAST 1-row winner — no collect(), no driver
    * loop. Symbols ride as space-separated strings; `replace` is
    * non-overlapping left-to-right in both engines, so for runs of 3+
    * identical symbols the separator after a match is consumed — a
    * deterministic, documented deviation from strict greedy BPE that
    * plan and oracle share (corpus tokens are ASCII; `(.)` splits
    * UTF-16 code units, asserted in CollocationSpec). */
  /** Space-separated symbol string for a word, with the </w> end marker
    * (shared by x136 training and x138 application). */
  private def symsOf(word: org.apache.spark.sql.Column) =
    concat(trim(regexp_replace(word, "(.)", "$1 ")), lit(" </w>"))

  /** Highest-count adjacent symbol pair of a (…, syms, wc) frame —
    * deterministic argmax (count desc, pair asc), 1 row (0 if no pairs
    * remain). */
  private def bestPair(w: DataFrame): DataFrame = {
    val a = split(col("syms"), " ")
    val n = greatest(size(a) - 1, lit(0))
    w.select(slice(a, lit(1), n).as("la"), slice(a, lit(2), n).as("lb"),
        col("wc"))
      .select(explode(arrays_zip(col("la"), col("lb"))).as("p"), col("wc"))
      .groupBy(col("p.la").as("left_sym"), col("p.lb").as("right_sym"))
      .agg(sum("wc").cast("long").as("pair_count"))
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
      .limit(1)
  }

  /** Apply one merge rule to a frame carrying a `syms` column (all
    * other columns pass through). The rule rides a BROADCAST 1-row
    * cross join — in-plan, no collect. An EMPTY rule frame empties the
    * result (merges exhausted); callers that need identity-on-empty
    * wrap the rule with a 0-count sentinel first (x138). */
  private def applyMerge(w: DataFrame, rule: DataFrame): DataFrame = {
    val others = w.columns.filterNot(_ == "syms").map(col)
    w.crossJoin(broadcast(rule.select("left_sym", "right_sym")))
      .select(others :+ trim(replace(
        concat(lit(" "), col("syms"), lit(" ")),
        concat(lit(" "), col("left_sym"), lit(" "), col("right_sym"),
          lit(" ")),
        concat(lit(" "), col("left_sym"), col("right_sym"), lit(" "))))
        .as("syms"): _*)
  }

  /** The corpus-global word-frequency symbol table and the three
    * trained merge rules (each cached 1-row frames) — shared by x136
    * (reports the rules) and x138 (applies them back to the corpus). */
  private def bpeTrained(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    val words = load(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).cast("long").as("wc"))
      .select(symsOf(col("word")).as("syms"), col("wc"))
      .scopedCache()
    val b1 = bestPair(words).scopedCache()
    val b2 = bestPair(applyMerge(words, b1)).scopedCache()
    val b3 = bestPair(applyMerge(applyMerge(words, b1), b2)).scopedCache()
    (words, Seq(b1, b2, b3))
  }

  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    val rules = bpeTrained(s, dir)._2
    rules.zipWithIndex
      .map { case (b, i) => b.withColumn("iter", lit((i + 1).toLong)) }
      .reduce(_ unionByName _)
      .select(col("iter"), col("left_sym"), col("right_sym"),
        col("pair_count"))
      .orderBy("iter")
  }

  /** x138: BPE ENCODE audit — apply the x136-trained merge rules back
    * to the corpus and report, per source, the compression the learned
    * subword vocabulary buys (symbols after / symbols before, exact
    * integer per-mille). This closes the tokenizer loop: x136 trains,
    * x138 applies, x45 measures a FIXED tokenizer's fertility. Same
    * scale shape as training: the corpus pass is one scan into a
    * per-source vocab-bounded table; each rule application is a
    * broadcast 1-row cross join. Rules are wrapped with a 0-count
    * empty-symbol sentinel (its search pattern is three spaces, which a
    * single-space-separated symbol string can never contain) so a
    * corpus that exhausts before 3 merges gets identity application
    * instead of an emptied frame. */
  def bpeEncodeAudit(s: SparkSession, dir: String): DataFrame = {
    val (_, rules) = bpeTrained(s, dir)
    def safe(r: DataFrame): DataFrame =
      r.select("left_sym", "right_sym", "pair_count")
        .unionByName(s.range(1).select(lit("").as("left_sym"),
          lit("").as("right_sym"), lit(0L).as("pair_count")))
        .orderBy(col("pair_count").desc, col("left_sym"),
          col("right_sym"))
        .limit(1)
    val vocab = load(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("source", "word").agg(count(lit(1)).cast("long").as("wc"))
      .withColumn("syms", symsOf(col("word")))
    val encoded = rules.map(safe).foldLeft(vocab)(applyMerge)
    encoded
      .select(col("source"), col("wc"),
        (length(col("word")) + 1).cast("long").as("sym_before"),
        size(split(col("syms"), " ")).cast("long").as("sym_after"))
      .groupBy("source")
      .agg(count(lit(1)).as("distinct_words"),
        sum("wc").cast("long").as("token_occurrences"),
        sum(col("wc") * col("sym_before")).cast("long").as("syms_before"),
        sum(col("wc") * col("sym_after")).cast("long").as("syms_after"))
      .withColumn("compression_permille",
        call_function("div", col("syms_after") * 1000, col("syms_before")))
      .orderBy("source")
  }

  /** x137: PMI collocations — pointwise-mutual-information lift
    * lift(w1,w2) = p(w1,w2) / (p(w1)·p(w2)) over adjacent token pairs
    * (Church & Hanks 1990). Distinct from x47's conditional LM: the
    * association score normalizes by BOTH marginals — the standard
    * collocation detector a curation pass runs to surface boilerplate
    * phrases and multi-word expressions. Scale shape: the unigram and
    * bigram counts are the only corpus-size shuffles; the marginal
    * tables are vocab-bounded and BROADCAST to the bigram side, and
    * the two scalar totals ride broadcast 1-row cross joins. The lift
    * is one fixed-shape IEEE double expression (identical operation
    * order in the oracle), so hashes replay exactly. */
  def pmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val t = tokens(col("text"))
    val uni = docs.select(explode(t).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).cast("long").as("cu"))
      .scopedCache()
    val nTok = uni.agg(sum("cu").cast("long").as("n_tok"))
    // r20: compiled per-doc bigram counting (sum(m) ≡ the occurrence
    // count; same pairs, same length>0 filters)
    val bi = docs
      .select(explode(
        graft.functions.TextExpressions.bigramCounts(col("text"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.m").as("m"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .groupBy("w1", "w2").agg(sum("m").cast("long").as("c12"))
      .scopedCache()
    val nBi = bi.agg(sum("c12").cast("long").as("n_bi"))
    bi.filter(col("c12") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("cu1"))),
        "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("cu2"))),
        "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c12"), col("cu1"), col("cu2"),
        ((col("c12").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_bi").cast("double") * col("cu1") * col("cu2"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x136_bpe_merges" -> bpeMerges,
    "x137_pmi_collocations" -> pmiCollocations,
    "x138_bpe_encode_audit" -> bpeEncodeAudit,
    "x123_curation_fused" -> curationFused,
    "x118_mask_plan" -> maskPlan,
    "x107_oov_audit" -> oovAudit,
    "x103_quality_drift" -> qualityDrift,
    "x99_vocab_growth" -> vocabGrowth,
    "x98_novelty" -> noveltyScores,
    "x87_budget_fill" -> budgetFill,
    "x63_label_quality" -> labelQualityProfile,
    "x60_sample_quality_weighted" -> qualityWeightedSample,
    "x56_quality_deciles" -> qualityDeciles,
    "x45_tokenizer_fertility" -> tokenizerFertility,
    "x46_quality_percentiles" -> qualityPercentiles,
    "x47_bigram_lm" -> bigramLm,
    "x125_perplexity_filter" -> perplexityFilter,
    "x131_fluency_external" -> externalFluencyFilter,
    "x48_inverted_index" -> invertedIndex,
    "x37_text_redaction" -> piiRedaction,
    "x38_text_repetition" -> repetitionStats,
    "x30_text_top_terms" -> topTermsPerSource,
    "x27_text_curation" -> curationPipeline,
    "x10_text_token_stats" -> tokenStats,
    "x11_text_langid" -> languageId,
    "x12_text_quality" -> qualityScores,
    "x13_text_source_rollup" -> sourceQualityRollup,
    "x14_text_fingerprints" -> fingerprints,
    "x66_tfidf_terms" -> tfidfTerms,
    "x67_corpus_cube" -> corpusCube)

  /** Shared DuckDB CTE: per-document quality signals and the composite
    * score — the SQL twin of [[graft.functions.TextExpressions.QualitySignals]],
    * defined ONCE and interpolated into every oracle that scores
    * quality (x12/x13/x46/x56). One definition to change when the
    * formula or stopword list moves, instead of four copies that can
    * silently drift. */
  private val QualityScoredSql = """
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

  /** Shared DuckDB CTEs: language prediction + quality score per doc —
    * the SQL twin of the (langId, qualityScore) curation gate. Used by
    * the x27 batch pipeline oracle and the x72 streaming-ingest twin
    * (EventStreams) so the two can never drift. Exposes
    * `lang_pred(doc_id, predicted, rn)` and `quality(doc_id, q)`. */
  private[graft] val CurationGateSql = """
      sw(lang, words) AS (VALUES
        ('de', ['der','die','das','und','ist','nicht','mit','ein','zu','den','von','sich']),
        ('en', ['the','a','and','of','to','in','is','that','it','for','on','with']),
        ('es', ['el','la','de','que','y','en','un','es','se','no','por','los']),
        ('fr', ['le','la','de','et','un','que','pour','dans','ce','les','des','est']),
        ('zh', ['的','是','不','了','在','人','有','我','他','这','中','大'])),
      toks AS (SELECT doc_id, source, n_chars, text,
                 string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      lang_pred AS (
        SELECT doc_id, lang AS predicted,
          row_number() OVER (PARTITION BY doc_id ORDER BY
            CAST(len(list_filter(t, x -> list_contains(sw.words, x))) AS DOUBLE)
              / greatest(len(t), 1) DESC, lang DESC) AS rn
        FROM toks CROSS JOIN sw),
      quality AS (
        SELECT doc_id,
          least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 25.0 +
          (1.0 - least(CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) * 5.0, 1.0)) * 25.0 +
          least(CAST(len(list_filter(t, x -> list_contains(['the','a','and','of','to','in','is','that','it','for','on','with'], x))) AS DOUBLE)
             / greatest(len(t), 1) * 4.0, 1.0) * 25.0 +
          (CASE WHEN CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE)
             / greatest(len(t), 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 25.0 AS q
        FROM toks)"""

  /** DuckDB twins where the arithmetic is portable. Token counts: both
    * engines split trimmed text on \s+; ratios are raw double divisions
    * (no rounding → no decimal-tie divergence). */
  /** Shared x136/x138 oracle CTE chain: corpus tokens (with source, so
    * x138 can build its per-source vocab from the same scan), global
    * word frequencies, symbol strings, and the three staged merge
    * rules b1/b2/b3 — ONE definition so training and application
    * cannot drift. */
  private val BpeTrainCtes: String = """
      toks AS (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents),
      wfreq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
                FROM toks WHERE length(word) > 0 GROUP BY 1),
      w0 AS (SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' </w>'
                      AS syms, wc FROM wfreq),
      p1 AS (SELECT a[i] AS left_sym, a[i+1] AS right_sym,
                    CAST(SUM(wc) AS BIGINT) AS pair_count
             FROM (SELECT a, wc, unnest(range(1, greatest(len(a)-1,0)+1)) AS i
                   FROM (SELECT string_split(syms, ' ') AS a, wc FROM w0))
             GROUP BY 1, 2),
      b1 AS (SELECT * FROM p1 ORDER BY pair_count DESC, left_sym, right_sym
             LIMIT 1),
      w1 AS (SELECT trim(replace(' ' || syms || ' ',
                      ' ' || b1.left_sym || ' ' || b1.right_sym || ' ',
                      ' ' || b1.left_sym || b1.right_sym || ' ')) AS syms, wc
             FROM w0, b1),
      p2 AS (SELECT a[i] AS left_sym, a[i+1] AS right_sym,
                    CAST(SUM(wc) AS BIGINT) AS pair_count
             FROM (SELECT a, wc, unnest(range(1, greatest(len(a)-1,0)+1)) AS i
                   FROM (SELECT string_split(syms, ' ') AS a, wc FROM w1))
             GROUP BY 1, 2),
      b2 AS (SELECT * FROM p2 ORDER BY pair_count DESC, left_sym, right_sym
             LIMIT 1),
      w2 AS (SELECT trim(replace(' ' || syms || ' ',
                      ' ' || b2.left_sym || ' ' || b2.right_sym || ' ',
                      ' ' || b2.left_sym || b2.right_sym || ' ')) AS syms, wc
             FROM w1, b2),
      p3 AS (SELECT a[i] AS left_sym, a[i+1] AS right_sym,
                    CAST(SUM(wc) AS BIGINT) AS pair_count
             FROM (SELECT a, wc, unnest(range(1, greatest(len(a)-1,0)+1)) AS i
                   FROM (SELECT string_split(syms, ' ') AS a, wc FROM w2))
             GROUP BY 1, 2),
      b3 AS (SELECT * FROM p3 ORDER BY pair_count DESC, left_sym, right_sym
             LIMIT 1)"""

  val oracles: Map[String, String] = Map(
    "x136_bpe_merges" -> s"""
      WITH $BpeTrainCtes
      SELECT CAST(1 AS BIGINT) AS iter, left_sym, right_sym, pair_count FROM b1
      UNION ALL
      SELECT CAST(2 AS BIGINT), left_sym, right_sym, pair_count FROM b2
      UNION ALL
      SELECT CAST(3 AS BIGINT), left_sym, right_sym, pair_count FROM b3
      ORDER BY iter""",
    "x138_bpe_encode_audit" -> raw"""
      WITH $BpeTrainCtes,
      sb1 AS (SELECT left_sym, right_sym FROM (
                SELECT left_sym, right_sym, pair_count FROM b1
                UNION ALL SELECT '', '', CAST(0 AS BIGINT))
              ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
      sb2 AS (SELECT left_sym, right_sym FROM (
                SELECT left_sym, right_sym, pair_count FROM b2
                UNION ALL SELECT '', '', CAST(0 AS BIGINT))
              ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
      sb3 AS (SELECT left_sym, right_sym FROM (
                SELECT left_sym, right_sym, pair_count FROM b3
                UNION ALL SELECT '', '', CAST(0 AS BIGINT))
              ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1),
      vocab AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS wc
                FROM toks WHERE length(word) > 0 GROUP BY 1, 2),
      v0 AS (SELECT source, word, wc,
                    trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' </w>'
                      AS syms
             FROM vocab),
      v1 AS (SELECT source, word, wc, trim(replace(' ' || syms || ' ',
                      ' ' || sb1.left_sym || ' ' || sb1.right_sym || ' ',
                      ' ' || sb1.left_sym || sb1.right_sym || ' ')) AS syms
             FROM v0, sb1),
      v2 AS (SELECT source, word, wc, trim(replace(' ' || syms || ' ',
                      ' ' || sb2.left_sym || ' ' || sb2.right_sym || ' ',
                      ' ' || sb2.left_sym || sb2.right_sym || ' ')) AS syms
             FROM v1, sb2),
      v3 AS (SELECT source, word, wc, trim(replace(' ' || syms || ' ',
                      ' ' || sb3.left_sym || ' ' || sb3.right_sym || ' ',
                      ' ' || sb3.left_sym || sb3.right_sym || ' ')) AS syms
             FROM v2, sb3),
      enc AS (SELECT source, wc,
                     CAST(length(word) + 1 AS BIGINT) AS sym_before,
                     CAST(len(string_split(syms, ' ')) AS BIGINT) AS sym_after
              FROM v3)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS distinct_words,
        CAST(SUM(wc) AS BIGINT) AS token_occurrences,
        CAST(SUM(wc * sym_before) AS BIGINT) AS syms_before,
        CAST(SUM(wc * sym_after) AS BIGINT) AS syms_after,
        (CAST(SUM(wc * sym_after) AS BIGINT) * 1000)
          // CAST(SUM(wc * sym_before) AS BIGINT) AS compression_permille
      FROM enc GROUP BY 1 ORDER BY 1""",
    "x137_pmi_collocations" -> """
      WITH toks AS (
        SELECT string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
              FROM (SELECT unnest(t) AS w FROM toks)
              WHERE length(w) > 0 GROUP BY 1),
      tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tok FROM uni),
      idx AS (SELECT t, unnest(range(1, greatest(len(t)-1,0)+1)) AS i
              FROM toks),
      bi AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM idx),
      bigrams AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi
                  WHERE length(w1) > 0 AND length(w2) > 0 GROUP BY 1, 2),
      totb AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bi FROM bigrams)
      SELECT w1, w2, c12, cu1, cu2,
        (CAST(c12 AS DOUBLE) * n_tok * n_tok) /
          (CAST(n_bi AS DOUBLE) * cu1 * cu2) AS lift
      FROM (SELECT b.w1, b.w2, b.c12, u1.cu AS cu1, u2.cu AS cu2
            FROM bigrams b
            JOIN uni u1 ON b.w1 = u1.w
            JOIN uni u2 ON b.w2 = u2.w
            WHERE b.c12 >= 5), tot, totb
      ORDER BY lift DESC, w1, w2 LIMIT 50""",
    "x123_curation_fused" -> s"""
      ${Similarity.semKeepCtes},
      $CurationGateSql,
      kept AS (
        SELECT d.doc_id, d.source, d.n_chars, d.text
        FROM documents d
        JOIN lang_pred lp ON d.doc_id = lp.doc_id AND lp.rn = 1 AND lp.predicted = 'en'
        JOIN quality qu ON d.doc_id = qu.doc_id AND qu.q >= 50.0),
      surviving AS (
        SELECT MIN(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
          arg_min(n_chars, doc_id) AS n_chars
        FROM kept GROUP BY text)
      SELECT s.source, COUNT(*) AS n_kept,
        CAST(SUM(s.n_chars) AS BIGINT) AS kept_chars
      FROM surviving s JOIN sem_keep k ON s.doc_id = k.vec_id
      GROUP BY 1 ORDER BY 1""",
    "x118_mask_plan" -> """
      WITH d AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      p AS (
        SELECT doc_id, n_tokens, n_tokens * 15 // 100 AS n_masked FROM d),
      p2 AS (
        SELECT doc_id, n_tokens, n_masked, (n_masked + 2) // 3 AS n_spans
        FROM p WHERE n_masked >= 1),
      sp AS (
        SELECT doc_id, n_tokens, n_masked, n_spans,
          unnest(range(0, n_spans)) AS span_idx
        FROM p2),
      geo AS (
        SELECT doc_id, span_idx,
          span_idx * n_tokens // n_spans AS lo,
          (span_idx + 1) * n_tokens // n_spans AS hi,
          CASE WHEN span_idx = n_spans - 1
               THEN n_masked - 3 * (n_spans - 1) ELSE 3 END AS span_len
        FROM sp)
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
        CAST(lo + CAST(concat('0x',
            substr(md5(concat(doc_id, ':', span_idx)), 1, 15)) AS BIGINT)
          % (hi - lo - span_len + 1) AS BIGINT) AS start_tok,
        CAST(span_len AS BIGINT) AS span_len
      FROM geo ORDER BY doc_id, span_idx""",
    "x107_oov_audit" -> s"""
      WITH terms AS (SELECT lang, source,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents),
      v AS (SELECT term, 1 AS in_vocab FROM (
        SELECT term, COUNT(*) AS n FROM terms GROUP BY 1
        ORDER BY n DESC, term LIMIT $OovVocabSize))
      SELECT lang, source, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS oov_tokens,
        CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          * 1000000 // COUNT(*) AS oov_ppm
      FROM terms LEFT JOIN v USING (term)
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "x103_quality_drift" -> """
      WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
      qb AS (
        SELECT doc_id,
          CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> list_contains(['the','a','and','of','to','in','is','that','it','for','on','with'], x))) AS DOUBLE)
            / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS stopword_ratio,
          CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE)
            / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS avg_token_len,
          least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS length_score
        FROM documents),
      sc AS (
        SELECT doc_id,
          length_score * 25.0 +
          (1.0 - least(punct_ratio * 5.0, 1.0)) * 25.0 +
          least(stopword_ratio * 4.0, 1.0) * 25.0 +
          (CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 25.0 AS q
        FROM qb)
      SELECT least((sc.doc_id - lo) * 10 // (hi - lo + 1), 9) AS decile,
        COUNT(*) AS n_docs, ROUND(AVG(q), 2) AS mean_quality,
        MIN(q) AS min_quality, MAX(q) AS max_quality
      FROM sc CROSS JOIN b GROUP BY 1 ORDER BY 1""",
    "x99_vocab_growth" -> """
      WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
      terms AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents),
      fs AS (SELECT term, MIN(doc_id) AS first_doc FROM terms GROUP BY 1),
      nt AS (
        SELECT least((first_doc - lo) * 10 // (hi - lo + 1), 9) AS decile,
          COUNT(*) AS new_terms
        FROM fs CROSS JOIN b GROUP BY 1),
      nd AS (
        SELECT least((doc_id - lo) * 10 // (hi - lo + 1), 9) AS decile,
          COUNT(*) AS n_docs
        FROM documents CROSS JOIN b GROUP BY 1)
      SELECT nd.decile, nd.n_docs,
        COALESCE(nt.new_terms, 0) AS new_terms,
        CAST(SUM(COALESCE(nt.new_terms, 0)) OVER (ORDER BY nd.decile
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      FROM nd LEFT JOIN nt USING (decile) ORDER BY nd.decile""",
    // the winnowed fingerprint selection replayed via the SHARED x73
    // CTE chain, then first-owner novelty over the DISTINCT selected
    // grams per doc
    "x98_novelty" -> s"""
      WITH ${Contamination.WinnowSelCtes},
      sgrams AS (SELECT DISTINCT g.doc_id, g.gram
        FROM grams g JOIN sel USING (doc_id, i)),
      fo AS (SELECT gram, MIN(doc_id) AS first_doc FROM sgrams GROUP BY 1)
      SELECT g.doc_id, COUNT(*) AS n_grams,
        CAST(SUM(CASE WHEN g.doc_id = fo.first_doc THEN 1 ELSE 0 END) AS BIGINT)
          AS novel_grams,
        ROUND(SUM(CASE WHEN g.doc_id = fo.first_doc THEN 1 ELSE 0 END) * 100.0
          / COUNT(*), 2) AS novelty_pct
      FROM sgrams g JOIN fo USING (gram)
      GROUP BY 1 ORDER BY 1""",
    // x87's oracle is the SPEC (global-sort prefix), not the plan
    // (bucketed threshold refinement) — the hash match IS the proof
    // that the scale-shaped plan computes the spec's exact set.
    "x87_budget_fill" -> s"""
      WITH $QualityScoredSql,
      capped AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, q,
          SUM(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS src_cum
        FROM scored),
      eligible AS (SELECT * FROM capped WHERE src_cum <= $SourceCapTokens),
      g AS (SELECT *, SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum FROM eligible)
      SELECT doc_id, source, n_tokens FROM g WHERE cum <= $BudgetTokens
      ORDER BY doc_id""",
    "x66_tfidf_terms" -> """
      WITH toks AS (SELECT doc_id,
          unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
          CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
        FROM tf JOIN df USING (token), n),
      ranked AS (SELECT *, CAST(ROW_NUMBER() OVER
          (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rank
        FROM scored)
      SELECT doc_id, rank, token, tf, df, score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",
    "x67_corpus_cube" -> """
      SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
        CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_chars
      FROM documents GROUP BY CUBE(lang, source) ORDER BY 1, 2""",
    "x63_label_quality" -> s"""
      WITH $QualityScoredSql
      SELECT e.label, COUNT(*) AS n_docs,
        round(AVG(s.q), 2) AS avg_quality,
        round(AVG(s.n_chars), 2) AS avg_chars
      FROM scored s JOIN embeddings e ON s.doc_id = e.vec_id
      GROUP BY 1 ORDER BY 1""",
    "x60_sample_quality_weighted" -> s"""
      WITH $QualityScoredSql
      SELECT doc_id, source, q AS quality FROM scored
      WHERE ((xor(doc_id >> 31, doc_id) & 2147483647)*2654435761)%4294967296 <
        CAST(floor(q * 42949672.96) AS BIGINT)
      ORDER BY doc_id""",
    "x56_quality_deciles" -> s"""
      WITH $QualityScoredSql
      SELECT decile, COUNT(*) AS n_docs,
        MIN(q) AS min_quality, MAX(q) AS max_quality
      FROM (SELECT CAST(ntile(10) OVER (ORDER BY q, doc_id) AS BIGINT) AS decile, q
            FROM scored)
      GROUP BY 1 ORDER BY 1""",
    "x45_tokenizer_fertility" -> """
      WITH t AS (SELECT lang,
          CAST(len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
        CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
        round(AVG(CAST(n_bpe AS DOUBLE) / greatest(n_ws, 1)), 4) AS avg_fertility
      FROM t GROUP BY 1 ORDER BY 1""",
    "x46_quality_percentiles" -> s"""
      WITH $QualityScoredSql
      SELECT source,
        ROUND(quantile_cont(q, 0.25), 6) AS p25,
        ROUND(quantile_cont(q, 0.5), 6) AS p50,
        ROUND(quantile_cont(q, 0.75), 6) AS p75,
        ROUND(quantile_cont(q, 0.9), 6) AS p90,
        COUNT(*) AS n_docs
      FROM scored GROUP BY 1 ORDER BY 1""",
    "x47_bigram_lm" -> """
      WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      idx AS (SELECT t, unnest(range(1, greatest(len(t)-1, 0)+1)) AS i FROM toks),
      bi AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM idx),
      bigrams AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
      contexts AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bigrams GROUP BY 1),
      top_ctx AS (SELECT w1, c1 FROM contexts ORDER BY c1 DESC, w1 LIMIT 20),
      ranked AS (
        SELECT b.w1, b.w2, b.c12, tc.c1,
          row_number() OVER (PARTITION BY b.w1 ORDER BY b.c12 DESC, b.w2) AS rank
        FROM bigrams b JOIN top_ctx tc USING (w1))
      SELECT w1, CAST(rank AS BIGINT) AS rank, w2, CAST(c12 AS BIGINT) AS c12, c1,
        CAST(c12 AS DOUBLE) / c1 AS p
      FROM ranked WHERE rank <= 5 ORDER BY w1, rank""",
    "x125_perplexity_filter" -> """
      WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 0)+1)) AS i FROM toks),
      bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx),
      dbi AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m FROM bi GROUP BY 1, 2, 3),
      bigrams AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c12 FROM dbi GROUP BY 1, 2),
      contexts AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bigrams GROUP BY 1),
      scored AS (SELECT d.doc_id,
          CAST(SUM(d.m) AS BIGINT) AS n_bigrams,
          CAST(SUM(d.m * (b.c12 * 1000 // c.c1)) AS BIGINT) AS mass
        FROM dbi d JOIN bigrams b USING (w1, w2) JOIN contexts c USING (w1)
        GROUP BY 1),
      fl AS (SELECT doc_id, n_bigrams, mass // n_bigrams AS fluency_permille FROM scored),
      rk AS (SELECT doc_id, n_bigrams, fluency_permille,
          row_number() OVER (ORDER BY fluency_permille, doc_id) AS r,
          COUNT(*) OVER () AS nn FROM fl)
      SELECT doc_id, n_bigrams, CAST(fluency_permille AS BIGINT) AS fluency_permille,
        CAST((r - 1) * 10 // nn + 1 AS BIGINT) AS decile,
        CAST(CASE WHEN (r - 1) * 10 // nn + 1 > 1 THEN 1 ELSE 0 END AS INT) AS keep
      FROM rk ORDER BY doc_id""",
    "x131_fluency_external" -> s"""
      WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 0)+1)) AS i FROM toks),
      bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx),
      dbi AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m FROM bi GROUP BY 1, 2, 3),
      lm_bigrams AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c12
        FROM dbi WHERE doc_id % 2 = 1 GROUP BY 1, 2),
      lm_contexts AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
        FROM lm_bigrams GROUP BY 1),
      scored AS (SELECT d.doc_id,
          CAST(SUM(d.m) AS BIGINT) AS n_bigrams,
          CAST(SUM(CASE WHEN b.c12 IS NULL THEN d.m ELSE 0 END) AS BIGINT) AS n_oov,
          CAST(SUM(d.m * (CASE WHEN b.c12 IS NOT NULL
            THEN greatest(b.c12 * 1000 // c.c1, $OovFloorPermille)
            ELSE $OovFloorPermille END)) AS BIGINT) AS mass
        FROM dbi d
        LEFT JOIN lm_bigrams b USING (w1, w2)
        LEFT JOIN lm_contexts c USING (w1)
        WHERE d.doc_id % 2 = 0
        GROUP BY 1)
      SELECT doc_id, n_bigrams, n_oov, mass // n_bigrams AS fluency_permille
      FROM scored ORDER BY doc_id""",
    "x48_inverted_index" -> """
      WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
      tf AS (
        SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
          FROM documents)
        WHERE length(token) > 0 GROUP BY 1, 2),
      banded AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        GROUP BY 1),
      sel AS (SELECT token, df FROM banded CROSS JOIN n
        WHERE df >= greatest(5, n_docs // 1000) AND df <= (n_docs * 8) // 10)
      SELECT t.token, s.df, t.doc_id, t.tf
      FROM tf t JOIN sel s USING (token)
      ORDER BY t.token, t.doc_id""",
    "x37_text_redaction" -> """
      WITH aug AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or +1 (555) 010-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE text END AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '\+?[0-9][0-9()\s.-]{7,}[0-9]')) AS BIGINT) AS n_phones,
        CAST(length(t) AS BIGINT) AS len_raw,
        CAST(length(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+?[0-9][0-9()\s.-]{7,}[0-9]', '<PHONE>', 'g')) AS BIGINT) AS len_redacted
      FROM aug ORDER BY doc_id""",
    "x38_text_repetition" -> """
      WITH tk AS (SELECT doc_id,
          string_split_regex(lower(trim(text)), '\s+') AS t FROM documents)
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_tokens,
        1.0 - len(list_distinct(t)) / len(t) AS dup_token_ratio,
        list_max(list_transform(list_distinct(t),
          x -> len(list_filter(t, y -> y = x)))) / len(t) AS top_token_ratio
      FROM tk ORDER BY doc_id""",
    "x30_text_top_terms" -> """
      WITH toks AS (
        SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        FROM documents),
      counts AS (
        SELECT source, token, COUNT(*) AS cnt FROM toks
        WHERE length(token) > 0 GROUP BY 1, 2)
      SELECT source, rank, token, cnt FROM (
        SELECT source, token, cnt,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, token) AS rank
        FROM counts)
      WHERE rank <= 5 ORDER BY source, rank""",
    "x27_text_curation" -> s"""
      WITH $CurationGateSql,
      kept AS (
        SELECT d.doc_id, d.source, d.n_chars, d.text
        FROM documents d
        JOIN lang_pred lp ON d.doc_id = lp.doc_id AND lp.rn = 1 AND lp.predicted = 'en'
        JOIN quality qu ON d.doc_id = qu.doc_id AND qu.q >= 50.0),
      surviving AS (
        SELECT MIN(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
               arg_min(n_chars, doc_id) AS n_chars
        FROM kept GROUP BY text)
      SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM surviving GROUP BY 1 ORDER BY 1""",
    "x10_text_token_stats" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_obs,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
         CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE) /
           greatest(len(string_split_regex(trim(text), '\s+')), 1) AS avg_token_len
         FROM documents ORDER BY doc_id""",
    "x11_text_langid" -> """
      WITH sw(lang, words) AS (VALUES
        ('de', ['der','die','das','und','ist','nicht','mit','ein','zu','den','von','sich']),
        ('en', ['the','a','and','of','to','in','is','that','it','for','on','with']),
        ('es', ['el','la','de','que','y','en','un','es','se','no','por','los']),
        ('fr', ['le','la','de','et','un','que','pour','dans','ce','les','des','est']),
        ('zh', ['的','是','不','了','在','人','有','我','他','这','中','大'])),
      toks AS (SELECT doc_id, lang AS labeled_lang,
                 string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
      scores AS (
        SELECT toks.doc_id, toks.labeled_lang, sw.lang,
          CAST(len(list_filter(toks.t, x -> list_contains(sw.words, x))) AS DOUBLE)
            / greatest(len(toks.t), 1) AS score
        FROM toks CROSS JOIN sw)
      SELECT doc_id, labeled_lang, lang AS predicted_lang,
        CAST(labeled_lang = lang AS INT) AS agrees
      FROM scores
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) = 1
      ORDER BY doc_id""",
    "x13_text_source_rollup" -> s"""
      WITH $QualityScoredSql
      SELECT source, COUNT(*) AS n_docs,
        round(AVG(q), 2) AS avg_quality,
        round(AVG(n_tokens), 2) AS avg_tokens,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM scored GROUP BY 1 ORDER BY 1""",
    "x14_text_fingerprints" -> """
      WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t)-7, 1)+1)) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram FROM idx),
      ranked AS (SELECT doc_id, md5(gram) AS gram_hash,
          row_number() OVER (PARTITION BY doc_id ORDER BY md5(gram)) AS rank
        FROM grams)
      SELECT d.doc_id, md5(d.text) AS content_hash,
        CAST(r.rank AS BIGINT) AS rank, r.gram_hash
      FROM documents d JOIN ranked r USING (doc_id)
      WHERE r.rank <= 8
      ORDER BY d.doc_id, r.rank""",
    "x12_text_quality" -> s"""
      WITH $QualityScoredSql
      SELECT doc_id, punct_ratio, stopword_ratio, q AS quality
      FROM scored ORDER BY doc_id""")
}
