package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedCacheOps
import graft.Tables.load
import graft.functions.TextFunctions._

/** Sampling and sequence-assembly operators for training-data curation —
  * the "decide what goes into the next pretraining mix" surface. No
  * analog in the reference (its generator samples with numpy on the
  * driver, main.py:266-375); these are distributed, deterministic, and
  * re-runnable: selection is a pure function of the row key, never of
  * `rand()`, partition layout, or row order, so a resumed or re-run job
  * selects the identical subset.
  *
  * Scale notes: stratified sampling is a stateless per-row filter (scan
  * speed, no shuffle). Mixture sampling needs per-stratum quotas — exact
  * quotas use one tiny count aggregate plus a per-stratum rank; at
  * 100 TB with few strata the rank window would hot-spot one executor
  * per stratum, so the scale path replaces `row_number < quota` with the
  * equivalent hash-threshold filter `u32 < quota/count * 2^32` (same
  * statistical guarantee, no window; exact-quota form kept here because
  * the oracle can verify it row-for-row).
  */
object Sampling {

  /** Portable deterministic uniform: Knuth multiplicative hash of the row
    * key into [0, 2^32). The key is masked to 31 bits FIRST, so the
    * multiplication peaks at (2^31−1)·2654435761 < 2^63 — no silent
    * wrap in non-ANSI Spark, no overflow error in ANSI engines, for ANY
    * 64-bit key (unmasked, keys ≥ ~3.49e9 overflowed: non-ANSI Spark
    * wrapped them negative and kept every such row while the oracle
    * errored — exactly the >3.5B-id corpora a 100 TB run has). The high
    * 33 bits are XOR-folded into the low bits BEFORE the mask, so keys
    * differing only above bit 30 (k and k+2^31 on a >2.1B-id corpus)
    * still get distinct, uncorrelated hashes instead of colliding. The
    * odd multiplier is injective mod 2^32, so no duplicate ranks for
    * distinct folded keys. The arithmetic (`>>`, xor, `&`, `*`, `%`)
    * reproduces bit-for-bit in any engine with 64-bit integers — which
    * is what lets DuckDB verify the exact selected subset; xxhash64
    * would mix better but is not portable across engines. */
  def u32(key: Column): Column =
    (shiftright(key, 31).bitwiseXOR(key).bitwiseAND(lit(2147483647L))
      * lit(2654435761L)) % lit(4294967296L)

  /** The DuckDB spelling of [[u32]] for oracle SQL ("k" = key expr). */
  def u32Sql(k: String): String =
    s"((xor($k >> 31, $k) & 2147483647)*2654435761)%4294967296"

  /** Per-stratum Bernoulli sampling at deterministic rates — here:
    * downsample over-represented languages (en to 40%, es to 80%, rest
    * kept) — the classic "rebalance the language mix" curation step.
    * Thresholds are exact integers on the u32 scale so engines never
    * compare floats. Stateless per-row filter: no shuffle, pushes down
    * to the scan. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val threshold = when(col("lang") === "en", lit(1717986918L))  // 0.4 * 2^32
      .when(col("lang") === "es", lit(3435973836L))               // 0.8 * 2^32
      .otherwise(lit(4294967296L))                                // keep all
    load(s, dir, "documents")
      .filter(u32(col("doc_id")) < threshold)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Mixture weights in per-mille (integer, so quota arithmetic is exact
    * in every engine — double division of e.g. 73/0.2 rounds differently
    * across engines at floor boundaries). */
  val mixtureWeightsPm: Seq[(String, Long)] =
    Seq(("en", 350L), ("de", 150L), ("es", 200L), ("fr", 150L), ("zh", 150L))

  /** Deterministic mixture sampling: select the largest corpus with the
    * target language proportions. N = min_s floor(count_s·1000/w_s) is
    * the largest total the scarcest stratum supports; each stratum
    * contributes its floor(N·w_s/1000) lowest-hash rows. Integer `div`
    * throughout; selection = rank-by-u32 within stratum. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val w = s.createDataFrame(mixtureWeightsPm).toDF("lang", "wt_pm")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val n = counts.join(w, "lang")
      .agg(min(expr("cnt * 1000 div wt_pm")).as("n"))
    val quotas = w.crossJoin(n)
      .select(col("lang"), expr("n * wt_pm div 1000").as("quota"))
    val ranked = docs
      .withColumn("h", u32(col("doc_id")))
      .withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy("h", "doc_id")))
    ranked.join(broadcast(quotas), "lang")
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Temperature-weighted mixture plan: source weights ∝ mass^α with
    * α = 1/2 — the standard "flatten the source distribution" rule
    * (multilingual/multi-corpus sampling à la temperature sampling in
    * public LM-training literature): big sources are down-weighted,
    * small ones up-weighted, exponent 0.5 halfway between natural (α=1)
    * and uniform (α=0). Mass = total characters (document count is a
    * worse proxy when doc lengths differ by source).
    *
    * Engine-portable by construction: α=1/2 is floor∘sqrt (IEEE sqrt is
    * correctly rounded, so floor(sqrt(bigint)) is identical in every
    * engine), weights are per-mille integer divisions, and the planned
    * per-source doc quota is integer arithmetic — no float sums whose
    * ordering could diverge. One tiny aggregate (|sources| rows) that
    * broadcasts; the scan is the only big input at 100 TB. */
  def temperatureWeights(s: SparkSession, dir: String): DataFrame = {
    val bySource = load(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
      .withColumn("isqrt", floor(sqrt(col("total_chars"))).cast("long"))
    val totals = bySource.agg(sum(col("isqrt")).as("t"), sum(col("n_docs")).as("n_total"))
    bySource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("total_chars"),
        expr("isqrt * 1000 div t").as("weight_pm"),
        expr("n_total * (isqrt * 1000 div t) div 1000").as("planned_docs"))
      .orderBy("source")
  }

  /** Tokens per training sequence for [[packSequences]]. */
  val PackBudget = 256

  /** Sequence packing: assign documents to fixed-budget training
    * sequences by the concatenate-then-chunk rule — a document belongs to
    * the pack where its first token lands (`pack = start_offset div
    * budget`), offsets from a running token total in stable doc_id order.
    * Packing is per source: each shard packs independently (the window
    * partitions by source), which is exactly how a 100 TB corpus packs —
    * per input shard, in parallel, no global order. Output is the pack
    * manifest (doc count, token count, doc_id span per pack). */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val running = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum("n_tokens").over(running))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $PackBudget"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("pack_tokens"),
           min("doc_id").as("first_doc"),
           max("doc_id").as("last_doc"))
      .orderBy("source", "pack_id")
  }

  /** Context-window chunking parameters: 32-token windows, 8-token
    * overlap → stride 24. */
  val ChunkTokens = 32L
  val ChunkOverlap = 8L

  /** Context-window chunk manifest: split each document into
    * fixed-size token windows with overlap — the retrieval/pretraining
    * chunking step (every chunk after the first re-reads `overlap`
    * tokens so no span is ever cut without context). Emits one row per
    * chunk with its token span; n_chunks = ceil((n−overlap)/stride),
    * min 1. Pure integer arithmetic per row + an explode — scan speed,
    * no shuffle, and the manifest is exactly reproducible anywhere
    * (resume/backfill safe). */
  def chunkManifest(s: SparkSession, dir: String): DataFrame = {
    val stride = ChunkTokens - ChunkOverlap
    load(s, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        greatest(lit(1L), expr(s"(n_tokens - $ChunkOverlap + ${stride - 1}) div $stride")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("tok_start"),
        least(col("chunk_id") * stride + ChunkTokens, col("n_tokens")).as("tok_end"))
      .withColumn("chunk_tokens", col("tok_end") - col("tok_start"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic train/val/test split assignment: u32 hash ranges
    * 90/5/5. The property that matters operationally: membership is a
    * pure function of the key — adding documents later never moves an
    * existing document between splits (no reshuffling leakage between
    * training runs), and every engine recomputes the same assignment.
    * Output: per (lang, split) counts — the split-balance audit. */
  def splitAssignment(s: SparkSession, dir: String): DataFrame = {
    val h = u32(col("doc_id"))
    val split = when(h < lit(3865470566L), "train")   // 0.90 * 2^32
      .when(h < lit(4080218931L), "val")              // 0.95 * 2^32
      .otherwise("test")
    load(s, dir, "documents")
      .withColumn("split", split)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("n_chars"))
      .orderBy("lang", "split")
  }

  /** x97: padding-efficiency audit — when batches pad every sequence to
    * the batch max, tokens burned on padding are pure waste. Bucket
    * documents into 32-token length bins (integer div — the bins a
    * length-bucketed batcher would use), and report per bin: docs,
    * real tokens, padded cost at the bin's observed max, and the
    * efficiency ratio. The corpus-level number this rolls up to is the
    * case for length-bucketed batching over naive global batches. One
    * aggregate on a derived integer key; nothing shuffles twice. */
  def paddingAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("len_bin", expr("n_tokens div 32") * 32)
      .groupBy("len_bin")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("real_tokens"),
           max("n_tokens").as("bin_max"))
      .withColumn("padded_tokens", col("n_docs") * col("bin_max"))
      .withColumn("efficiency_pct",
        round(col("real_tokens") * lit(100.0) / col("padded_tokens"), 2))
      .select(col("len_bin"), col("n_docs"), col("real_tokens"),
              col("padded_tokens"), col("efficiency_pct"))
      .orderBy("len_bin")
  }

  /** x93: systematic probability-proportional-to-size sampling — draw
    * ~k documents with inclusion probability ∝ quality, WITHOUT
    * replacement, fully deterministic. Docs are laid on a line in
    * portable-hash order, each occupying a segment of integer length
    * w = floor(quality·1000); a doc is selected iff its segment crosses
    * a multiple of total/k (compared by cross-multiplication — pure
    * int64, no float grid). The cumulative position comes from
    * GlobalOrder.prefixSum (hash-prefix buckets), so there is NO
    * single-partition window at any corpus size — and the arithmetic
    * is integer-exact, so DuckDB replays the same selected set from a
    * naive windowed cumsum. */
  def ppsSample(s: SparkSession, dir: String): DataFrame = {
    val k = 50L
    val qs = graft.functions.TextFunctions.qualitySignals(col("text"))
    // r20 (guide §5): prefixSum evaluates docs twice and the total agg a
    // third time — each re-ran the qualitySignals kernel; the cached
    // frame is three longs per doc.
    val docs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        floor(qs.getField("quality") * 1000).cast("long").as("w"),
        u32(col("doc_id")).as("h"))
      .scopedCache()
    val cum = graft.ops.GlobalOrder.prefixSum(docs,
      expr("h div 4194304"),
      Seq(col("h").asc, col("doc_id").asc), col("w"), "cum")
    val total = docs.agg(sum("w").as("total_w"))
    cum.crossJoin(broadcast(total))
      .filter(expr(s"(cum * $k) div total_w") >
              expr(s"((cum - w) * $k) div total_w"))
      .select(col("doc_id"), col("w"))
      .orderBy("doc_id")
  }

  /** x101: train/val distribution drift — beyond x79's n-gram LEAKAGE
    * check, splits must also be distributionally exchangeable: a val
    * set whose term mix diverges from train's measures the wrong model.
    * For the 50 most frequent corpus terms, report each split's share
    * in integer parts-per-million (exact div — engines never compare
    * floats) and the absolute drift. Shares ride one term-keyed
    * aggregate; split totals are a broadcast 2-row frame; top-50 is a
    * TakeOrdered. */
  def splitTermDrift(s: SparkSession, dir: String): DataFrame = {
    val h = u32(col("doc_id"))
    val splitCol = when(h < lit(3865470566L), "train")
      .when(h < lit(4080218931L), "val").otherwise("test")
    val terms = graft.Tables.load(s, dir, "documents")
      .withColumn("split", splitCol)
      .filter(col("split") =!= "test")
      .select(col("split"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val counts = terms.groupBy("split", "term").agg(count(lit(1)).as("n"))
    val totals = terms.groupBy("split").agg(count(lit(1)).as("tot"))
    val shares = counts.join(broadcast(totals), "split")
      .withColumn("share_ppm", expr("(n * 1000000) div tot"))
    val top = terms.groupBy("term").agg(count(lit(1)).as("n_all"))
      .orderBy(desc("n_all"), col("term")).limit(50)
    top
      .join(shares.filter(col("split") === "train")
        .select(col("term"), col("share_ppm").as("train_ppm")), Seq("term"), "left")
      .join(shares.filter(col("split") === "val")
        .select(col("term"), col("share_ppm").as("val_ppm")), Seq("term"), "left")
      .select(col("term"), col("n_all"),
        coalesce(col("train_ppm"), lit(0L)).as("train_ppm"),
        coalesce(col("val_ppm"), lit(0L)).as("val_ppm"))
      .withColumn("drift_ppm", abs(col("train_ppm") - col("val_ppm")))
      .orderBy(desc("n_all"), col("term"))
  }

  /** x102: k-fold cross-validation assignment (k=5) — growth-stable,
    * like the x41 split: a document's fold depends only on its own id
    * hash, so adding data never reshuffles existing folds (re-running
    * CV on a grown corpus stays comparable). Reports per-fold document
    * and character mass so imbalance is visible before training. */
  def kfoldAssignment(s: SparkSession, dir: String): DataFrame = {
    val k = 5L
    graft.Tables.load(s, dir, "documents")
      .withColumn("__h", u32(col("doc_id")))
      .withColumn("fold", least(expr(s"__h div ${4294967296L / k}"), lit(k - 1)))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_chars").cast("long").as("n_chars"))
      .orderBy("fold")
  }

  /** Feature-set cap for the x108 importance scorer. Data-dependent like
    * OovVocabSize (this corpus has ~31 distinct terms); a production DSIR
    * run hashes n-grams into a fixed 10k-100k bucket space — still
    * broadcast range — instead of taking corpus-frequency top-K. */
  val DsirFeatures = 24

  /** x108: importance scoring for targeted data selection — the DSIR
    * recipe (Xie et al. 2023) with an integer-exact linear scorer in
    * place of the log-likelihood ratio. A target domain (here: the
    * labeled-`en` slice standing in for "trusted high-quality corpus")
    * defines per-term ppm rates; each document scores
    * Σ_t tf(t) · (target_ppm(t) − corpus_ppm(t)) — positive means the
    * doc looks more like the target than the background. The log-ratio
    * weights rank nearly identically but `ln` is not bit-specified
    * across engines; the ppm-difference form is exactly replayable (the
    * same portability trade tf-idf makes at x66, swapping `ln` back in
    * is one line when no external oracle is needed).
    *
    * Scale shape: one cached token explode feeds (a) the per-term
    * corpus/target counts that become the CAPPED feature table (top-K by
    * corpus frequency, K rows, broadcast — production DSIR uses hashed
    * n-gram buckets, same broadcast range) and (b) the scorer itself,
    * which exploits Σ_t tf(t)·w(t) = Σ_occurrences w: broadcast-join
    * each token occurrence to its weight (map-side, drops non-feature
    * tokens immediately) and run ONE doc-keyed sum — no per-(doc, term)
    * tf aggregate shuffling the whole vocabulary first; the only
    * corpus-sized shuffle is on doc_id with map-side partials. Overflow
    * headroom: tf ≤ doc tokens (~1e6 for a megadoc), |weight| ≤ 1e6
    * ppm, 256 features → ≤ 2.6e14 per doc, far inside int64. */
  def importanceScores(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val terms = docs.select(col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .scopedCache()
    val totals = terms.agg(count(lit(1)).as("tot_all"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tot_target"))
    val corpusCnt = terms.groupBy("term").agg(count(lit(1)).as("n_all"))
    val targetCnt = terms.filter(col("lang") === "en")
      .groupBy("term").agg(count(lit(1)).as("n_target"))
    val features = corpusCnt
      .orderBy(desc("n_all"), col("term")).limit(DsirFeatures)
      .join(targetCnt, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("corpus_ppm", expr("(n_all * 1000000) div greatest(tot_all, 1)"))
      .withColumn("target_ppm",
        expr("(coalesce(n_target, 0) * 1000000) div greatest(tot_target, 1)"))
      .select(col("term"), (col("target_ppm") - col("corpus_ppm")).as("weight"))
    val scores = terms.join(broadcast(features), "term")
      .groupBy("doc_id").agg(sum(col("weight")).as("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(scores, Seq("doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("selected", (col("score") > 0).cast("int"))
      .orderBy("doc_id")
  }

  /** x113 mix-plan constants: the token budget the mix must fill and
    * the oversampling ceiling (epochs) a scarce source may repeat —
    * the standard pretraining-mix guardrail (scarce high-quality
    * sources repeat a few epochs; nothing repeats unboundedly). */
  val MixBudgetTokens = 60000L
  val MixEpochCap = 4L

  /** x113: pretraining mixture plan — turn target mixture weights plus
    * per-source token supply into a concrete, guardrailed allocation.
    * For each source: requested = budget·weight, granted = min(request,
    * supply·epoch-cap), oversampling factor in integer milli-epochs,
    * and the UNMET shortfall reported as a column rather than silently
    * redistributed (the no-silent-caps rule: a mix that cannot be
    * satisfied should say so, loudly, before training starts). Weights
    * here are uniform-across-sources (the rebalance default); swapping
    * in a curated weight table is a broadcast join on `source`.
    *
    * Scale shape: one corpus scan → per-source token sums (map-side
    * partials), then pure integer arithmetic on a sources-sized frame
    * with the 1-row source count broadcast. Nothing here grows with
    * corpus size except the single aggregate. */
  def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    val perSource = graft.Tables.load(s, dir, "documents")
      .groupBy("source")
      .agg(coalesce(sum(tokenCount(col("text")).cast("long")), lit(0L))
        .as("supply_tokens"))
    perSource
      .crossJoin(broadcast(perSource.agg(count(lit(1)).as("n_sources"))))
      .withColumn("weight_ppm", expr("1000000 div n_sources"))
      .withColumn("requested_tokens",
        expr(s"($MixBudgetTokens * weight_ppm) div 1000000"))
      .withColumn("granted_tokens",
        least(col("requested_tokens"), col("supply_tokens") * lit(MixEpochCap)))
      .withColumn("epochs_milli",
        expr("(granted_tokens * 1000) div greatest(supply_tokens, 1)"))
      .withColumn("shortfall_tokens",
        col("requested_tokens") - col("granted_tokens"))
      .select(col("source"), col("supply_tokens"), col("weight_ppm"),
        col("requested_tokens"), col("granted_tokens"),
        col("epochs_milli"), col("shortfall_tokens"))
      .orderBy("source")
  }

  /** x164 constants: the token budget the published shard set fills
    * (sized so the mix quota BINDS at every test SF — the selection is
    * a real subset, never the whole corpus) and the shard fan-out. */
  val TrainShardBudgetTokens = 12000L
  val TrainShardCount = 16L

  /** The x164 selection→pack→shard chain as a per-document assignment
    * frame `(doc_id, source, pack_id, shard, n_tokens)` — the thing
    * that gets PUBLISHED. Deterministic end to end:
    *
    *   1. mix quotas (x113's arithmetic, one-epoch cap): granted_s =
    *      min(budget·weight, supply_s), uniform integer ppm weights;
    *   2. selection: each source contributes its lowest-u32-hash docs
    *      until the quota fills — a PREFIX of the per-source hash
    *      order, so the inclusive running total computed once serves
    *      both the cut (`cum ≤ granted`) and the pack offsets;
    *   3. packing (x33's concatenate-then-chunk rule): a doc belongs
    *      to the pack where its first token lands, offsets from the
    *      same running total;
    *   4. sharding: shard = portable-md5 hash of (source, pack_id)
    *      mod [[TrainShardCount]] — stateless, no global rank, and
    *      whole packs never straddle shards (training reads a pack's
    *      docs contiguously).
    *
    * Scale shape: quotas are a broadcast sources-sized frame; the
    * running total rides the per-source window — the x33 strata trade
    * (a 100 TB run packs per input shard; strata here are sources);
    * shard assignment is a per-row hash. The only corpus-sized work is
    * the one token-count scan; the published artifact is budget-
    * bounded, so it does NOT grow with the corpus. */
  private[graft] def shardAssignment(s: SparkSession, dir: String): DataFrame = {
    val tok = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("h", u32(col("doc_id")))
    val perSource = tok.groupBy("source").agg(sum("n_tokens").as("supply"))
    val quotas = perSource
      .crossJoin(broadcast(perSource.agg(count(lit(1)).as("n_sources"))))
      .withColumn("granted", least(
        expr(s"($TrainShardBudgetTokens * (1000000 div n_sources)) div 1000000"),
        col("supply")))
      .select("source", "granted")
    val running = Window.partitionBy("source").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok
      .withColumn("cum", sum("n_tokens").over(running))
      .join(broadcast(quotas), "source")
      .filter(col("cum") <= col("granted"))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $PackBudget"))
      .withColumn("shard",
        expr(s"""CAST(conv(substr(md5(concat_ws('|', source, pack_id)),
          1, 15), 16, 10) AS BIGINT) % $TrainShardCount"""))
      .select(col("doc_id"), col("source"), col("pack_id"), col("shard"),
        col("n_tokens"))
  }

  /** x164: training-shard PUBLISH composition (r18 verdict task 7) —
    * the proof that the sampling surface's parts compose into the
    * artifact a real user ships. [[shardAssignment]]'s per-doc frame
    * is committed ONCE through the claim-based OCC manifest (one
    * winner under concurrent opens; a reopen finds v1 and never
    * re-commits), then the audit record is recomputed FROM THE
    * PUBLISHED TABLE — x121's write-audit-publish rule: what the query
    * returns is what a training job would actually read, compared
    * row-for-row against the deterministic chain (the content_xor
    * folds every (doc, source, pack) binding, so a lost or duplicated
    * row flips the hash). The WAP gate also runs in-process: a
    * published table whose audit disagrees with the freshly-computed
    * assignment throws rather than serving a corrupt shard set.
    * Provenance rides in-result: budget, source count, total selected
    * mass — the columns a lineage system would stamp on the artifact. */
  def trainingShardPublish(s: SparkSession, dir: String): DataFrame =
    trainingShardPublishAt(s, dir,
      graft.etl.Sources.nonceRoot("train_shards", dir))

  /** The x164 publish at an explicit root, factored so the spec can
    * drive crash windows on the publish boundary. */
  private[graft] def trainingShardPublishAt(s: SparkSession, dir: String,
      root: org.apache.hadoop.fs.Path): DataFrame = {
    import graft.etl.Sources
    val asg = shardAssignment(s, dir)
    if (!Sources.manifestExists(s, root))
      Sources.manifestAppendExactly(s, root, asg, 2, 1L)
    // bounded wait for a lost claim's winner (the ADVICE-r18 window)
    var spins = 0
    while (Sources.currentManifest(s, root)._1 < 1L && spins < 600) {
      Thread.sleep(50); spins += 1
    }
    val pub = Sources.manifestReadAt(s, root, 1L)
    def auditOf(df: DataFrame) =
      df.agg(count(lit(1)).as("n"),
        expr("""bit_xor(CAST(conv(substr(md5(concat_ws('|',
            doc_id, source, pack_id, shard)), 1, 15), 16, 10) AS BIGINT))""")
          .as("x")).head()
    if (auditOf(pub) != auditOf(asg))
      throw new IllegalStateException(
        "x164 publish audit failed — published shard set diverged from " +
          "the deterministic assignment; refusing to serve it")
    val prov = pub.agg(
      countDistinct(col("source")).as("n_sources"),
      sum("n_tokens").cast("long").as("total_tokens"))
    pub.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(concat_ws("|", col("source"), col("pack_id")))
          .as("n_packs"),
        sum("n_tokens").cast("long").as("shard_tokens"),
        expr("""bit_xor(CAST(conv(substr(md5(concat_ws('|',
            doc_id, source, pack_id)), 1, 15), 16, 10) AS BIGINT))""")
          .as("content_xor"))
      .crossJoin(broadcast(prov))
      .withColumn("budget_tokens", lit(TrainShardBudgetTokens))
      .select(col("shard"), col("n_docs"), col("n_packs"),
        col("shard_tokens"), col("content_xor"), col("n_sources"),
        col("total_tokens"), col("budget_tokens"))
      .orderBy("shard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x164_training_shards" -> trainingShardPublish,
    "x113_mix_plan" -> mixturePlan,
    "x108_importance" -> importanceScores,
    "x102_kfold" -> kfoldAssignment,
    "x101_split_drift" -> splitTermDrift,
    "x93_sample_pps" -> ppsSample,
    "x97_padding_audit" -> paddingAudit,
    "x31_sample_stratified" -> stratifiedSample,
    "x32_sample_mixture" -> mixtureSample,
    "x33_pack_sequences" -> packSequences,
    "x41_split_assignment" -> splitAssignment,
    "x64_mixture_temperature" -> temperatureWeights,
    "x71_chunk_manifest" -> chunkManifest)

  val oracles: Map[String, String] = Map(
    // the full x164 chain replayed: quotas, hash-prefix selection,
    // concatenate-then-chunk packing, hashed sharding, per-shard audit
    // — the publish commit is content-invisible (the query reads the
    // published v1, which must equal this deterministic chain exactly)
    "x164_training_shards" -> s"""
      WITH tok AS (SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens,
          ${u32Sql("doc_id")} AS h
        FROM documents),
      ps AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS supply
        FROM tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_sources FROM ps),
      q AS (SELECT source,
          least(($TrainShardBudgetTokens * (1000000 // n_sources)) // 1000000,
            supply) AS granted
        FROM ps CROSS JOIN n),
      cm AS (SELECT tok.*, SUM(n_tokens) OVER (PARTITION BY source
          ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM tok),
      sel AS (SELECT c.doc_id, c.source, c.n_tokens,
          (c.cum - c.n_tokens) // $PackBudget AS pack_id
        FROM cm c JOIN q USING (source) WHERE c.cum <= q.granted),
      sh AS (SELECT *,
          CAST(concat('0x', substr(md5(concat_ws('|', source, pack_id)),
            1, 15)) AS BIGINT) % $TrainShardCount AS shard
        FROM sel),
      prov AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM sh)
      SELECT shard, COUNT(*) AS n_docs,
        CAST(COUNT(DISTINCT concat_ws('|', source, pack_id)) AS BIGINT)
          AS n_packs,
        CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        CAST(bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
            doc_id, source, pack_id)), 1, 15)) AS BIGINT)) AS BIGINT)
          AS content_xor,
        prov.n_sources, prov.total_tokens,
        CAST($TrainShardBudgetTokens AS BIGINT) AS budget_tokens
      FROM sh CROSS JOIN prov
      GROUP BY shard, prov.n_sources, prov.total_tokens
      ORDER BY shard""",
    "x113_mix_plan" -> s"""
      WITH ps AS (SELECT source,
          CAST(COALESCE(SUM(len(string_split_regex(trim(text), '\\s+'))), 0)
            AS BIGINT) AS supply_tokens
        FROM documents GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_sources FROM ps),
      base AS (SELECT source, supply_tokens,
          1000000 // n_sources AS weight_ppm FROM ps CROSS JOIN n),
      req AS (SELECT *,
          ($MixBudgetTokens * weight_ppm) // 1000000 AS requested_tokens
        FROM base),
      g AS (SELECT *,
          least(requested_tokens, supply_tokens * $MixEpochCap) AS granted_tokens
        FROM req)
      SELECT source, supply_tokens, weight_ppm, requested_tokens,
        granted_tokens,
        (granted_tokens * 1000) // greatest(supply_tokens, 1) AS epochs_milli,
        requested_tokens - granted_tokens AS shortfall_tokens
      FROM g ORDER BY source""",
    "x108_importance" -> s"""
      WITH terms AS (SELECT doc_id, lang,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents),
      totals AS (SELECT COUNT(*) AS tot_all,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tot_target
        FROM terms),
      ca AS (SELECT term, COUNT(*) AS n_all FROM terms GROUP BY 1),
      ct AS (SELECT term, COUNT(*) AS n_target FROM terms WHERE lang = 'en' GROUP BY 1),
      feats AS (
        SELECT f.term,
          (COALESCE(ct.n_target, 0) * 1000000 // greatest(tot_target, 1))
            - (f.n_all * 1000000 // greatest(tot_all, 1)) AS weight
        FROM (SELECT term, n_all FROM ca ORDER BY n_all DESC, term
              LIMIT $DsirFeatures) f
        LEFT JOIN ct USING (term) CROSS JOIN totals),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      sc AS (SELECT tf.doc_id, CAST(SUM(tf.tf * feats.weight) AS BIGINT) AS score
        FROM tf JOIN feats USING (term) GROUP BY 1)
      SELECT d.doc_id, d.lang, COALESCE(sc.score, 0) AS score,
        CASE WHEN COALESCE(sc.score, 0) > 0 THEN 1 ELSE 0 END AS selected
      FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""",
    "x102_kfold" -> s"""
      SELECT least(${u32Sql("doc_id")} // ${4294967296L / 5}, 4) AS fold,
        COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1 ORDER BY 1""",
    "x101_split_drift" -> s"""
      WITH t AS (
        SELECT CASE WHEN ${u32Sql("doc_id")} < 3865470566 THEN 'train'
                    WHEN ${u32Sql("doc_id")} < 4080218931 THEN 'val'
                    ELSE 'test' END AS split,
          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents),
      tv AS (SELECT * FROM t WHERE split <> 'test'),
      counts AS (SELECT split, term, COUNT(*) AS n FROM tv GROUP BY 1, 2),
      totals AS (SELECT split, COUNT(*) AS tot FROM tv GROUP BY 1),
      shares AS (
        SELECT c.split, c.term, (c.n * 1000000) // tot AS share_ppm
        FROM counts c JOIN totals USING (split)),
      top AS (
        SELECT term, COUNT(*) AS n_all FROM tv GROUP BY 1
        ORDER BY n_all DESC, term LIMIT 50)
      SELECT top.term, top.n_all,
        COALESCE(tr.share_ppm, 0) AS train_ppm,
        COALESCE(va.share_ppm, 0) AS val_ppm,
        abs(COALESCE(tr.share_ppm, 0) - COALESCE(va.share_ppm, 0)) AS drift_ppm
      FROM top
      LEFT JOIN (SELECT term, share_ppm FROM shares WHERE split = 'train') tr USING (term)
      LEFT JOIN (SELECT term, share_ppm FROM shares WHERE split = 'val') va USING (term)
      ORDER BY top.n_all DESC, top.term""",
    // x93's oracle is the SPEC (one global windowed cumsum); the plan
    // under test is the bucketed prefix-sum — the hash match proves the
    // decomposition re-adds to the identical integer line.
    "x93_sample_pps" -> s"""
      WITH qb AS (
        SELECT doc_id,
          CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains(['the','a','and','of','to','in','is','that','it','for','on','with'], x))) AS DOUBLE)
            / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1) AS stopword_ratio,
          CAST(length(regexp_replace(trim(text), '\\s', '', 'g')) AS DOUBLE)
            / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS avg_token_len,
          least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS length_score
        FROM documents),
      wts AS (
        SELECT doc_id,
          CAST(floor((length_score * 25.0 +
            (1.0 - least(punct_ratio * 5.0, 1.0)) * 25.0 +
            least(stopword_ratio * 4.0, 1.0) * 25.0 +
            (CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 25.0
          ) * 1000) AS BIGINT) AS w,
          ${u32Sql("doc_id")} AS h
        FROM qb),
      c AS (
        SELECT doc_id, w,
          SUM(w) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
          (SELECT SUM(w) FROM wts) AS total_w
        FROM wts)
      SELECT doc_id, w FROM c
      WHERE (cum * 50) // total_w > ((cum - w) * 50) // total_w
      ORDER BY doc_id""",
    "x97_padding_audit" -> """
      WITH t AS (SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      b AS (
        SELECT (n_tokens // 32) * 32 AS len_bin, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
          MAX(n_tokens) AS bin_max
        FROM t GROUP BY 1)
      SELECT len_bin, n_docs, real_tokens,
        n_docs * bin_max AS padded_tokens,
        ROUND(real_tokens * 100.0 / (n_docs * bin_max), 2) AS efficiency_pct
      FROM b ORDER BY len_bin""",
    "x71_chunk_manifest" -> """
      WITH t AS (SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, n_tokens,
          greatest(1, (n_tokens - 8 + 23) // 24) AS n_chunks FROM t),
      x AS (SELECT doc_id, n_tokens, unnest(range(0, n_chunks)) AS chunk_id FROM c)
      SELECT doc_id, chunk_id, chunk_id * 24 AS tok_start,
        least(chunk_id * 24 + 32, n_tokens) AS tok_end,
        least(chunk_id * 24 + 32, n_tokens) - chunk_id * 24 AS chunk_tokens
      FROM x ORDER BY doc_id, chunk_id""",
    "x64_mixture_temperature" -> """
      WITH c AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          CAST(floor(sqrt(CAST(SUM(n_chars) AS BIGINT))) AS BIGINT) AS isq
        FROM documents GROUP BY 1),
      t AS (SELECT CAST(SUM(isq) AS BIGINT) AS t,
          CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c)
      SELECT source, n_docs, total_chars,
        CAST((isq * 1000) // t.t AS BIGINT) AS weight_pm,
        CAST((n_total * ((isq * 1000) // t.t)) // 1000 AS BIGINT) AS planned_docs
      FROM c, t ORDER BY source""",
    "x31_sample_stratified" -> """
      SELECT doc_id, lang, source FROM documents
      WHERE ((xor(doc_id >> 31, doc_id) & 2147483647)*2654435761)%4294967296 <
        CASE WHEN lang='en' THEN 1717986918
             WHEN lang='es' THEN 3435973836
             ELSE 4294967296 END
      ORDER BY doc_id""",
    "x32_sample_mixture" -> """
      WITH w(lang, wt_pm) AS (VALUES ('en',350),('de',150),('es',200),('fr',150),('zh',150)),
      counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      n AS (SELECT MIN(cnt * 1000 // wt_pm) AS n FROM counts JOIN w USING (lang)),
      quota AS (SELECT w.lang, (n.n * w.wt_pm) // 1000 AS q FROM w, n),
      ranked AS (SELECT doc_id, lang, source,
        ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY ((xor(doc_id >> 31, doc_id) & 2147483647)*2654435761)%4294967296, doc_id) AS rn
        FROM documents)
      SELECT r.doc_id, r.lang, r.source FROM ranked r
      JOIN quota ON r.lang = quota.lang
      WHERE rn <= q ORDER BY doc_id""",
    "x41_split_assignment" -> """
      WITH a AS (SELECT lang, n_chars,
          CASE WHEN ((xor(doc_id >> 31, doc_id) & 2147483647)*2654435761)%4294967296 < 3865470566 THEN 'train'
               WHEN ((xor(doc_id >> 31, doc_id) & 2147483647)*2654435761)%4294967296 < 4080218931 THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      SELECT lang, split, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
    "x33_pack_sequences" -> """
      WITH t AS (SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
          SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t)
      SELECT source, CAST((cum - n_tokens) // 256 AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM c GROUP BY 1,2 ORDER BY 1,2""")
}
