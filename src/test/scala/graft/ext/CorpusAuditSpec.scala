package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-2 corpus-audit operators (x45-x58).
  * Each already hash-matches its DuckDB oracle; these assert the
  * semantic properties a refactor could silently break while still
  * producing SOME oracle-matchable output. */
class CorpusAuditSpec extends SparkSpec {

  test("tokenizer fertility: every word is at least one subword") {
    val out = TextAnalysis.tokenizerFertility(spark, sfDir)
    assert(out.filter(col("avg_fertility") < 1.0).count() == 0,
      "BPE pre-tokenization cannot merge across whitespace")
    assert(out.filter(col("total_bpe_tokens") < col("total_ws_tokens")).count() == 0)
  }

  test("quality deciles: equal-count bins with non-overlapping ranges") {
    val rows = TextAnalysis.qualityDeciles(spark, sfDir)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1, "ntile bins differ by more than one")
    // decile ranges are ordered: each min >= previous max is too strict
    // with duplicate scores at the boundary, but maxes must be monotone
    val maxes = rows.map(_.getAs[Double]("max_quality"))
    assert(maxes.sameElements(maxes.sorted), "decile ranges out of order")
    assert(rows.forall(r => r.getAs[Double]("min_quality") <= r.getAs[Double]("max_quality")))
  }

  test("bigram LM: probabilities are consistent fractions of the context count") {
    val out = TextAnalysis.bigramLm(spark, sfDir).cache()
    assert(out.filter(col("c12") > col("c1")).count() == 0)
    assert(out.filter(col("p") <= 0.0 || col("p") > 1.0).count() == 0)
    // top-5 continuations of one context can't exceed the whole mass
    val overfull = out.groupBy("w1").agg(sum("p").as("mass"))
      .filter(col("mass") > 1.0 + 1e-9)
    assert(overfull.count() == 0, "top-5 conditional mass exceeds 1")
    out.unpersist()
  }

  test("perplexity filter: scores bounded, deciles balanced, bottom decile dropped") {
    val out = TextAnalysis.perplexityFilter(spark, sfDir).cache()
    graft.CacheScope.release() // the query's internal scoped caches
    val n = out.count()
    // every scored doc has >= 1 bigram and a per-mille score in [0, 1000]
    assert(out.filter(col("n_bigrams") < 1).count() == 0)
    assert(out.filter(col("fluency_permille") < 0 ||
      col("fluency_permille") > 1000).count() == 0)
    // deciles partition the scored docs into 10 near-equal bins
    val sizes = out.groupBy("decile").count().collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == (1L to 10L).toSet, s"deciles present: ${sizes.keySet}")
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced deciles: $sizes")
    // keep == decile > 1, and the kept mass is exactly n minus decile 1
    assert(out.filter((col("decile") > 1) =!= (col("keep") === 1)).count() == 0)
    assert(out.filter(col("keep") === 1).count() == n - sizes(1L))
    // monotonicity: every kept doc scores >= every dropped doc
    val maxDropped = out.filter(col("keep") === 0)
      .agg(max("fluency_permille")).head().getLong(0)
    val minKept = out.filter(col("keep") === 1)
      .agg(min("fluency_permille")).head().getLong(0)
    assert(minKept >= maxDropped,
      s"kept doc scored below a dropped doc ($minKept < $maxDropped)")
    out.unpersist()
  }

  test("external-LM fluency: even docs only, OOV floored and counted, known-path matches a hand corpus") {
    import spark.implicits._
    val out = TextAnalysis.externalFluencyFilter(spark, sfDir).cache()
    graft.CacheScope.release()
    // only corpus A (even doc_ids) is scored, and never under its own LM
    assert(out.filter(pmod(col("doc_id"), lit(2)) =!= 0).count() == 0)
    assert(out.filter(col("n_bigrams") < 1).count() == 0)
    assert(out.filter(col("n_oov") < 0 || col("n_oov") > col("n_bigrams")).count() == 0)
    assert(out.filter(col("fluency_permille") < 0 ||
      col("fluency_permille") > 1000).count() == 0)
    // a doc that is 100% OOV scores exactly the floor (1 permille)
    assert(out.filter(col("n_oov") === col("n_bigrams") &&
      col("fluency_permille") =!= 1).count() == 0,
      "an all-OOV doc must score exactly the OOV floor")
    out.unpersist()

    // hand corpus pinning BOTH paths: LM corpus (odd ids) is "a b a b",
    // so the LM has c12(a,b)=2 within c1(a)=2 -> p=1000, and c12(b,a)=1
    // within c1(b)=1 -> p=1000. Scored docs: doc 0 "a b a b" (all known,
    // 3 bigrams at 1000) and doc 2 "a b x y" (bigrams a-b known=1000,
    // b-x OOV, x-y OOV -> mass 1000+1+1=1002, 1002 div 3 = 334).
    val docs = Seq((0L, "a b a b"), (2L, "a b x y")).toDF("doc_id", "text")
    val lm = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.externalFluencyScoresFor(docs, lm).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("fluency_permille")))).toMap
    assert(got == Map(0L -> ((3L, 0L, 1000L)), 2L -> ((3L, 2L, 334L))),
      s"hand-corpus mismatch: $got")
  }

  test("external-LM fluency: a seen-but-rare bigram never scores below the OOV floor") {
    import spark.implicits._
    // LM corpus: "a c" 1500 times then "a b" once -> c12(a,b)=1 within
    // c1(a)=1501, so the un-floored integer estimate 1000*1 div 1501 = 0
    // would rank an OBSERVED transition below an unseen one. The fix
    // floors the seen branch at the same 1 permille the OOV branch gets.
    val lm = Seq((1L, ("a c " * 1500) + "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b"), // seen-but-rare: n_oov=0, floored to 1 permille
      (2L, "a q")  // unseen: n_oov=1, the floor itself
    ).toDF("doc_id", "text")
    val got = TextAnalysis.externalFluencyScoresFor(docs, lm).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("fluency_permille")))).toMap
    assert(got == Map(0L -> ((1L, 0L, 1L)), 2L -> ((1L, 1L, 1L))),
      s"seen-rare floor mismatch: $got")
  }

  test("inverted index: relative df band respected, tf positive, postings unique, never empty under growth") {
    val out = TextAnalysis.invertedIndex(spark, sfDir).cache()
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    val lo = math.max(5L, nDocs / 1000)
    val hi = nDocs * 8 / 10
    assert(out.filter(col("df") < lo || col("df") > hi).count() == 0,
      s"df outside the relative band [$lo, $hi]")
    // the band is relative, so a corpus where EVERY token is common
    // still yields an index — the absolute [5, 50] band this query
    // shipped with indexed nothing at 10× (every df > 50)
    assert(out.count() > 0, "relative band emptied the index")
    assert(out.filter(col("tf") < 1).count() == 0)
    assert(out.groupBy("token", "doc_id").count().filter(col("count") > 1).count() == 0,
      "duplicate posting")
    // df really is the posting-list length
    val badDf = out.groupBy("token").agg(count(lit(1)).as("n"), first("df").as("df"))
      .filter(col("n") =!= col("df"))
    assert(badDf.count() == 0, "df disagrees with posting count")
    // the stopword ceiling has teeth: a token in >80% of docs is cut
    val allDocsToken = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > hi)
    val cut = allDocsToken.collect().map(_.getString(0)).toSet
    if (cut.nonEmpty)
      assert(out.filter(col("token").isin(cut.toSeq: _*)).count() == 0,
        s"stopword-band tokens leaked into the index: $cut")
    out.unpersist()
    graft.CacheScope.release()
  }

  test("normalized dedup partitions the corpus (variant counts sum to doc count)") {
    val out = Dedup.normalizedDedup(spark, sfDir)
    val total = out.agg(sum("n_variants")).collect()(0).getLong(0)
    assert(total == graft.Tables.load(spark, sfDir, "documents").count())
    // normalization can only merge groups, never split them
    assert(out.count() <= Dedup.exactDedup(spark, sfDir).count())
  }

  test("incremental dedup: survivors are odd-id docs absent from the snapshot") {
    val out = Dedup.incrementalDedup(spark, sfDir).cache()
    assert(out.filter(col("doc_id") % 2 === 0).count() == 0, "snapshot doc leaked")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val survivorTexts = out.select("doc_id").join(docs, "doc_id").select("text")
    val inSnapshot = survivorTexts
      .join(docs.filter(col("doc_id") % 2 === 0).select("text"), Seq("text"), "left_semi")
    assert(inSnapshot.count() == 0, "survivor duplicates a snapshot text")
    out.unpersist()
  }

  test("cross-source overlap: Jaccard bounded and pair list within C(S,2)") {
    val out = Dedup.crossSourceOverlap(spark, sfDir).cache()
    assert(out.filter(col("jaccard") <= 0.0 || col("jaccard") > 1.0).count() == 0)
    assert(out.filter(col("n_shared") > col("n_grams_a") ||
      col("n_shared") > col("n_grams_b")).count() == 0)
    val nSources = graft.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(out.count() <= nSources * (nSources - 1) / 2)
    out.unpersist()
  }

  test("retention cohorts: week 0 holds the full cohort") {
    val out = graft.analytics.EventAnalytics.retentionCohorts(spark, sfDir).cache()
    assert(out.filter(col("week_offset") < 0).count() == 0)
    // every user is active in their first-seen week by construction
    val week0 = out.filter(col("week_offset") === 0)
      .agg(sum("n_active")).collect()(0).getLong(0)
    val users = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(week0 == users, s"week-0 total $week0 != distinct users $users")
    out.unpersist()
  }

  test("rolling volume: the trailing week covers at least the day itself") {
    val out = graft.analytics.EventAnalytics.rollingVolume(spark, sfDir).cache()
    assert(out.filter(col("events_7d") < col("n_events")).count() == 0)
    val first = out.orderBy("day").limit(1).collect()(0)
    assert(first.getAs[Long]("events_7d") == first.getAs[Long]("n_events"),
      "first day has no preceding week")
    out.unpersist()
  }

  test("volume anomaly z-scores are centered (mean z ~ 0 over days)") {
    val out = graft.analytics.EventAnalytics.volumeAnomalies(spark, sfDir).cache()
    val meanZ = out.agg(avg("z")).collect()(0).getDouble(0)
    assert(math.abs(meanZ) < 1e-6, s"z-scores not centered: mean $meanZ")
    // an anomaly flag implies |z| >= 2 on the rounded value too
    assert(out.filter(col("is_anomaly") === 1 && abs(col("z")) < 1.999999).count() == 0)
    out.unpersist()
  }

  test("quality-weighted sampling keeps ~mean-quality fraction of the corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val kept = TextAnalysis.qualityWeightedSample(spark, sfDir).count().toDouble
    val n = docs.count().toDouble
    val meanQ = TextAnalysis.qualityScores(spark, sfDir)
      .agg(avg("quality")).collect()(0).getDouble(0)
    // u32 is uniform on doc_id → keep rate converges to E[quality]/100;
    // deterministic data, generous band for the finite-sample gap
    assert(math.abs(kept / n - meanQ / 100.0) < 0.05,
      s"keep rate ${kept / n} vs mean quality ${meanQ / 100.0}")
  }

  test("event sequences: top paths are complete trigrams with positive counts") {
    val rows = graft.analytics.EventAnalytics.topEventSequences(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n") >= 1))
    assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)))
    // ordered by count descending
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("session conversion counts nest: converted <= purchases <= sessions") {
    val r = graft.analytics.EventAnalytics.sessionConversion(spark, sfDir).collect()(0)
    val (sessions, views, purchases, converted) = (r.getAs[Long]("n_sessions"),
      r.getAs[Long]("n_with_view"), r.getAs[Long]("n_with_purchase"),
      r.getAs[Long]("n_converted"))
    assert(converted <= purchases && converted <= views)
    assert(views <= sessions && purchases <= sessions)
    // sessionizing can only split users into more sessions, never fewer
    val users = graft.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(sessions >= users)
  }

  test("range search agrees with brute-force top-k above the threshold") {
    val range = Similarity.rangeSearch(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    // cos_sim is rounded to 6dp: stay half-an-ulp-of-rounding above the
    // raw tau so a pair at the boundary can't pass here but fail there
    val topk = Similarity.topKBruteForce(spark, sfDir)
      .filter(col("cos_sim") >= 0.3000005)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("cs2"))
    // every above-threshold top-k hit must appear in the range result
    val missing = topk.join(range, Seq("query_id", "neighbor_id"), "left_anti")
    assert(missing.count() == 0, "top-k hit above tau missing from range search")
  }

  test("chunk manifest tiles every document: full cover, real overlap, bounded size") {
    import org.apache.spark.sql.expressions.Window
    val out = Sampling.chunkManifest(spark, sfDir).cache()
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
    val cover = out.groupBy("doc_id")
      .agg(min("tok_start").as("s"), max("tok_end").as("e"))
      .join(toks, "doc_id")
    assert(cover.filter(col("s") =!= 0L || col("e") =!= col("n")).count() == 0,
      "chunks must cover [0, n_tokens) exactly")
    val w = Window.partitionBy("doc_id").orderBy("chunk_id")
    val lagged = out.withColumn("prev_end", lag("tok_end", 1).over(w))
      .filter(col("prev_end").isNotNull)
    assert(lagged.filter(col("tok_start") >= col("prev_end")).count() == 0,
      "every chunk must overlap its predecessor")
    assert(out.filter(col("chunk_tokens") < 1L ||
      col("chunk_tokens") > Sampling.ChunkTokens).count() == 0)
    out.unpersist()
  }

  test("inter-arrival gaps: non-negative, and gap count = events - users") {
    val out = graft.analytics.EventAnalytics.interArrivalStats(spark, sfDir).cache()
    assert(out.filter(col("min_gap_us") < 0).count() == 0,
      "window ordered by (ts, event_id) can never yield a negative gap")
    val events = graft.Tables.load(spark, sfDir, "events")
    val expected = events.count() - events.select("user_id").distinct().count()
    val total = out.agg(sum("n_gaps")).collect()(0).getLong(0)
    assert(total == expected, s"each user contributes (n_events - 1) gaps: $total != $expected")
    out.unpersist()
  }

  test("temperature weights flatten the mixture toward uniform") {
    val rows = Sampling.temperatureWeights(spark, sfDir).collect()
    val masses = rows.map(_.getAs[Long]("total_chars").toDouble)
    val weights = rows.map(_.getAs[Long]("weight_pm").toDouble)
    // per-mille weights form a (floor-truncated) distribution
    assert(weights.sum <= 1000.0 && weights.sum > 1000.0 - rows.length)
    // alpha = 1/2 compresses spread: weight ratio <= sqrt of mass ratio
    val massRatio = masses.max / masses.min
    val weightRatio = weights.max / math.max(weights.min, 1.0)
    assert(weightRatio <= math.sqrt(massRatio) * 1.05,
      s"weight spread $weightRatio exceeds sqrt of mass spread $massRatio")
    // monotone: more mass never means a smaller weight
    val byMass = rows.sortBy(_.getAs[Long]("total_chars"))
    val ws = byMass.map(_.getAs[Long]("weight_pm"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a <= b })
  }

  test("hard negatives never share the query's label and rank by cosine") {
    val out = Similarity.hardNegatives(spark, sfDir).cache()
    assert(out.filter(col("query_label") === col("neighbor_label")).count() == 0)
    // within a query, cos_sim is non-increasing in rank
    val bad = out.alias("a").join(out.alias("b"),
        col("a.query_id") === col("b.query_id") &&
        col("a.rank") < col("b.rank") && col("a.cos_sim") < col("b.cos_sim"))
    assert(bad.count() == 0, "cosine not monotone in rank")
    // a hard negative can never score above the unrestricted top-1
    val top1 = Similarity.topKBruteForce(spark, sfDir)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("cos_sim").as("best"))
    val over = out.filter(col("rank") === 1)
      .join(top1, "query_id").filter(col("cos_sim") > col("best"))
    assert(over.count() == 0)
    out.unpersist()
  }

  test("tfidf: rarity ordering holds and score reconstructs from tf, df, N") {
    val n = graft.Tables.load(spark, sfDir, "documents").count().toDouble
    val out = TextAnalysis.tfidfTerms(spark, sfDir).cache()
    assert(out.filter(col("rank") > 3).count() == 0)
    val broken = out.filter(
      abs(col("score") - col("tf") * lit(n) / col("df")) > lit(1e-9))
    assert(broken.count() == 0, "score != tf * N / df")
    assert(out.filter(col("df") < 1 || col("tf") < 1).count() == 0)
    out.unpersist()
  }

  test("corpus cube: marginals and grand total are consistent") {
    val out = TextAnalysis.corpusCube(spark, sfDir).cache()
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    val grand = out.filter(col("lang") === "ALL" && col("source") === "ALL").collect()
    assert(grand.length == 1 && grand(0).getAs[Long]("n_docs") == nDocs)
    // per-lang marginals sum back to the grand total
    val langSum = out.filter(col("lang") =!= "ALL" && col("source") === "ALL")
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(langSum == nDocs)
    // finest cells sum to each lang marginal
    val cellSums = out.filter(col("lang") =!= "ALL" && col("source") =!= "ALL")
      .groupBy("lang").agg(sum("n_docs").as("cells"))
    val marg = out.filter(col("lang") =!= "ALL" && col("source") === "ALL")
      .select(col("lang"), col("n_docs").as("marginal"))
    assert(cellSums.join(marg, "lang")
      .filter(col("cells") =!= col("marginal")).count() == 0)
    out.unpersist()
  }

  test("novelty: later exact duplicates score zero; the corpus opener scores 100") {
    val out = TextAnalysis.noveltyScores(spark, sfDir).cache()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(out.count() == docs.count())
    // every doc_id that is a LATER copy of an earlier identical text
    // introduces no gram first — novelty must be exactly 0
    val laterDups = docs.alias("a").join(docs.alias("b"),
        col("a.text") === col("b.text") && col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id")).distinct()
    val nonZero = out.join(laterDups, "doc_id")
      .filter(col("novelty_pct") =!= 0.0)
    assert(nonZero.count() == 0, "a later exact dup claimed novel grams")
    // the lowest doc_id sees an empty corpus before it: everything novel
    val opener = out.orderBy("doc_id").first()
    assert(opener.getDouble(3) == 100.0)
    out.unpersist()
  }

  test("vocab growth: deciles cover the corpus, curve is monotone and exact at the end") {
    val rows = TextAnalysis.vocabGrowth(spark, sfDir).collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val cum = rows.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "curve must not shrink")
    val totalVocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .agg(countDistinct("term")).collect()(0).getLong(0)
    assert(cum.last == totalVocab, s"final vocab ${cum.last} != exact $totalVocab")
  }

  test("quality drift: deciles cover the corpus, bounds sane") {
    val rows = TextAnalysis.qualityDrift(spark, sfDir).collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4), "min quality above max")
      assert(r.getDouble(2) >= r.getDouble(3) - 0.01 &&
             r.getDouble(2) <= r.getDouble(4) + 0.01, "mean outside [min, max]")
    }
  }

  test("oov audit: token mass conserved, ppm bounded, frozen vocab leaves a tail") {
    val out = TextAnalysis.oovAudit(spark, sfDir).cache()
    assert(out.filter(col("oov_tokens") > col("n_tokens")).count() == 0)
    assert(out.filter(col("oov_ppm") < 0 || col("oov_ppm") > 1000000).count() == 0)
    // every whitespace token of the corpus lands in exactly one slice
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .count()
    assert(out.agg(sum("n_tokens")).head().getLong(0) == direct,
      "token mass differs from a direct tokenize-and-count")
    // this corpus has more distinct terms than OovVocabSize, so the
    // frozen vocab MUST leave out-of-vocabulary mass somewhere
    assert(out.agg(sum("oov_tokens")).head().getLong(0) > 0)
    out.unpersist()
  }

  test("fused curation never keeps more than any of its component gates") {
    val fused = TextAnalysis.curationFused(spark, sfDir).cache()
    // per source, the fusion is a subset of the text-only pipeline (x27)
    val x27 = TextAnalysis.curationPipeline(spark, sfDir)
      .select(col("source"), col("n_kept").as("n_x27"))
    val over = fused.join(x27, "source").filter(col("n_kept") > col("n_x27"))
    assert(over.count() == 0, "fusion kept docs the text gates rejected")
    // and bounded by the semantic keep list size
    val semKept = Similarity.semDedup(spark, sfDir)
      .filter(col("kept") === 1).count()
    assert(fused.agg(coalesce(sum("n_kept"), lit(0L))).head().getLong(0) <= semKept)
    fused.unpersist()
  }

  test("mask plan: spans in bounds, non-overlapping, 15% mass, deterministic") {
    import graft.functions.TextFunctions.tokenCount
    val out = TextAnalysis.maskPlan(spark, sfDir).cache()
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
    val joined = out.join(toks, "doc_id").cache()
    // every span sits inside its document's token axis
    assert(joined.filter(col("start_tok") < 0 ||
      col("start_tok") + col("span_len") > col("n_tokens")).count() == 0)
    assert(joined.filter(col("span_len") < 1 || col("span_len") > 3).count() == 0)
    // spans never overlap: ordered by start within a doc, each span ends
    // before the next begins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("start_tok")
    val overlaps = out
      .withColumn("next_start", lead(col("start_tok"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        col("start_tok") + col("span_len") > col("next_start"))
    assert(overlaps.count() == 0)
    // masked mass per doc is exactly n_tokens * 15 div 100
    val badMass = joined.groupBy("doc_id", "n_tokens")
      .agg(sum("span_len").as("masked"))
      .filter(col("masked") =!= expr("n_tokens * 15 div 100"))
    assert(badMass.count() == 0)
    // same plan on a second evaluation — seeded, no RNG state
    assert(out.collect().toSeq ==
      TextAnalysis.maskPlan(spark, sfDir).collect().toSeq)
    joined.unpersist(); out.unpersist()
  }
}
