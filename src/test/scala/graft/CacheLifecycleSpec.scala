package graft

/** Round-11 done-criterion for the cache-leak fix (round-9/10 verdict
  * item: 20 query-path `.cache()` calls, 5 `unpersist`s): after any
  * leak-site registry query materializes and the consumer calls
  * [[CacheScope.release]], the session must hold ZERO persisted RDDs —
  * the blocking unpersist makes this deterministic, so the assertion is
  * exact, not racy. One query per function that owns a former leak site
  * (all 17 across Dedup/Similarity/TextAnalysis/Sampling/Contamination). */
class CacheLifecycleSpec extends SparkSpec {

  // one registry query per cache-owning function; together these drive
  // every scopedCache() site in the five ext files
  private val leakSiteQueries = Seq(
    "x78_cms_heavy_hitters",      // Dedup.cmsHeavyHitters
    "x50_source_overlap",         // Dedup.crossSourceOverlap
    "x03_dedup_minhash",          // Dedup.minhashCandidates (both sites)
    "x04_dedup_simhash",          // Dedup.simhashNearDups
    "x05_dedup_ngram_jaccard",    // Dedup.ngramJaccardNearDups
    "x06_dedup_embedding",        // Dedup.embeddingNearDups
    "x08_sim_topk_lsh",           // Similarity.topKLsh
    "x28_sim_topk_ivf",           // Similarity.ivfBuild (3 sites)
    "x154_ivf_index_lifecycle",   // Similarity.ivfLifecycleIndex (2 sites)
    "x109_semdedup",              // Similarity.semDedup + ivfBuild
    "x66_tfidf_terms",            // TextAnalysis.tfidfTerms
    "x47_bigram_lm",              // TextAnalysis.bigramLm
    "x48_inverted_index",         // TextAnalysis.invertedIndex
    "x87_budget_fill",            // TextAnalysis.budgetFill
    "x108_importance",            // Sampling.importanceScores
    "x79_split_leakage")          // Contamination.splitLeakage

  // Diff against a pre-query snapshot rather than asserting the global
  // set empty: the session is shared across the whole sequential test
  // run, and an EARLIER suite's own persists (e.g. a localCheckpoint)
  // are not this spec's subject — the contract under test is "a
  // registry query adds NOTHING that survives its release".
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("every leak-site query leaves zero NEW persisted RDDs after release") {
    leakSiteQueries.foreach { name =>
      val before = persistedIds
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      ext.Dedup.drainCapLossReports()
      CacheScope.release()
      val leaked = persistedIds -- before
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persisted RDD(s) after CacheScope.release(): " +
          leaked.mkString(", "))
    }
  }

  test("the scoped cache is LIVE while the query executes (not a no-op)") {
    import CacheScope.ScopedCacheOps
    val before = persistedIds
    val df = spark.range(100).toDF("id").scopedCache()
    df.count()
    assert((persistedIds -- before).nonEmpty,
      "scopedCache must actually cache — the scope only bounds the lifetime")
    CacheScope.release()
    assert((persistedIds -- before).isEmpty)
  }
}
