package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {

  test("benchmarkContamination flags exact copies of benchmark docs") {
    val docs = graft.Tables.load(spark, sfDir, "documents").cache()
    val out = Contamination.benchmarkContamination(spark, sfDir).cache()

    // one row per training (non-benchmark) doc
    val nTrain = docs.filter(col("doc_id") % 13 =!= 0).count()
    assert(out.count() == nTrain)
    assert(out.filter(col("doc_id") % 13 === 0).count() == 0,
      "benchmark docs must not appear in the report")

    // any training doc whose text equals a benchmark doc's text (and is
    // long enough to have an 8-gram) must be flagged
    val benchTexts = docs.filter(col("doc_id") % 13 === 0).select("text").distinct()
    val copies = docs.filter(col("doc_id") % 13 =!= 0)
      .join(benchTexts, Seq("text"), "left_semi")
      .filter(size(split(trim(col("text")), "\\s+")) >= 8)
      .select("doc_id")
    val flaggedCopies = copies.join(out.filter(col("contaminated") === 1), "doc_id").count()
    assert(flaggedCopies == copies.count(),
      s"only $flaggedCopies of ${copies.count()} exact benchmark copies flagged")
    out.unpersist(); docs.unpersist()
  }

  test("blocklistFilter equals the plain anti-join (bloom adds no error)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val block = docs.filter(col("doc_id") % 17 === 0).select("text")
    val expected = docs.join(block, Seq("text"), "left_anti")
      .select("doc_id", "source").orderBy("doc_id").collect()
    val got = Contamination.blocklistFilter(spark, sfDir).collect()
    assert(got.length == expected.length)
    assert(got.map(_.getLong(0)).sameElements(expected.map(_.getLong(0))))
  }

  test("blocklistFilter drops the blocklisted docs themselves") {
    val out = Contamination.blocklistFilter(spark, sfDir)
    assert(out.filter(col("doc_id") % 17 === 0).count() == 0)
  }

  test("boilerplateReport: exact-duplicate clusters above threshold score ratio 1.0") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Contamination.boilerplateReport(spark, sfDir).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("n_boiler") > col("n_grams")).count() == 0)
    // every member of a text cluster with > 2 copies shares all its grams
    // with > 2 docs → ratio exactly 1.0
    val bigClusters = docs.groupBy("text").agg(count(lit(1)).as("n"))
      .filter(col("n") > 2)
    val members = docs.join(bigClusters.select("text"), Seq("text"), "left_semi")
      .select("doc_id")
    val wrong = members.join(out, "doc_id").filter(col("boiler_ratio") =!= 1.0)
    assert(wrong.count() == 0, "duplicate-cluster members must be pure boilerplate")
    out.unpersist()
  }

  test("boilerplate spans: coverage bounded by tokens and consistent with x42 flags") {
    val spans = Contamination.boilerplateSpans(spark, sfDir).cache()
    assert(spans.filter(col("n_covered") > col("n_tokens")).count() == 0)
    assert(spans.filter(col("covered_ratio") < 0.0 || col("covered_ratio") > 1.0).count() == 0)
    // winnowed-hot implies x42-hot (selected occurrences are a subset of
    // all occurrences, so winnowed df <= full df): every doc with span
    // coverage must carry at least one x42 flag. The converse no longer
    // holds by design — an x42-hot gram may not be SELECTED in a given
    // doc (winnowing keeps ~2/(w+1) of positions; only spans >= w+n-1
    // tokens are guaranteed a shared fingerprint).
    val flags = Contamination.boilerplateReport(spark, sfDir)
      .select(col("doc_id"), col("n_boiler"))
    val covered = spans.join(flags, "doc_id")
      .filter(col("n_covered") > 0 && col("n_boiler") === 0)
    assert(covered.count() == 0, "span coverage without any x42 gram flag")
    spans.unpersist()
  }

  test("boilerplate spans: doc-local interval union equals explode+distinct coverage") {
    // reference formulation over the SAME winnowed gram stream (string
    // gram keys, explode every hot occurrence into 8 position rows,
    // corpus-wide distinct) — the integer set algebra the oracle
    // replays; the shipped plan must count the exact same covered
    // positions
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val grams = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        explode(graft.functions.TextExpressions.winnowedPositional(col("text"), 8, 8)).as("pg"))
      .select(col("doc_id"), col("n_tokens"),
        col("pg.pos").cast("long").as("pos"), col("pg.gram").as("gram"))
    val hot = grams.select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") > 2)
    val oldCovered = grams.join(hot.select("gram"), Seq("gram"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), least(col("pos") + 7, col("n_tokens") - 1))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_covered_old"))
    val mism = Contamination.boilerplateSpans(spark, sfDir)
      .join(oldCovered, Seq("doc_id"), "left")
      .filter(col("n_covered") =!= coalesce(col("n_covered_old"), lit(0L)))
    assert(mism.count() == 0,
      "interval-union coverage must equal the explode+distinct formulation")
  }

  test("fuzzy contamination: a seeded paraphrased leak is caught at jaccard >= 0.5; clean eval docs are not") {
    import spark.implicits._
    // synthetic corpus in the documents-table shape: train doc 1 and a
    // PARAPHRASED eval twin at doc 13 — reworded enough that they share
    // almost no 8-grams (x34's exact pass would miss it) but well over
    // half their 3-gram shingle mass; eval doc 26 is unrelated; eval
    // doc 39 is a VERBATIM copy of train doc 2 (the set-key 1.0 path)
    // six 7-word clauses; the paraphrase REORDERS them (reversed), so
    // no 8 consecutive tokens survive (every 8-gram spans a clause
    // boundary and the boundaries all changed) while ~60% of the
    // 3-gram shingle mass is shared — the paraphrase regime exactly
    val clauses = Seq(
      "the quick brown fox jumps over fences",
      "while the old farmer watches from afar",
      "near the quiet river bank at dusk",
      "as evening light settles on golden fields",
      "and distant church bells ring across valleys",
      "before the cold night wind finally arrives")
    val trainText = clauses.mkString(" ")
    val paraphrased = clauses.reverse.mkString(" ")
    val unrelated = "completely different subject matter entirely about " +
      "submarine navigation sonar arrays and deep ocean pressure hulls " +
      "with titanium alloy welding procedures for extreme depth ratings"
    val verbatim = "benchmark question text that must never appear in the " +
      "training corpus because models memorize answers from pretraining data"
    val docs = Seq(
      (1L, trainText), (2L, verbatim), (3L, "some other training page " +
        "about cooking pasta with garlic and fresh basil leaves"),
      (13L, paraphrased), (26L, unrelated), (39L, verbatim))
      .map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy_spec").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Contamination.fuzzyContamination(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(out.keySet == Set(13L, 26L, 39L), s"one row per eval doc: $out")
    assert(out(13L)._1 >= 0.5 && out(13L)._2 == 1,
      s"paraphrased leak not caught: ${out(13L)}")
    assert(out(39L)._1 == 1.0 && out(39L)._2 == 1,
      s"verbatim leak must score 1.0: ${out(39L)}")
    assert(out(26L)._2 == 0, s"unrelated eval doc flagged: ${out(26L)}")
    // and the x34 exact-8-gram pass indeed misses the paraphrase — the
    // reason this operator exists
    val exact = Contamination.benchmarkContamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(exact.getOrElse(1L, 0) == 0,
      "precondition broken: the paraphrase shares an exact 8-gram with training")
    graft.CacheScope.release()
  }

  test("fuzzy contamination on the corpus: bounded, consistent with verbatim text dups") {
    import org.apache.spark.sql.functions._
    val out = Contamination.fuzzyContamination(spark, sfDir).cache()
    assert(out.filter(col("max_jaccard") < 0.0 || col("max_jaccard") > 1.0).count() == 0)
    assert(out.filter((col("leaked") === 1) =!= (col("max_jaccard") >= 0.5)).count() == 0)
    // one row per eval doc
    assert(out.count() == graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 13 === 0).count())
    // an eval doc whose exact TEXT also appears in training must leak at 1.0
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val trainTexts = docs.filter(col("doc_id") % 13 =!= 0).select("text").distinct()
    val verbatims = docs.filter(col("doc_id") % 13 === 0)
      .join(trainTexts, Seq("text"), "left_semi").select("doc_id")
    val missed = verbatims.join(out.filter(col("max_jaccard") === 1.0), Seq("doc_id"), "left_anti")
    assert(missed.count() == 0, "a verbatim eval copy did not score 1.0")
    out.unpersist()
    graft.CacheScope.release()
  }

  test("split leakage: bounded by the test split, and exact dups always leak") {
    val r = Contamination.splitLeakage(spark, sfDir).collect()(0)
    val (nTest, nLeaked) =
      (r.getAs[Long]("n_test_docs"), r.getAs[Long]("n_leaked_docs"))
    assert(nLeaked <= nTest, "more leaked docs than test docs")
    // any test doc whose exact text also appears in the train split
    // must be counted as leaked (it shares every 8-gram)
    val h = Sampling.u32(col("doc_id"))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), h.as("h"))
    val trainTexts = docs.filter(col("h") < 3865470566L).select("text").distinct()
    val dupTestDocs = docs.filter(col("h") >= 4080218931L)
      .join(trainTexts, Seq("text"), "left_semi").count()
    assert(nLeaked >= dupTestDocs,
      s"$dupTestDocs exact-dup test docs but only $nLeaked leaked")
  }
}
