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
