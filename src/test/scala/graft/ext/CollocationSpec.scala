package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the tokenizer-training / collocation operators: x136 BPE
  * merge rules and x137 PMI lift. Both hash-match their DuckDB oracles;
  * these pin the algorithmic semantics (exact merges on a hand-built
  * corpus, the lift formula recomputed from independent totals) that a
  * refactor could break while still emitting SOME oracle-shaped frame. */
class CollocationSpec extends SparkSpec {

  private def corpusDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_colloc_").toString
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x136: exact merge sequence on a hand-built corpus") {
    // words: ab x3, cd x1. Pairs round 1: (a,b)=3, (b,</w>)=3, (c,d)=1,
    // (d,</w>)=1 — count tie broken pair-asc → (a,b). Round 2 the merged
    // symbol pairs with the end marker: (ab,</w>)=3. Round 3 only cd's
    // pairs remain: (c,d)=1 wins over (d,</w>)=1 pair-asc.
    val dir = corpusDir(Seq("ab ab ab cd"))
    val rows = TextAnalysis.bpeMerges(spark, dir).orderBy("iter").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq ==
      Seq((1L, "a", "b", 3L), (2L, "ab", "</w>", 3L), (3L, "c", "d", 1L)))
  }

  test("x136: merges exhaust gracefully when the vocab fully fuses") {
    // single word "ab": round 1 (a,b)=2? no — (a,b)=1... wc=2 for two
    // occurrences. Round 1 (a,b)=2, round 2 (ab,</w>)=2, round 3 no
    // pairs left → 2 rows, not a throw.
    val dir = corpusDir(Seq("ab ab"))
    val rows = TextAnalysis.bpeMerges(spark, dir).orderBy("iter").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("x136: best-pair counts are monotone non-increasing across iterations") {
    // a merge can only create pairs whose count is bounded by the merged
    // pair's count, and can only shrink existing ones
    val rows = TextAnalysis.bpeMerges(spark, sfDir).orderBy("iter").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("pair_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts increased across merges: ${counts.mkString(",")}")
    assert(rows.forall(r => r.getAs[String]("left_sym").nonEmpty &&
      r.getAs[String]("right_sym").nonEmpty))
  }

  test("x136 precondition: fixture corpus is ASCII (char split == byte split)") {
    // the (.) char-split walks UTF-16 code units; the oracle's walks
    // codepoints — identical only when the corpus is single-byte. Same
    // precondition the media family asserts.
    val nonAscii = graft.Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0, "fixture documents must be ASCII for x136")
  }

  test("x137: lift replays from independently-computed totals") {
    val out = TextAnalysis.pmiCollocations(spark, sfDir).cache()
    graft.CacheScope.release()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val toks = docs.select(explode(split(lower(trim(col("text"))), "\\s+"))
      .as("w")).filter(length(col("w")) > 0)
    val nTok = toks.count()
    val nBi = docs.select(
        (greatest(size(split(lower(trim(col("text"))), "\\s+")) - 1, lit(0)))
          .as("nb"))
      .agg(sum("nb")).collect()(0).getLong(0)
    val bad = out.collect().filter { r =>
      val lift = (r.getAs[Long]("c12").toDouble * nTok * nTok) /
        (nBi.toDouble * r.getAs[Long]("cu1") * r.getAs[Long]("cu2"))
      lift != r.getAs[Double]("lift")
    }
    assert(bad.isEmpty, s"${bad.length} rows disagree with the recomputed lift")
    out.unpersist()
  }

  test("x137: count floor, top-50 cap, descending deterministic order") {
    val rows = TextAnalysis.pmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_.getAs[Long]("c12") >= 5))
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "lift not sorted descending")
    assert(lifts.forall(_ > 0.0))
  }

  test("x138: exact per-source compression on the hand-built corpus") {
    // merges (a,b),(ab,</w>),(c,d) applied back to vocab {ab:3, cd:1}:
    // "ab" fully fuses (3 symbols -> 1), "cd" keeps its end marker
    // (3 -> 2); weighted: before 3*3+1*3=12, after 3*1+1*2=5
    val dir = corpusDir(Seq("ab ab ab cd"))
    val rows = TextAnalysis.bpeEncodeAudit(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("distinct_words") == 2L)
    assert(r.getAs[Long]("token_occurrences") == 4L)
    assert(r.getAs[Long]("syms_before") == 12L)
    assert(r.getAs[Long]("syms_after") == 5L)
    assert(r.getAs[Long]("compression_permille") == 5000L / 12L)
  }

  test("x138: a corpus that exhausts before 3 merges still encodes (sentinel identity)") {
    // "ab ab" trains only 2 merges; the 3rd rule is the never-matching
    // sentinel, so application must be identity, not an emptied frame
    val dir = corpusDir(Seq("ab ab"))
    val rows = TextAnalysis.bpeEncodeAudit(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("syms_before") == 6L)
    assert(rows(0).getAs[Long]("syms_after") == 2L)
  }

  test("x138: encoding never expands and bounds hold corpus-wide") {
    val out = TextAnalysis.bpeEncodeAudit(spark, sfDir).cache()
    graft.CacheScope.release()
    assert(out.filter(col("syms_after") > col("syms_before")).count() == 0,
      "a merge can only shrink the symbol stream")
    assert(out.filter(col("compression_permille") > 1000 ||
      col("compression_permille") <= 0).count() == 0)
    val nSources = graft.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(out.count() == nSources, "one audit row per source")
    out.unpersist()
  }

  test("x137: hand-built phrase corpus ranks the dominant collocation first") {
    // "new york" x6 and "york new" x5 (the wrap bigrams of the repeated
    // phrase); N=12 tokens, N_bi=11, cu(new)=cu(york)=6
    val dir = corpusDir(Seq(("new york " * 6).trim))
    val rows = TextAnalysis.pmiCollocations(spark, dir).collect()
    assert(rows.length == 2)
    assert((rows(0).getString(0), rows(0).getString(1)) == ("new", "york"))
    assert(rows(0).getAs[Long]("c12") == 6L)
    assert(rows(0).getAs[Double]("lift") == 6.0 * 12 * 12 / (11.0 * 6 * 6))
    assert(rows(1).getAs[Double]("lift") == 5.0 * 12 * 12 / (11.0 * 6 * 6))
  }
}
