package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")
  }

  test("tokenCount splits on runs of whitespace, trims edges") {
    assert(one[Int](tokenCount(col("text")), "the quick  brown\tfox ") == 4)
    assert(one[Int](tokenCount(col("text")), "one") == 1)
  }

  test("bpeTokenCount counts letter runs, digit runs, single punct") {
    // "ab12, cd" -> [ab][12][,][cd]
    assert(one[Int](bpeTokenCount(col("text")), "ab12, cd") == 4)
  }

  test("wordShingles builds distinct n-grams") {
    val sh = one[scala.collection.Seq[String]](wordShingles(col("text"), 2), "a b c a b")
    assert(sh.toSet == Set("a b", "b c", "c a"))
  }

  test("wordShingles on short doc yields the whole doc") {
    val sh = one[scala.collection.Seq[String]](wordShingles(col("text"), 3), "a b")
    assert(sh == Seq("a b"))
  }

  test("stopwordRatio is fraction of lang stopwords") {
    val r = one[Double](stopwordRatio(col("text"), "en"), "the cat and the dog")
    assert(math.abs(r - 3.0 / 5.0) < 1e-12)
  }

  test("langId picks the language with highest stopword density") {
    assert(one[String](langId(col("text")), "the cat is on the mat and it is happy") == "en")
    assert(one[String](langId(col("text")), "der hund ist nicht mit der katze") == "de")
    assert(one[String](langId(col("text")), "el perro es un animal que no es gato") == "es")
  }

  test("punctRatio counts only punctuation chars") {
    assert(math.abs(one[Double](punctRatio(col("text")), "ab, cd.") - 2.0 / 7.0) < 1e-12)
  }

  test("avgTokenLen is non-whitespace chars over tokens") {
    assert(math.abs(one[Double](avgTokenLen(col("text")), "ab cdef") - 3.0) < 1e-12)
  }

  test("qualityScore is bounded in [0, 100]") {
    for (t <- Seq("", "x", "the " * 200, "!!!???...", "a b c d e f g"))
      if (t.nonEmpty) {
        val q = one[Double](qualityScore(col("text")), t)
        assert(q >= 0.0 && q <= 100.0, s"score $q out of range for '$t'")
      }
  }

  test("fingerprintSketch is the k smallest shingle hashes, deterministic") {
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val a = one[scala.collection.Seq[Long]](fingerprintSketch(col("text"), 3), text)
    val b = one[scala.collection.Seq[Long]](fingerprintSketch(col("text"), 3), text)
    assert(a == b && a.size == 3 && a == a.sorted)
  }

  test("piiRedaction counts and shrinks only the augmented docs") {
    val out = graft.ext.TextAnalysis.piiRedaction(spark, sfDir).cache()
    val aug = out.filter(col("doc_id") % 7 === 0)
    assert(aug.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0,
      "every augmented doc has exactly one email and one phone")
    assert(aug.filter(col("len_redacted") >= col("len_raw")).count() == 0,
      "redaction must shrink augmented docs (sentinels are shorter)")
    val plain = out.filter(col("doc_id") % 7 =!= 0)
    assert(plain.filter(col("n_emails") =!= 0 || col("n_phones") =!= 0
      || col("len_redacted") =!= col("len_raw")).count() == 0,
      "unaugmented word-soup docs contain no PII shapes")
    out.unpersist()
  }

  test("repetition ratios: hand-checked values and corpus invariants") {
    // "a b a a" → 4 tokens, 2 distinct → dup 0.5; top token 'a' ×3 → 0.75
    assert(math.abs(one[Double](dupTokenRatio(col("text")), "a b a a") - 0.5) < 1e-12)
    assert(math.abs(one[Double](topTokenRatio(col("text")), "a b a a") - 0.75) < 1e-12)
    assert(one[Double](dupTokenRatio(col("text")), "x y z") == 0.0)
    assert(math.abs(one[Double](topTokenRatio(col("text")), "x y z") - 1.0 / 3) < 1e-12)
    assert(one[Double](topTokenRatio(col("text")), "solo") == 1.0)

    val out = graft.ext.TextAnalysis.repetitionStats(spark, sfDir).cache()
    assert(out.filter(col("dup_token_ratio") < 0 || col("dup_token_ratio") >= 1).count() == 0)
    assert(out.filter(col("top_token_ratio") <= 0 || col("top_token_ratio") > 1).count() == 0)
    // some token repeats iff the top token repeats
    assert(out.filter((col("dup_token_ratio") > 0) =!=
      (col("top_token_ratio") > lit(1.0) / col("n_tokens"))).count() == 0)
    out.unpersist()
  }
}
