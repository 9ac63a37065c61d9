package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL function surface needs its own session (extensions bind at
  * build time), so this spec does not share the SparkSpec singleton. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("graft_dot and graft_cosine are callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_shingle_hashes and graft_minhash compose in SQL") {
    val r = spark.sql(
      "SELECT size(graft_minhash(graft_shingle_hashes('a b c d e', 2), 16)) AS k").collect()(0)
    assert(r.getInt(0) == 16)
  }

  test("graft_lang_id from SQL") {
    val r = spark.sql("SELECT graft_lang_id('the cat is on the mat') AS l").collect()(0)
    assert(r.getString(0) == "en")
  }
}
