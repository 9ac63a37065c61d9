package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDedupSpec extends SparkSpec {

  test("HLL++ distinct counts stay within 5% of exact per source") {
    val approx = Dedup.approxDedupStats(spark, sfDir)
    val exact = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count_distinct(col("text")).as("exact_distinct"))
    val joined = approx.join(exact, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_distinct_texts").toDouble
      val e = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"source ${r.getAs[String]("source")}: approx $a vs exact $e")
    }
  }
}
