package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("morton16 interleaves exactly: de-interleaving recovers both keys") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
      .withColumn("z", ZOrder.morton16(col("a"), col("b")))
    // de-interleave in Scala and compare
    df.collect().foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var ra = 0L; var rb = 0L
      (0 until 16).foreach { i =>
        ra |= ((z >>> (2 * i)) & 1L) << i
        rb |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      assert(ra == (a & 0xffffL) && rb == (b & 0xffffL),
        s"morton16($a, $b) = $z de-interleaves to ($ra, $rb)")
    }
  }

  test("every z-bucket bounds BOTH key spans (the property a 1-key sort lacks)") {
    val out = ZOrder.zorderAudit(spark, sfDir).cache()
    // 64-way z-split pins the top 3 bits of each 16-bit key per bucket
    val maxSpan = 1L << 13
    val bad = out.filter(
      (col("max_ko") - col("min_ko") >= maxSpan) ||
      (col("max_kp") - col("min_kp") >= maxSpan))
    assert(bad.count() == 0, "a z-bucket exceeded the dual span bound")
    // buckets partition the table, and scaling spreads rows over many
    // buckets (the raw-key form collapsed everything into 2)
    val total = out.agg(sum("n_rows")).collect()(0).getLong(0)
    assert(total == graft.Tables.load(spark, sfDir, "lineitem").count())
    assert(out.count() >= 32, s"only ${out.count()} z-buckets used of 64")
    out.unpersist()
  }
}
