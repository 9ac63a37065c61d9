package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffled storage so repeated joins/aggs on the
  * bucket key run with NO exchange — the co-located-join strategy for
  * fact-fact joins a 100 TB pipeline does daily (SURVEY §4: the Spark
  * analog of the reference's secondary indexes). */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of two bucketed tables runs without a shuffle exchange") {
    val left = (1L to 1000L).map(i => (i % 50, i, i * 2.0)).toDF("k", "id", "v")
    val right = (1L to 500L).map(i => (i % 50, s"name_$i")).toDF("k", "name")

    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketing_spec_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketing_spec_right")

    val joined = spark.table("bucketing_spec_left")
      .join(spark.table("bucketing_spec_right"), "k")
    // disable broadcast so the join would NEED a shuffle if buckets
    // weren't aligned
    val plan = withNoBroadcast {
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // and the result is correct
    val n = joined.count()
    val expected = left.join(right, "k").count()
    assert(n == expected)
  }

  test("groupBy on the bucket key avoids the aggregation exchange") {
    val agg = spark.table("bucketing_spec_left").groupBy("k").agg(sum("v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
