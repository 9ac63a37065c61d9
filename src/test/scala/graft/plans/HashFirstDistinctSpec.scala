package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The optimizer rewrite's conf gate (round-9 ADVICE): default ON, a
  * session `SET spark.graft.hashFirstDistinct.enabled=false` opts out
  * of the probabilistic rewrite without dropping the extension — and
  * both forms return the same count. */
class HashFirstDistinctSpec extends SparkSpec {

  private def distinctPlan(): String = {
    val df = spark.range(50).toDF("id")
      .select(concat(lit("doc-"), col("id") % 7).as("s"))
      .agg(count_distinct(col("s")).as("n"))
    assert(df.collect()(0).getLong(0) == 7L)
    df.queryExecution.optimizedPlan.toString
  }

  test("rule rewrites COUNT(DISTINCT string) by default and honors the opt-out") {
    assert(spark.conf.getOption(HashFirstDistinctRule.EnabledKey).isEmpty)
    assert(distinctPlan().contains("xxhash64"),
      "default-on: the distinct key must be the 24-byte hash pair")
    spark.conf.set(HashFirstDistinctRule.EnabledKey, "false")
    try
      assert(!distinctPlan().contains("xxhash64"),
        "opt-out session must keep the raw string distinct")
    finally spark.conf.unset(HashFirstDistinctRule.EnabledKey)
    assert(distinctPlan().contains("xxhash64"), "unset must restore the default")
  }
}
