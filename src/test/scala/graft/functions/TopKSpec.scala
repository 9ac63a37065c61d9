package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  import spark.implicits._

  private val df = (1 to 5000).map { i =>
    (s"g${i % 23}", i.toLong, (i * 37 % 101) * 1.5)
  }.toDF("g", "id", "score").repartition(8)

  test("TopKAgg equals the window row_number formulation") {
    val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("g"), col("rank"), col("id"))
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val viaAgg = TopKAgg.topKPerKey(df, Seq("g"), col("score"),
        format_string("%019d", col("id")), 3)
      .withColumn("id", get_json_object(col("entry_json"), "$.id").cast("long"))
      .select(col("g"), col("rank"), col("id"))
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(viaAgg.sameElements(viaWindow))
  }

  test("ties break deterministically by the ascending tiebreak") {
    val tied = Seq(("a", 1L, 5.0), ("a", 3L, 5.0), ("a", 2L, 5.0)).toDF("g", "id", "score")
    val out = TopKAgg.topKPerKey(tied, Seq("g"), col("score"),
        format_string("%019d", col("id")), 2)
      .withColumn("id", get_json_object(col("entry_json"), "$.id").cast("long"))
      .orderBy("rank").collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("aggregation is partial (map-side) — the shuffle carries <= k per key per partition") {
    val plan = TopKAgg.topKPerKey(df, Seq("g"), col("score"),
        format_string("%019d", col("id")), 3)
      .queryExecution.executedPlan.toString
    // two aggregate stages around the exchange = partial + final
    val aggStages = "Aggregate".r.findAllIn(plan).size
    assert(aggStages >= 2, s"no partial aggregation:\n$plan")
    assert(plan.contains("partial"), s"no partial stage:\n$plan")
  }
}
