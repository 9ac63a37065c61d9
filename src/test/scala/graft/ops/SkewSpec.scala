package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that stalls a reducer
  private def skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  private def dim = (0L to 99L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "id", "v", "name").orderBy("id").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8)
      .select("k", "id", "v", "name").orderBy("id").collect()
    assert(salted.sameElements(plain))
  }

  test("twoPhaseAgg equals the direct groupBy for algebraic aggregates") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.twoPhaseAgg(skewed, "k", salt = 8)(
        Seq(count(lit(1)).as("n"), sum("v").as("s")),
        Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getLong(0) == s.getLong(0))
      assert(d.getLong(1) == s.getLong(1))
      assert(math.abs(d.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("salting actually spreads the hot key across partitions") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(8)))
    val spread = salted.filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 salt buckets")
  }
}
