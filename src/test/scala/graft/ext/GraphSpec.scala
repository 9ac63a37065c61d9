package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for x143 fixed-point PageRank: the exact integer damped
  * update on a hand graph (every division/truncation replayed by
  * hand), plus structural invariants of the supply-chain query. */
class GraphSpec extends SparkSpec {

  test("pageRank: exact fixed-point values on a symmetric star") {
    // star: center 0 — leaves 1,2,3 (symmetrized). By hand, ppm:
    //   it1: center 150000+(3·1000000·85)//100       = 2700000
    //        leaf   150000+((1000000//3)·85)//100    = 433333
    //   it2: center 150000+(3·433333·85)//100        = 1254999
    //        leaf   150000+((2700000//3)·85)//100    = 915000
    //   it3: center 150000+(3·915000·85)//100        = 2483250
    //        leaf   150000+((1254999//3)·85)//100    = 505583
    import spark.implicits._
    val edges = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 0L, 2L -> 0L,
      3L -> 0L).toDF("src", "dst")
    val r = Graph.pageRank(edges, 3).collect()
      .map(x => x.getAs[Long]("node_id") -> x.getAs[Long]("rank_ppm")).toMap
    graft.CacheScope.release()
    assert(r == Map(0L -> 2483250L, 1L -> 505583L, 2L -> 505583L,
      3L -> 505583L))
  }

  test("pageRank: uniform rank on a regular graph (4-cycle)") {
    // every node of a regular graph has identical mass flow, so ranks
    // stay equal: 1 it → 150000+(1000000·85)//100 = 1000000 (fixed
    // point of the unit start on any regular graph)
    import spark.implicits._
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 0L, 1L -> 0L,
      2L -> 1L, 3L -> 2L, 0L -> 3L).toDF("src", "dst")
    val r = Graph.pageRank(edges, 3).collect()
    graft.CacheScope.release()
    assert(r.length == 4)
    assert(r.forall(_.getAs[Long]("rank_ppm") == 1000000L))
  }

  test("x143 invariants: 20 rows, contiguous ranks, parity-coded kinds") {
    val out = Graph.supplyRank(spark, sfDir).collect()
    graft.CacheScope.release()
    assert(out.length == 20)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val ppm = out.map(_.getAs[Long]("rank_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a >= b })
    // every rank carries at least the teleport mass
    assert(ppm.forall(_ >= 150000L))
    out.foreach { row =>
      val n = row.getAs[Long]("node_id")
      val kind = row.getAs[String]("kind")
      assert(kind == (if (n % 2 == 0) "customer" else "supplier"))
      assert(row.getAs[Long]("entity_id") == n / 2)
    }
  }
}
