package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-column data-skipping — the
  * standard answer to "my scans filter on l_orderkey OR l_partkey, but
  * a sort can only cluster one of them". Interleaving the bits of both
  * keys gives a 1-D sort order in which ANY contiguous range bounds
  * BOTH key ranges: every file in a z-sorted layout carries tight
  * min/max stats on every interleaved column, so either predicate
  * skips files. (Same idea the public lakehouse engines expose as
  * `OPTIMIZE ... ZORDER BY`; here it is plain integer arithmetic over
  * Spark columns.)
  *
  * At 100 TB this composes with `Sources.writeSortedByKey`: sort by
  * [[morton16]] instead of a single key before the partitioned write,
  * and the parquet row-group stats do the skipping — no index
  * structure, no service, just layout.
  */
object ZOrder {

  /** 32-bit Morton key: the low 16 bits of `a` and `b`, bit-interleaved
    * (a on even positions, b on odd). A static 32-term shift/mask
    * expression tree — whole-stage codegen folds it into straight-line
    * long arithmetic, and the identical expression is spellable in any
    * SQL engine (the oracle interpolates the same terms). */
  def morton16(a: Column, b: Column): Column = {
    val am = a.bitwiseAND(lit(0xffffL))
    val bm = b.bitwiseAND(lit(0xffffL))
    (0 until 16).map { i =>
      (shiftrightunsigned(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftrightunsigned(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same 32-term Morton expression as SQL text (for oracles). */
  def morton16Sql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)}) + ((($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Driver-checked query: bucket lineitem into 64 z-ranges of the
    * (l_orderkey, l_partkey) Morton key and report each bucket's
    * row count and per-key min/max spans. Keys are first scaled into
    * the full 16-bit domain with integer arithmetic (`k·2^16 div
    * (max+1)` — raw TPC-H keys leave the high Morton bits constant and
    * everything lands in a couple of buckets), exactly what a real
    * z-order writer does with its column value ranges. The point the
    * output PROVES: every bucket bounds BOTH scaled keys (span < 2^13
    * each, since a 64-way z-split pins the top 3 bits of each 16-bit
    * key) — a single-key sort bounds one and leaves the other
    * unconstrained. One aggregate over a scan; the z-key itself is
    * scan-speed long arithmetic. */
  def zorderAudit(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val m = li.agg(max("l_orderkey").as("mo"), max("l_partkey").as("mp"))
    li.crossJoin(broadcast(m))
      .select(expr("l_orderkey * 65536 div (mo + 1)").as("ko"),
              expr("l_partkey * 65536 div (mp + 1)").as("kp"))
      .select(shiftrightunsigned(morton16(col("ko"), col("kp")), 26).as("z_bucket"),
              col("ko"), col("kp"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n_rows"),
           min("ko").as("min_ko"), max("ko").as("max_ko"),
           min("kp").as("min_kp"), max("kp").as("max_kp"))
      .orderBy("z_bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x77_zorder_layout" -> zorderAudit)

  val oracles: Map[String, String] = Map(
    "x77_zorder_layout" -> s"""
      WITH m AS (SELECT MAX(l_orderkey) AS mo, MAX(l_partkey) AS mp FROM lineitem),
      sc AS (SELECT l_orderkey * 65536 // (mo + 1) AS ko,
                    l_partkey * 65536 // (mp + 1) AS kp
             FROM lineitem CROSS JOIN m),
      z AS (SELECT ${morton16Sql("ko", "kp")} >> 26 AS z_bucket, ko, kp FROM sc)
      SELECT z_bucket, COUNT(*) AS n_rows,
        MIN(ko) AS min_ko, MAX(ko) AS max_ko,
        MIN(kp) AS min_kp, MAX(kp) AS max_kp
      FROM z GROUP BY 1 ORDER BY 1""")
}
