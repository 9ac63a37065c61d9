package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling (reference DataQualityChecker, main.py:50-76)
  * as ONE Spark job: row count, per-column null counts, and duplicate
  * rows come out of a single aggregate pass (the reference makes three
  * pandas passes); the score is pure driver arithmetic on the result.
  */
object Quality {

  /** The per-table profile the reference logs per load (main.py:57-66). */
  case class Profile(
      totalRows: Long,
      totalColumns: Int,
      nullCounts: Map[String, Long],
      duplicateRows: Long) {

    /** Quality score (main.py:68-74):
      * max(0, (cells − missing − dup_rows×ncols) / cells × 100), 2dp.
      * Reference divides by zero on an empty frame; we define 0.0. */
    def score: Double = {
      val cells = totalRows * totalColumns.toLong
      if (cells == 0L) 0.0
      else {
        val missing = nullCounts.values.sum
        val raw = (cells - missing - duplicateRows * totalColumns).toDouble / cells * 100.0
        math.max(0.0, math.rint(raw * 100) / 100)
      }
    }
  }

  /** One-pass profile: count(*), per-column null sums and
    * count_distinct(all columns) in a single hash aggregate. At scale
    * this is a scan + one partial-agg exchange of a single row. */
  def profile(df: DataFrame): Profile = {
    val cols = df.columns.toSeq
    if (df.isEmpty) return Profile(0L, cols.size, cols.map(_ -> 0L).toMap, 0L)
    val aggs =
      Seq(count_distinct(struct(cols.map(col): _*)).as("__distinct")) ++
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*).collect()(0)
    val rows = row.getAs[Long]("__rows")
    Profile(
      totalRows = rows,
      totalColumns = cols.size,
      nullCounts = cols.map(c => c -> row.getAs[Long](s"__nulls_$c")).toMap,
      duplicateRows = rows - row.getAs[Long]("__distinct"))
  }
}
