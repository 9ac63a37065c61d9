package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed top-k per key as an ALGEBRAIC aggregate.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) shuffles EVERY row to its key's reducer and sorts the
  * whole partition — at 100 TB that is the full fact table through the
  * wire for a 10-row-per-key answer. This Aggregator keeps a bounded
  * k-heap per key, so map-side partial aggregation reduces each input
  * partition to ≤ k rows per key before the shuffle; the exchange
  * carries O(keys × k), not O(rows).
  *
  * Ordering: descending by a double sort key with an ascending long
  * tiebreak — a TOTAL order, so results are deterministic and equal to
  * the window formulation (TopKSpec proves it).
  */
object TopKAgg {

  /** (sortKey desc, tiebreak asc, opaque payload). Tiebreak is a
    * string for generality (tokens, names); numeric callers pass a
    * zero-padded rendering (format_string("%019d", id)) to keep
    * lexicographic == numeric order. */
  case class Entry(sortKey: Double, tiebreak: String, payload: String)

  private def better(a: Entry, b: Entry): Boolean =
    a.sortKey > b.sortKey || (a.sortKey == b.sortKey && a.tiebreak < b.tiebreak)

  class TopK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil

    // buffer kept sorted best-first, length ≤ k (k is small; insertion
    // into a ≤10-element list beats heap constant factors)
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      if (buf.lengthCompare(k) >= 0 && !better(e, buf.last)) buf
      else {
        val (pre, post) = buf.span(b => better(b, e))
        (pre ::: e :: post).take(k)
      }
    }

    override def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[Entry]): Seq[Entry] = buf

    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per key group. `sortKey` descending, `tiebreak`
    * ascending; `payload` columns are carried through as a JSON blob
    * and re-exposed as `rank` + the original columns' JSON. For typed
    * pipelines use the Aggregator directly with Dataset.groupByKey. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], sortKey: Column,
                 tiebreak: Column, k: Int): DataFrame = {
    val payload = to_json(struct(df.columns.map(col).toSeq: _*))
    val agg = udaf(new TopK(k))
      .apply(sortKey.cast("double"), tiebreak.cast("string"), payload)
      .as("__top")
    df.groupBy(keyCols.map(col): _*)
      .agg(agg)
      .select(keyCols.map(col) :+ posexplode(col("__top")).as(Seq("__i", "__e")): _*)
      .withColumn("rank", (col("__i") + 1).cast("long"))
      .withColumn("entry_json", col("__e.payload"))
      .drop("__i", "__e")
  }
}
