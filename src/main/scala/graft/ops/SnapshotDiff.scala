package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Keyed snapshot diff — change-data-capture between two immutable
  * snapshots of the same table: which rows were added, which deleted,
  * which updated. The incremental-recompute primitive of a recurring
  * corpus build (yesterday's crawl vs today's): downstream stages
  * (dedup, filtering, packing) rerun only on the delta instead of the
  * full 100 TB. No reference analog — the reference reloads everything
  * and its only "incremental load" is an unimplemented suggestion string
  * (main.py:936-948).
  *
  * Scale notes: one full-outer sort-merge join on the key — both sides
  * shuffle once on the same key, so co-partitioned (bucketed) snapshots
  * join exchange-free. Change detection compares a 64-bit content hash,
  * not the payload (the driver query compares the text itself so DuckDB
  * can verify row-for-row; at 100 TB pass `contentCols = xxhash64(...)`
  * projections instead — same plan, 8-byte compare).
  */
object SnapshotDiff {

  /** Diff `current` against `previous` on `key`: one row per changed key
    * with change ∈ added | deleted | updated. `contentCols` define row
    * identity for the update check (key columns excluded). */
  def diff(previous: DataFrame, current: DataFrame,
           key: String, contentCols: Seq[String]): DataFrame = {
    // presence flags rather than null-checking a content column: a row
    // whose content is legitimately NULL must still count as present
    val prev = previous.select((key +: contentCols).map(col): _*)
      .withColumnRenamed(key, "__k").withColumn("__p", lit(1))
    val cur = current.select((key +: contentCols).map(col): _*)
      .withColumnRenamed(key, "__k").withColumn("__c", lit(1))
    val joined = prev.alias("p").join(cur.alias("c"), Seq("__k"), "full_outer")
    val changed = contentCols
      .map(c => !(col("p." + c) <=> col("c." + c)))
      .reduce(_ || _)
    joined.select(col("__k").as(key),
        when(col("__p").isNull, lit("added"))
          .when(col("__c").isNull, lit("deleted"))
          .when(changed, lit("updated"))
          .otherwise(lit(null)).as("change"))
      .filter(col("change").isNotNull)
  }

  /** Driver query: diff two simulated crawl snapshots of `documents`.
    * Yesterday's snapshot misses every 5th document (those become
    * `added`); today's drops every 41st (`deleted`) and rewrites the
    * text of every 31st (`updated`). Deterministic, so DuckDB rebuilds
    * the same two snapshots and verifies the exact change set. */
  def snapshotDiffQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val prev = docs.filter(col("doc_id") % 5 =!= 0)
    val cur = docs.filter(col("doc_id") % 41 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 31 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    diff(prev, cur, "doc_id", Seq("text", "source"))
      .orderBy("doc_id")
  }

  /** Incremental aggregate maintenance: refresh a standing monthly
    * revenue rollup with a new order batch WITHOUT recomputing from
    * scratch — aggregate the delta alone, then MERGE partials
    * (sum-of-sums, count-of-counts; the algebraic-merge property every
    * incremental/materialized-view pipeline rests on). The corpus
    * split is a deterministic stand-in (order keys ending in 0 = the
    * newly arrived batch). Revenue rides integer cents so the merged
    * total is bit-equal to a from-scratch aggregate in any engine —
    * and the ORACLE IS the from-scratch aggregate, so the maintenance
    * identity merge(agg(old), agg(delta)) = agg(all) is hash-checked,
    * not assumed. At 100 TB the standing side is a stored partial
    * (months × 2 longs), and a refresh touches only the delta. */
  def incrementalAggQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("month")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
    val standing = partial(orders.filter(col("o_orderkey") % 10 =!= 0))
    val delta = partial(orders.filter(col("o_orderkey") % 10 === 0))
    standing.unionByName(delta)
      .groupBy("month")
      .agg(sum("n_orders").as("n_orders"), sum("rev_cents").as("rev_cents"))
      .orderBy("month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x83_incremental_agg" -> incrementalAggQuery,
    "x36_snapshot_diff" -> snapshotDiffQuery)

  val oracles: Map[String, String] = Map(
    "x83_incremental_agg" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY 1 ORDER BY 1""",
    "x36_snapshot_diff" -> """
      WITH prev AS (SELECT doc_id, text, source FROM documents WHERE doc_id % 5 <> 0),
      cur AS (SELECT doc_id,
          CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END AS text,
          source FROM documents WHERE doc_id % 41 <> 0)
      SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
        CASE WHEN p.doc_id IS NULL THEN 'added'
             WHEN c.doc_id IS NULL THEN 'deleted'
             WHEN p.text IS DISTINCT FROM c.text
               OR p.source IS DISTINCT FROM c.source THEN 'updated'
             END AS change
      FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
      WHERE (p.doc_id IS NULL OR c.doc_id IS NULL
             OR p.text IS DISTINCT FROM c.text
             OR p.source IS DISTINCT FROM c.source)
      ORDER BY doc_id""")
}
