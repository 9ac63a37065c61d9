package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.{Failure, Success, Try}

/** E→T→L orchestration (reference AdvancedETLPipeline.run_full_pipeline,
  * main.py:556-609): FK-ordered per-table loop, per-table failure
  * isolation, load metadata audit, and the post-load customer-totals
  * refresh (J2). Stateless over SparkSession — all state is the output
  * directory's parquet tables.
  */
object Pipeline {

  /** Pipeline metrics (reference main.py:230-235). */
  case class Metrics(
      tablesProcessed: Int,
      tablesFailed: Int,
      totalRecords: Long,
      qualityScores: Map[String, Double],
      durationsSec: Map[String, Double])

  /** The FK-respecting load order (main.py:570-575). */
  val loadOrder: Seq[String] = Seq("customers", "products", "orders", "order_items")

  /** Run the full pipeline: for each (csvPath, table) extract → transform
    * → profile → load (parquet + metadata row). A table failure is
    * recorded and the loop continues (main.py:589-596). */
  def run(spark: SparkSession, inputs: Seq[(String, String)], outDir: String): Metrics = {
    var failed = 0
    var total = 0L
    val scores = scala.collection.mutable.Map[String, Double]()
    val durations = scala.collection.mutable.Map[String, Double]()

    inputs.foreach { case (path, table) =>
      val t0 = System.nanoTime()
      Try {
        val raw = Sources.readCsv(spark, path, table)          // E (main.py:581)
        val transformed = Transforms(table, raw)               // T (main.py:584)
        val profile = Quality.profile(transformed)             // quality gate (main.py:512)
        val n = profile.totalRows
        Sources.appendTable(transformed, outDir, table)        // L (main.py:516-530)
        val secs = (System.nanoTime() - t0) / 1e9
        Sources.appendMetadata(spark, outDir, Sources.LoadMeta(
          table, path, n, n, 0L, secs, profile.score,
          Sources.checksum(transformed)))                      // audit (main.py:532-551)
        (n, profile.score, secs)
      } match {
        case Success((n, score, secs)) =>
          total += n; scores(table) = score; durations(table) = secs
        case Failure(e) =>
          failed += 1
          System.err.println(s"[pipeline] $table failed: ${e.getMessage}")
      }
    }

    // Post-load derived update (main.py:598-599 → 612-628).
    if (durations.contains("customers") && durations.contains("orders"))
      updateCustomerTotals(spark, outDir)

    Metrics(inputs.size - failed, failed, total, scores.toMap, durations.toMap)
  }

  /** J2/L3 (main.py:612-628): decorrelated customer-lifetime refresh —
    * completed-order aggregates left-joined back onto customers; absent
    * customers get (0, 0.0) exactly like COUNT/COALESCE(SUM,0) over an
    * empty correlated set. Snapshot-overwrites the customers table. */
  def updateCustomerTotals(spark: SparkSession, dir: String): Unit = {
    val cust = Sources.readTable(spark, dir, "customers")
      .drop("total_orders", "total_spent")
    val aggs = Sources.readTable(spark, dir, "orders")
      .filter(col("order_status") === "Completed")
      .groupBy("customer_id")
      .agg(count("order_id").as("total_orders"), sum("total_amount").as("total_spent"))
    val updated = cust.join(aggs, Seq("customer_id"), "left")
      .na.fill(Map("total_orders" -> 0L, "total_spent" -> 0.0))
    // parquet append/overwrite on the same path within one plan is
    // unsafe — materialize through a staging snapshot
    val staged = updated.cache()
    staged.count()
    Sources.overwriteTable(staged, dir, "customers")
    staged.unpersist()
  }

  /** Analytics over the loaded reference-schema tables: the three
    * report queries (A1/A2/A3, main.py:642-691) on the pipeline output. */
  def analyticsReport(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val orders = Sources.readTable(spark, dir, "orders")
    val completed = orders.filter(col("order_status") === "Completed")
    val monthly = completed
      .groupBy(date_format(col("order_date"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("total_orders"), sum("total_amount").as("total_revenue"))
      .orderBy("month")
    val segments = Sources.readTable(spark, dir, "customers")
      .groupBy(col("customer_segment"))
      .agg(count(lit(1)).as("customer_count"),
           avg("total_spent").as("avg_spent"),
           sum("total_spent").as("total_revenue"))
      .orderBy(desc("total_revenue"))
    val products = Sources.readTable(spark, dir, "products")
    val items = Sources.readTable(spark, dir, "order_items")
    val topProducts = items
      .join(completed.select("order_id"), "order_id")
      .join(broadcast(products.select("product_id", "product_name", "category")), "product_id")
      .groupBy("product_id", "product_name", "category")
      .agg(sum("quantity").as("total_sold"), sum("line_total").as("total_revenue"))
      .orderBy(desc("total_revenue"))
      .limit(10)
    Map("monthly_sales" -> monthly, "customer_segments" -> segments,
        "top_products" -> topProducts)
  }

  /** Monitoring surface (reference ETLMonitoringDashboard,
    * main.py:820-851): latest runs + trailing-24h aggregate over the
    * metadata table. */
  def pipelineStatus(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val meta = Sources.readTable(spark, dir, "etl_metadata")
    val recent = meta.filter(
      col("etl_timestamp") >= current_timestamp() - expr("INTERVAL 24 HOURS"))
    val latest = recent.orderBy(desc("etl_timestamp")).limit(5)
    val stats = recent.agg(
      avg("processing_time_seconds").as("avg_processing_time"),
      sum("records_processed").as("total_records_processed"),
      avg("data_quality_score").as("avg_quality_score"),
      count(lit(1)).as("total_runs"))
    Map("recent_runs" -> latest, "stats_24h" -> stats)
  }

  /** Optimizer surface (reference ETLOptimizer, main.py:911-948: ANALYZE
    * + per-table size report + static suggestions). Spark's analog:
    * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` feeds
    * Catalyst's cost-based optimizer (join reorder, broadcast decisions
    * from real row counts instead of file-size guesses). Works on
    * catalog tables, so callers `saveAsTable` first; returns the
    * per-table statistics the reference prints. */
  def analyzeTables(spark: SparkSession, tables: Seq[String]): Map[String, (Long, Long)] = {
    tables.map { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      val stats = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
        .stats
      t -> (stats.flatMap(_.rowCount).map(_.toLong).getOrElse(-1L),
            stats.map(_.sizeInBytes.toLong).getOrElse(-1L))
    }.toMap
  }
}
