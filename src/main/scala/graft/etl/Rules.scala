package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Business-rule validation (reference DataValidationFramework,
  * main.py:874-908): named rules producing violation counts. Each rule
  * is a filter + count; `validate` fuses all rules on the same table
  * into one conditional aggregate (one scan per table, not one per rule).
  */
object Rules {

  case class Violation(table: String, rule: String, violations: Long)

  /** The reference's four rules (main.py:884-906), expressed as
    * predicates that FLAG a violation. */
  def orderTotalMismatch = // F13 (main.py:884-889)
    abs(col("total_amount") -
      (col("subtotal") + col("tax_amount") + col("shipping_cost") - col("discount_amount"))) > 0.01

  def futureOrderDate = col("order_date") > current_timestamp() // F10 (main.py:892-894)

  def nonPositiveMargin = col("unit_price") <= col("cost_price") // F11 (main.py:898-900)

  /** F12 (main.py:904-906): NULL email is a violation, matching the
    * negated pandas `contains('@', na=False)`. */
  def invalidEmail = !coalesce(col("email").contains("@"), lit(false))

  val ruleSets: Map[String, Map[String, org.apache.spark.sql.Column]] = Map(
    "orders" -> Map(
      "order_total_consistency" -> orderTotalMismatch,
      "no_future_order_dates" -> futureOrderDate),
    "products" -> Map("positive_profit_margin" -> nonPositiveMargin),
    "customers" -> Map("valid_email_format" -> invalidEmail))

  /** Run every rule registered for `table` in ONE scan: each rule
    * becomes a conditional sum in a single aggregate. */
  def validate(table: String, df: DataFrame): Seq[Violation] =
    ruleSets.get(table) match {
      case None => Seq.empty
      case Some(rules) =>
        val aggs = rules.toSeq.map { case (name, pred) =>
          sum(when(pred, 1L).otherwise(0L)).as(name)
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rules.keys.toSeq.sorted.map(n => Violation(table, n, Option(row.getAs[Long](n)).getOrElse(0L)))
    }

  /** Violation report for a set of loaded tables as a DataFrame (the
    * reference returns a dict keyed by rule name, main.py:880-908). */
  def report(spark: SparkSession, tables: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    tables.toSeq.sortBy(_._1)
      .flatMap { case (name, df) => validate(name, df) }
      .toDF("table_name", "rule", "violations")
  }
}
