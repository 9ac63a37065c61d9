package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Reference-parity transform stage (reference main.py:402-499), one
  * function per table plus the shared basic clean, dispatched by table
  * name exactly like the reference's `transform_data` (main.py:413-420).
  *
  * Every rule is a native Column expression — the whole stage is a
  * single narrow projection+filter per table (no shuffle, fully
  * codegen'd), so it runs at scan speed at any scale.
  */
object Transforms {

  /** P1+F1 (main.py:428-433): trim every string column, then drop rows
    * whose columns are ALL null. Deviation (documented, SURVEY §7): the
    * reference's `astype(str)` turns NaN into the literal "nan"; we keep
    * nulls null — `trim` is null-preserving. */
  def cleanBasic(df: DataFrame): DataFrame = {
    val trimmed = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == StringType) d.withColumn(f.name, trim(col(f.name))) else d
    }
    trimmed.na.drop("all")
  }

  /** Country standardization map (main.py:443-447) — unmapped values
    * pass through unchanged. */
  private val countryMap = Seq(
    "US" -> "USA", "United States" -> "USA",
    "UK" -> "United Kingdom", "Britain" -> "United Kingdom")

  /** F2+P2+P3+P4 (main.py:436-457): email validity filter (null → drop,
    * matching pandas `na=False`), country mapping, date parse, zero-init
    * lifetime totals. */
  def transformCustomers(df: DataFrame): DataFrame = {
    val std = countryMap.foldLeft(col("country")) { case (acc, (from, to)) =>
      when(col("country") === from, to).otherwise(acc)
    }
    df.filter(col("email").contains("@"))
      .withColumn("country", std)
      .withColumn("registration_date", to_date(col("registration_date")))
      .withColumn("total_orders", lit(0L))
      .withColumn("total_spent", lit(0.0))
  }

  /** F3+P5+P6 (main.py:460-468): positive prices, derived profit margin,
    * negative stock clamped to zero. */
  def transformProducts(df: DataFrame): DataFrame =
    df.filter(col("unit_price") > 0 && col("cost_price") > 0)
      .withColumn("profit_margin",
        round((col("unit_price") - col("cost_price")) / col("unit_price") * 100, 2))
      .withColumn("stock_quantity", greatest(col("stock_quantity"), lit(0L)))

  /** P3+F4+F5 (main.py:471-487): date parse, non-negative money columns,
    * order-total arithmetic consistency within 0.01. */
  def transformOrders(df: DataFrame): DataFrame = {
    val moneyCols = Seq("subtotal", "tax_amount", "shipping_cost", "total_amount")
    val nonNeg = moneyCols.foldLeft(df.withColumn("order_date", to_date(col("order_date")))) {
      (d, c) => d.filter(col(c) >= 0)
    }
    nonNeg.filter(
      abs(col("total_amount") -
        (col("subtotal") + col("tax_amount") + col("shipping_cost") - col("discount_amount")))
        < 0.01)
  }

  /** F6+F7 (main.py:490-499): item positivity and line-total consistency
    * (quantity × unit_price × (1 − discount%/100) within 0.01). */
  def transformOrderItems(df: DataFrame): DataFrame =
    df.filter(col("quantity") > 0 && col("unit_price") >= 0 && col("line_total") >= 0)
      .filter(
        abs(col("line_total") -
          col("quantity") * col("unit_price") * (lit(1.0) - col("discount_percent") / 100.0))
          < 0.01)

  /** Table-name dispatch registry (reference main.py:413-420). Every
    * table first passes through `cleanBasic`. */
  val registry: Map[String, DataFrame => DataFrame] = Map(
    "customers" -> transformCustomers,
    "products" -> transformProducts,
    "orders" -> transformOrders,
    "order_items" -> transformOrderItems)

  /** The full transform for one table: basic clean + table-specific
    * stage (identity for unknown tables, like the reference's fallthrough). */
  def apply(table: String, df: DataFrame): DataFrame =
    registry.getOrElse(table, identity[DataFrame] _)(cleanBasic(df))
}
