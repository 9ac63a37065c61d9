package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every left row, the latest right row of
  * the same key with rightTime <= leftTime. Spark has no built-in as-of
  * operator; the naive formulations are a range cross-join (O(n·m)
  * within key) or a per-key collect. This is the scalable composition:
  *
  *   union both sides (right rows sort before left rows at equal ts)
  *   → ONE shuffle on the key
  *   → running `last(right_payload, ignoreNulls)` window
  *   → keep left rows, unpack the carried payload.
  *
  * Cost = one shuffle + one per-partition sort, the same plan shape a
  * native as-of operator (or a 1000-executor cluster) wants. Right rows
  * should be unique per (key, time) — dedupe first for determinism.
  */
object AsOfJoin {

  /** `tolerance`: maximum staleness of the match — a right row older
    * than leftTime − tolerance yields NULLs instead. Units follow
    * `.cast("long")` of the time columns (seconds for timestamps,
    * native for numerics). None = unbounded. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payloadPrefix: String = "asof_",
                   tolerance: Option[Long] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(right.columns.map(col).toSeq: _*)
    val rightType = StructType(right.schema.fields)
    val leftType = StructType(left.schema.fields)

    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), leftStruct.as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(leftType).as("__l"),
      rightStruct.as("__r"))

    // at equal time, side 0 (right) sorts first ⇒ <= semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__m", tolerance match {
        case None => col("__m")
        case Some(tol) => when(
          col("__t").cast("long") - col(s"__m.$rightTime").cast("long") <= tol,
          col("__m")) // else NULL: match too stale
      })

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c)).toSeq
    val rightCols = right.columns.map(c => col(s"__m.$c").as(s"$payloadPrefix$c")).toSeq
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Native-operator variant of [[asofBackward]] via the custom
    * AsOfJoinPlan → AsOfJoinExec (graft.plans): each side shuffles once
    * on its own key and the partitions sort-merge with O(1) state —
    * no widened union stream. Requires the session to carry
    * GraftExtensions (the planner strategy) and LONG key/time columns
    * (callers convert timestamps with unix_micros). Right columns come
    * back NULL for unmatched left rows, prefixed like asofBackward. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String,
                 payloadPrefix: String = "asof_",
                 tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graftshim
    val spark = left.sparkSession
    // disambiguate output names up front (left names win their spot)
    val r2 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"$payloadPrefix$c"))
    val lPlan = graftshim.analyzed(left)
    val rPlan = graftshim.analyzed(r2)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val plan = graft.plans.AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, s"$payloadPrefix$key"),
      attr(lPlan, leftTime), attr(rPlan, s"$payloadPrefix$rightTime"), tolerance)
    graftshim.ofRows(spark, plan).drop(s"$payloadPrefix$key")
  }

  /** Forward variant: earliest right row with rightTime >= leftTime. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  payloadPrefix: String = "asof_"): DataFrame = {
    val negate = (df: DataFrame, t: String) =>
      df.withColumn(t, -unix_micros(col(t).cast("timestamp")))
    // forward in real time = backward on negated time
    val flipped = asofBackward(
      negate(left, leftTime), negate(right, rightTime), key, leftTime, rightTime,
      payloadPrefix)
    flipped
      .withColumn(leftTime, timestamp_micros(-col(leftTime)))
      .withColumn(s"$payloadPrefix$rightTime",
        timestamp_micros(-col(s"$payloadPrefix$rightTime")))
  }
}
