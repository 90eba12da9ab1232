package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core OLAP surfaces beyond plain GROUP BY: multi-level aggregation
  * (ROLLUP + grouping_id), window frames (running / moving
  * aggregates), and pivot — one pass each, exactly mirrored in DuckDB.
  *
  * Scale notes: rollup is a single shuffle producing all grouping
  * levels at once (Expand + partial agg — vs one job per level);
  * frame windows shuffle once on the partition key; pivot with an
  * explicit value list is one aggregation with conditional columns
  * (never a per-value job).
  */
object OlapQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** q51 — ROLLUP over (returnflag, linestatus) with grouping_id: the
    * dashboard's "totals + subtotals + grand total" in one pass. */
  private def q51(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))

  /** q52 — window frames per user: running total (unbounded→current),
    * 3-row moving sum, previous value, ordinal. Exact: decimal
    * accumulation inside deterministic ROWS frames, lag passes the
    * stored double through untouched. */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tsMs"), col("event_id"))
    Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("tsMs"), col("value"),
      sum(col("value").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"),
      sum(col("value").cast("decimal(18,2)"))
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("double").as("moving3_total"),
      lag(col("value"), 1).over(w).as("prev_value"),
      row_number().over(w).as("rn"))
  }

  /** q53 — pivot: per-user value totals fanned into one column per
    * event type (explicit value list ⇒ single-pass conditional
    * aggregation; the reference's CSV export pivots the same way). */
  private def q53(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(dsum(col("value")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_rollup"        -> (q51 _),
    "q52_window_frames" -> (q52 _),
    "q53_pivot"         -> (q53 _))

  val oracles: Map[String, String] = Map(
    "q51_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_rows,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q52_window_frames" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS tsMs, value,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |         ORDER BY epoch_ms(ts), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |         ORDER BY epoch_ms(ts), event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_total,
        |       lag(value, 1) OVER (PARTITION BY user_id
        |         ORDER BY epoch_ms(ts), event_id) AS prev_value,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |         ORDER BY epoch_ms(ts), event_id) AS INTEGER) AS rn
        |FROM events""".stripMargin,
    "q53_pivot" ->
      """SELECT user_id,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |       CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY user_id""".stripMargin)
}
