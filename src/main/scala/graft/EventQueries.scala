package graft

import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream join queries: the as-of join, the binned range join,
  * and semi-structured (JSON) extraction — operators a time-series /
  * clickstream workload needs that have no single built-in Spark
  * equivalent. All time arithmetic is integer epoch-milliseconds (the
  * cross-engine discipline of [[SparkEntry]]).
  */
object EventQueries {

  /** q46 — as-of join: every purchase enriched with the user's most
    * recent view at or before it (the attribution join). The right
    * side is deduped to one row per (user, ms) — `max_by` on event id —
    * so the match is deterministic in both engines. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsMs"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "tsMs")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    AsOf.asofJoin(purchases, views, Seq("user_id"), "tsMs",
        payloadCols = Seq("value"), prefix = "view_")
      .select(col("event_id"), col("user_id"),
        col("tsMs").as("purchase_ms"), col("value"),
        col("view_tsMs").as("view_ms"), col("view_value"),
        (col("tsMs") - col("view_tsMs")).as("gap_ms"))
  }

  /** q47 — range join: clicks landing inside the 5-minute window after
    * each error, per user (binned equi-join, bin = window length ⇒
    * ≤2 bins per interval), left-completed so zero-click errors keep a
    * row. */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("tsMs").as("lo"), (col("tsMs") + 300000L).as("hi"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsMs").as("click_ms"))
    val counts = RangeJoin
      .intervalJoin(clicks, errors, Seq("user_id"), "click_ms", "lo", "hi",
        binWidth = 300000L)
      .groupBy("error_id").agg(count(lit(1)).as("n_clicks"))
    errors.join(counts, Seq("error_id"), "left")
      .na.fill(0L, Seq("n_clicks"))
      .select("error_id", "user_id", "n_clicks")
  }

  /** q50 — semi-structured extraction: parse the JSON `props` column
    * (real `from_json` with an explicit schema, not string surgery)
    * and aggregate the extracted field per event type. */
  private def q50(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", from_json(col("props"), lit("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        countDistinct("k").as("n_distinct_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_asof_join"  -> (q46 _),
    "q47_range_join" -> (q47 _),
    "q50_json_props" -> (q50 _))

  val oracles: Map[String, String] = Map(
    "q46_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, epoch_ms(ts) AS view_ms,
        |         arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |), p AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS purchase_ms, value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.purchase_ms, p.value,
        |       v.view_ms, v.view_value,
        |       p.purchase_ms - v.view_ms AS gap_ms
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.purchase_ms >= v.view_ms""".stripMargin,
    "q47_range_join" ->
      """WITH e AS (
        |  SELECT event_id AS error_id, user_id,
        |         epoch_ms(ts) AS lo, epoch_ms(ts) + 300000 AS hi
        |  FROM events WHERE event_type = 'error'
        |), c AS (
        |  SELECT user_id, epoch_ms(ts) AS click_ms
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT e.error_id, e.user_id,
        |       CAST(COUNT(c.click_ms) AS BIGINT) AS n_clicks
        |FROM e LEFT JOIN c
        |  ON e.user_id = c.user_id AND c.click_ms >= e.lo AND c.click_ms <= e.hi
        |GROUP BY 1, 2""".stripMargin,
    "q50_json_props" ->
      """WITH j AS (
        |  SELECT event_type,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       MIN(k) AS min_k, MAX(k) AS max_k,
        |       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
        |       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        |FROM j GROUP BY 1""".stripMargin)
}
