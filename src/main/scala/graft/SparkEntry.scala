package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here has a DuckDB oracle in [[oracleSql]]. Cross-engine
  * hash-equality discipline (the driver compares value hashes):
  *  - sums of doubles go through exact DECIMAL accumulation, then one
  *    cast to DOUBLE (both engines produce the identical IEEE double);
  *  - time arithmetic is integer epoch-milliseconds (`unix_millis` /
  *    `epoch_ms`), never float;
  *  - timestamps are output as epoch-ms BIGINT (parquet ns vs µs
  *    precision would otherwise skew hashes);
  *  - every computed column is aliased identically in both engines.
  */
object SparkEntry {

  /** Exact sum of a 2-decimal-generated double column (see discipline
    * note above). */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full events→attempts→hour-proration→usage-cube pipeline. */
  def entry(spark: SparkSession): DataFrame =
    analog.EventUsage.usageFact(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- //
  //  Operator inventory queries (SURVEY.md §2). One per operator      //
  //  class; names sorted by §2 table id they exercise.                //
  // ---------------------------------------------------------------- //

  /** A7/A8 hash aggregation with filter pushdown (scan S1 analog). */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** F4 predicate + column pruning; pass-through doubles are bit-exact. */
  private def q02(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 150000.0 && col("o_orderpriority") === "1-URGENT")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        expr("unix_millis(cast(o_orderdate as timestamp))").as("order_date_ms"))

  /** J4-style multi-way equi-join with broadcast dims (nation is tiny). */
  private def q03(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_rows"))

  /** A14/W3/O4: top-N by total with "other" remainder bucket.
    * Distributed top-N: `orderBy().limit(n)` plans TakeOrderedAndProject
    * (per-partition heap + driver merge of n rows) — never the
    * single-partition global window sort. Winners broadcast back. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val totals = Tables.events(s, d)
      .groupBy("user_id")
      .agg(dsum(col("value")).as("total"))
    val winners = totals
      .orderBy(col("total").desc, col("user_id")).limit(5)
      .select(col("user_id"), lit(true).as("is_top"))
    totals
      .join(broadcast(winners), Seq("user_id"), "left")
      .withColumn(
        "who",
        when(col("is_top"), col("user_id").cast("string")).otherwise("other"))
      .groupBy("who")
      .agg(
        sum(col("total").cast("decimal(18,2)")).cast("double").as("total_value"),
        count(lit(1)).as("n_users"))
  }

  /** A12/O3: DISTINCT + sort. */
  private def q05(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_type").distinct().orderBy("event_type")

  /** A13: min/max time bounds per group. */
  private def q06(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        min(col("tsMs")).as("min_ts_ms"),
        max(col("tsMs")).as("max_ts_ms"),
        count(lit(1)).as("n"))

  /** W1: first row per partition by time (row_number window). */
  private def q07(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"))

  /** A6/T6: the hour-proration fan-out on analog attempts (the heart of
    * the engine), aggregated per (user, hour). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val at = analog.EventUsage.attempts(Tables.events(s, d))
    graft.usage.HourProration
      .explodeHours(at, col("startMs"), col("finishMs"))
      .groupBy("user_id", "hourMs")
      .agg(
        sum("overlapMs").as("sum_overlap_ms"),
        sum("started").as("n_started"),
        sum("finished").as("n_finished"))
      .withColumn("elapsed_min", col("sum_overlap_ms") / 60000.0)
      .drop("sum_overlap_ms")
  }

  /** J5: time-spine densification (left join onto generated ticks). */
  private def q09(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("hourMs", expr("tsMs div 3600000") * 3600000L)
    val bounds = ev.agg(
      min("hourMs").as("lo"), max("hourMs").as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(3600000L))).as("hourMs"))
    val types = ev.select("event_type").distinct()
    val grid = spine.crossJoin(types)
    val counts = ev.groupBy("hourMs", "event_type")
      .agg(count(lit(1)).as("cnt"))
    grid.join(counts, Seq("hourMs", "event_type"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /** P9: zone-aware Sunday-based week truncation (the reference's
    * roundTimestampToWeek, `TimeZoneConversion.java:23-83`). */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .withColumn("week_start",
        date_sub(col("day"), dayofweek(col("day")) - 1).cast("string"))
      .groupBy("week_start")
      .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))

  /** J1/O1 analog: per-order tree assembly with ordered children. */
  private def q11(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_items"),
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // tie-break on partkey so both engines pick the same row.
        min_by(col("l_partkey"), struct(col("l_linenumber"), col("l_partkey")))
          .as("first_partkey"),
        max_by(col("l_partkey"), struct(col("l_linenumber"), col("l_partkey")))
          .as("last_partkey"),
        dsum(col("l_quantity")).as("total_qty"))

  /** A5/W1/W2: excess marking — success rows are non-excess; a group
    * with no success keeps its earliest row non-excess. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day_ms", expr("tsMs div 86400000") * 86400000L)
      .withColumn("is_success", (col("event_type") === "purchase").cast("int"))
    val w = Window.partitionBy("user_id", "day_ms")
    val wOrd = w.orderBy(col("ts"), col("event_id"))
    ev.withColumn("any_success", max("is_success").over(w))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn(
        "excess",
        !(col("is_success") === 1 || (col("any_success") === 0 && col("rn") === 1)))
      .groupBy("user_id")
      .agg(
        sum(col("excess").cast("int")).as("n_excess"),
        sum((!col("excess")).cast("int")).as("n_useful"))
  }

  /** A1-A3 analog: fragment merge — max times, last value by event
    * order, additive totals. */
  private def q13(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(col("tsMs")).as("first_ms"),
        max(col("tsMs")).as("last_ms"),
        max_by(col("event_type"), struct(col("ts"), col("event_id")))
          .as("last_type"),
        dsum(col("value")).as("total_value"))

  /** A6+A7 full analog fact build (entry's query, gate-checked). */
  private def q14(s: SparkSession, d: String): DataFrame =
    analog.EventUsage.usageFact(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pushdown"   -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_join_revenue"   -> (q03 _),
    "q04_topk_other"     -> (q04 _),
    "q05_distinct_sorted" -> (q05 _),
    "q06_time_bounds"    -> (q06 _),
    "q07_window_first"   -> (q07 _),
    "q08_hour_proration" -> (q08 _),
    "q09_spine_densify"  -> (q09 _),
    "q10_sunday_week"    -> (q10 _),
    "q11_order_assembly" -> (q11 _),
    "q12_excess_marking" -> (q12 _),
    "q13_fragment_merge" -> (q13 _),
    "q14_usage_fact"     -> (q14 _)) ++ TextQueries.queries ++
    ServeQueries.queries ++ EventQueries.queries ++ OlapQueries.queries ++
    PipelineQueries.queries ++ SketchQueries.queries ++ CurationQueries.queries

  // ---------------------------------------------------------------- //
  //  DuckDB oracles                                                   //
  // ---------------------------------------------------------------- //

  /** Shared CTE: analog attempts over events (mirror of
    * [[analog.EventUsage.attempts]]). */
  private[graft] val attemptsCte =
    """attempts AS (
      |  SELECT *,
      |         epoch_ms(ts) AS startMs,
      |         CAST(round(value * 60000) AS BIGINT) AS durMs,
      |         epoch_ms(ts) + CAST(round(value * 60000) AS BIGINT) AS finishMs,
      |         CAST(user_id AS VARCHAR) AS "user",
      |         CASE WHEN user_id % 2 = 0 THEN 'east' ELSE 'west' END AS cluster,
      |         CASE WHEN event_type IN ('click','view') THEN 'MAP' ELSE 'REDUCE' END AS taskType,
      |         CASE WHEN event_type = 'purchase' THEN 'SUCCESS'
      |              WHEN event_type = 'error' THEN 'FAILED'
      |              ELSE 'KILLED' END AS status,
      |         event_id % 5 = 0 AS excess,
      |         CAST(round(value * 30000) AS BIGINT) AS cpuMs,
      |         CAST(json_extract(props, '$.k') AS BIGINT) * 1048576 AS reduceShuffleBytes
      |  FROM events
      |)""".stripMargin

  /** Shared CTE: hour fan-out of attempts (mirror of
    * [[graft.usage.HourProration.explodeHours]]). */
  private[graft] val explodedCte =
    """exploded AS (
      |  SELECT a.*,
      |         unnest(generate_series((startMs // 3600000) * 3600000,
      |                                ((finishMs - 1) // 3600000) * 3600000,
      |                                3600000)) AS hourMs
      |  FROM attempts a
      |  WHERE finishMs > startMs
      |), hours AS (
      |  SELECT *,
      |         greatest(0, least(finishMs, hourMs + 3600000) - greatest(startMs, hourMs)) AS overlapMs,
      |         CASE WHEN hourMs = (startMs // 3600000) * 3600000 THEN 1 ELSE 0 END AS started,
      |         CASE WHEN hourMs = ((finishMs - 1) // 3600000) * 3600000 THEN 1 ELSE 0 END AS finished
      |  FROM exploded
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       epoch_ms(o_orderdate) AS order_date_ms
        |FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderpriority = '1-URGENT'""".stripMargin,
    "q03_join_revenue" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_topk_other" ->
      """WITH totals AS (
        |  SELECT user_id,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY user_id
        |), ranked AS (
        |  SELECT user_id, total,
        |         row_number() OVER (ORDER BY total DESC, user_id) AS rk
        |  FROM totals
        |)
        |SELECT CASE WHEN rk <= 5 THEN CAST(user_id AS VARCHAR) ELSE 'other' END AS who,
        |       CAST(SUM(total) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_users
        |FROM ranked
        |GROUP BY 1""".stripMargin,
    "q05_distinct_sorted" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q06_time_bounds" ->
      """SELECT event_type,
        |       MIN(epoch_ms(ts)) AS min_ts_ms,
        |       MAX(epoch_ms(ts)) AS max_ts_ms,
        |       COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q07_window_first" ->
      """SELECT user_id, first_event_id, first_event_type FROM (
        |  SELECT user_id, event_id AS first_event_id,
        |         event_type AS first_event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,
    "q08_hour_proration" ->
      s"""WITH $attemptsCte, $explodedCte
         |SELECT user_id, hourMs,
         |       CAST(SUM(started) AS BIGINT) AS n_started,
         |       CAST(SUM(finished) AS BIGINT) AS n_finished,
         |       CAST(SUM(overlapMs) AS BIGINT) / 60000.0 AS elapsed_min
         |FROM hours
         |GROUP BY user_id, hourMs""".stripMargin,
    "q09_spine_densify" ->
      """WITH ev AS (
        |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hourMs, event_type
        |  FROM events
        |), spine AS (
        |  SELECT unnest(generate_series((SELECT MIN(hourMs) FROM ev),
        |                                (SELECT MAX(hourMs) FROM ev),
        |                                3600000)) AS hourMs
        |), grid AS (
        |  SELECT s.hourMs, t.event_type
        |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
        |), counts AS (
        |  SELECT hourMs, event_type, COUNT(*) AS cnt
        |  FROM ev GROUP BY hourMs, event_type
        |)
        |SELECT g.hourMs, g.event_type, COALESCE(c.cnt, 0) AS cnt
        |FROM grid g LEFT JOIN counts c
        |  ON g.hourMs = c.hourMs AND g.event_type = c.event_type""".stripMargin,
    "q10_sunday_week" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS DATE) + 1) - 1 AS VARCHAR) AS week_start,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_events
        |FROM events
        |GROUP BY 1""".stripMargin,
    "q11_order_assembly" ->
      """SELECT l_orderkey,
        |       COUNT(*) AS n_items,
        |       first(l_partkey ORDER BY l_linenumber, l_partkey) AS first_partkey,
        |       last(l_partkey ORDER BY l_linenumber, l_partkey) AS last_partkey,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |GROUP BY l_orderkey""".stripMargin,
    "q12_excess_marking" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts,
        |         (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_success
        |  FROM events
        |), marked AS (
        |  SELECT user_id,
        |         NOT (is_success = 1 OR
        |              (MAX(is_success) OVER (PARTITION BY user_id, day_ms) = 0
        |               AND row_number() OVER (PARTITION BY user_id, day_ms ORDER BY ts, event_id) = 1)) AS excess
        |  FROM ev
        |)
        |SELECT user_id,
        |       CAST(SUM(CASE WHEN excess THEN 1 ELSE 0 END) AS BIGINT) AS n_excess,
        |       CAST(SUM(CASE WHEN excess THEN 0 ELSE 1 END) AS BIGINT) AS n_useful
        |FROM marked GROUP BY user_id""".stripMargin,
    "q13_fragment_merge" ->
      """SELECT user_id,
        |       MIN(epoch_ms(ts)) AS first_ms,
        |       MAX(epoch_ms(ts)) AS last_ms,
        |       first(event_type ORDER BY ts DESC, event_id DESC) AS last_type,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q14_usage_fact" ->
      s"""WITH $attemptsCte, $explodedCte
         |SELECT "user", hourMs, cluster, excess, taskType, status,
         |       CAST(SUM(started) AS BIGINT) AS started,
         |       CAST(SUM(finished) AS BIGINT) AS finished,
         |       CAST(SUM(CAST(
         |         CAST(cpuMs AS DOUBLE) * CAST(overlapMs AS DOUBLE) / CAST(durMs AS DOUBLE)
         |         AS DECIMAL(28,6))) AS DOUBLE) AS cpuMsSum,
         |       CAST(SUM(reduceShuffleBytes) AS BIGINT) AS reduceShuffleBytes,
         |       CAST(SUM(overlapMs) AS BIGINT) / 60000.0 AS elapsedMinutes
         |FROM hours
         |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin) ++ TextQueries.oracles ++
    ServeQueries.oracles ++ EventQueries.oracles ++ OlapQueries.oracles ++
    PipelineQueries.oracles ++ SketchQueries.oracles ++ CurationQueries.oracles
}
