package graft.serve

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dashboard query engine over the hour-grain usage fact — the
  * reference's HTTP-API semantics (`server/app.rb:32-157` +
  * `server/app/usage_data.rb`), Spark-shaped: one filter+groupBy+agg
  * per request, densified by a left join onto the generated tick spine
  * (J5), per-user or collapsed (A8/A15).
  *
  * The fact DataFrame must have columns: user, time (epoch-ms hour
  * start), cluster, excess, taskType, status, started, finished,
  * elapsedMinutes, cpuMinutes, reduceShuffleBytes — the
  * [[graft.model.HourlyUsage]] shape. Cache it (`fact.cache()`) for
  * interactive use: the reference's in-memory HSQLDB analog.
  */
object UsageQueries {

  /** `SELECT DISTINCT cluster … ORDER BY` (`usage_data.rb:479-499`). */
  def clusters(fact: DataFrame): Seq[String] =
    fact.select("cluster").distinct().orderBy("cluster")
      .collect().map(_.getString(0)).toSeq

  /** Sorted users of one cluster (`usage_data.rb:503-523`). */
  def users(fact: DataFrame, cluster: String): Seq[String] =
    fact.filter(col("cluster") === cluster)
      .select("user").distinct().orderBy("user")
      .collect().map(_.getString(0)).toSeq

  /** MIN/MAX time for a cluster (`usage_data.rb:279-289`). */
  def timeBounds(fact: DataFrame, cluster: String): (Long, Long) = {
    val r = fact.filter(col("cluster") === cluster)
      .agg(min("time"), max("time")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Users + time bounds of a cluster in ONE job (the serving chain
    * otherwise pays a driver round-trip per lookup). */
  def clusterMeta(fact: DataFrame, cluster: String): (Seq[String], Long, Long) = {
    val r = fact.filter(col("cluster") === cluster)
      .agg(sort_array(collect_set("user")).as("users"),
        min("time"), max("time"))
      .head()
    (r.getSeq[String](0), r.getLong(1), r.getLong(2))
  }

  private def typeFilter(qt: QueryType): Column = {
    val always = lit(true)
    Seq(
      qt.taskType.map(col("taskType") === _),
      qt.status.map(col("status") === _),
      qt.excess.map(col("excess") === _)
    ).flatten.foldLeft(always)(_ && _)
  }

  /** The A8 serving aggregation: filter cluster + type-specific
    * predicates, bucket time, sum the measure per (user, bucket). */
  def aggregated(fact: DataFrame, cluster: String, qt: QueryType,
      unit: String, zone: String): DataFrame =
    fact
      .filter(col("cluster") === cluster && typeFilter(qt))
      .groupBy(
        col("user"),
        TimeBuckets.bucket(col("time"), unit, zone).as("tick"))
      .agg(sum(col(qt.measure)).as("value"))

  /** Dense per-user series: every (user ∈ users, tick) present, missing
    * cells = measure default (`usage_data.rb:56-90`). Output columns:
    * user, tick, value — ordered by (user, tick). */
  def perUserSeries(fact: DataFrame, cluster: String, users: Seq[String],
      qt: QueryType, unit: String, zone: String,
      startMs: Long, endMs: Long,
      bounds: Option[(Long, Long)] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (minMs, maxMs) = bounds.getOrElse(timeBounds(fact, cluster))
    val tickSeq = TimeBuckets.ticks(unit, zone, startMs, endMs, minMs, maxMs)
    val spine = tickSeq.toDF("tick")
      .crossJoin(users.toDF("user"))
    val agg = aggregated(fact, cluster, qt, unit, zone)
      .filter(col("user").isin(users: _*))
    spine.join(agg, Seq("user", "tick"), "left")
      .na.fill(qt.defaultValue, Seq("value"))
      .select("user", "tick", "value")
      .orderBy("user", "tick")
  }

  /** One collapsed series for a user set — the "users_to_aggregate"
    * API (`server/app.rb:94-102`, A15): filter to the set, drop the
    * user dimension (cube collapse A10), densify. */
  def aggregatedSeries(fact: DataFrame, cluster: String, users: Seq[String],
      qt: QueryType, unit: String, zone: String,
      startMs: Long, endMs: Long,
      bounds: Option[(Long, Long)] = None)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (minMs, maxMs) = bounds.getOrElse(timeBounds(fact, cluster))
    val tickSeq = TimeBuckets.ticks(unit, zone, startMs, endMs, minMs, maxMs)
    val spine = tickSeq.toDF("tick")
    val agg = aggregated(fact, cluster, qt, unit, zone)
      .filter(col("user").isin(users: _*))
      .groupBy("tick").agg(sum("value").as("value"))
    spine.join(agg, Seq("tick"), "left")
      .na.fill(qt.defaultValue, Seq("value"))
      .orderBy("tick")
  }

  /** Top-N users by series total, remainder collapsed into one "other"
    * series — the frontend's top-N + "other users" aggregation
    * (`graph.js.coffee:176-237`, A14/W3), pushed server-side. */
  def topNWithOther(fact: DataFrame, cluster: String, qt: QueryType,
      unit: String, zone: String, n: Int): DataFrame = {
    val agg = aggregated(fact, cluster, qt, unit, zone)
    val totals = agg.groupBy("user").agg(sum("value").as("total"))
    // Distributed top-N (TakeOrderedAndProject) — a global row_number
    // window would sort ALL per-user totals on one partition, a named
    // scale-killer at 100 TB. The n winners are tiny → broadcast back.
    val winners = totals
      .orderBy(col("total").desc, col("user")).limit(n)
      .select(col("user"), lit(true).as("is_top"))
    agg.join(broadcast(winners), Seq("user"), "left")
      .withColumn("who", when(col("is_top"), col("user")).otherwise("other"))
      .groupBy("who", "tick").agg(sum("value").as("value"))
  }

  /** CSV export (`/api/table`, `server/app.rb:110-157`): one row per
    * tick, one column per user, EVERY cell divided by 60
    * (`app.rb:152` — "convert minutes to hours" applies
    * unconditionally, including counter measures like started/finished;
    * QUIRK 11 preserves it for byte-parity with the reference route).
    * Returns the pivoted DataFrame (tick + user cols). */
  def exportTable(fact: DataFrame, cluster: String, users: Seq[String],
      qt: QueryType, unit: String, zone: String,
      startMs: Long, endMs: Long)(implicit spark: SparkSession): DataFrame = {
    val series = perUserSeries(fact, cluster, users, qt, unit, zone,
      startMs, endMs)
    val scale = 60.0
    series.withColumn("value", col("value") / scale)
      .groupBy("tick").pivot("user", users).agg(first("value"))
      .orderBy("tick")
  }
}
