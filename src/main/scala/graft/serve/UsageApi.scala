package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** The HTTP-API facade: request/response shapes of `POST /api/usage`
  * (`server/app.rb:58-106`) over [[UsageQueries]], with the reference's
  * result-level cache (Guava LoadingCache keyed by serialized params,
  * `usage_data.rb:442-454` + `cache_builder.rb`, T7) as a TrieMap memo
  * invalidated on ingest.
  *
  * Response parity (`app.rb:80-106`): dense `times` ticks; one series
  * per named user; one collapsed series for the `usersToAggregate` set;
  * the count of aggregated users; the cluster echoed back.
  */
final case class UsageRequest(
    cluster: String,
    users: Seq[String],
    usersToAggregate: Seq[String],
    queryType: String,
    unit: String,
    zone: String,
    startMs: Long,
    endMs: Long)

final case class UserSeries(user: String, data: Seq[Double])

final case class UsageResponse(
    times: Seq[Long],
    users: Seq[UserSeries],
    usersAggregated: Seq[Double],
    numAggregatedUsers: Int,
    cluster: String)

final class UsageApi(fact: DataFrame)(implicit spark: SparkSession) {

  // the reference caches the hourly fact in HSQLDB memory; we cache the
  // DataFrame (usage_database.rb:23-26 analog)
  fact.cache()

  private val memo = TrieMap.empty[UsageRequest, UsageResponse]

  /** Ingest hook: new data arrived → drop memoized results
    * (`usage_loader.rb:195-196`). */
  def invalidate(): Unit = {
    memo.clear()
    fact.unpersist()
    fact.cache()
  }

  def clusters(): Seq[String] = UsageQueries.clusters(fact)
  def users(cluster: String): Seq[String] = UsageQueries.users(fact, cluster)

  /** `POST /api/usage` (`app.rb:44-106`). */
  def usage(req: UsageRequest): UsageResponse =
    memo.getOrElseUpdate(req, {
      val qt = QueryType.All.getOrElse(req.queryType,
        throw new IllegalArgumentException(s"bad type: ${req.queryType}"))
      // one metadata job, bounds forwarded everywhere below — an
      // uncached request costs exactly: meta + perUser (+ aggregate)
      val (minMs, maxMs) = UsageQueries.timeBounds(fact, req.cluster)
      val bounds = Some((minMs, maxMs))
      val ticks = TimeBuckets.ticks(
        req.unit, req.zone, req.startMs, req.endMs, minMs, maxMs)
      val perUser = UsageQueries
        .perUserSeries(fact, req.cluster, req.users, qt, req.unit,
          req.zone, req.startMs, req.endMs, bounds)
        .collect()
        .groupBy(_.getString(0))
        .view.mapValues(rows =>
          rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq)
        .toMap
      val aggregated =
        if (req.usersToAggregate.isEmpty) ticks.map(_ => qt.defaultValue)
        else UsageQueries
          .aggregatedSeries(fact, req.cluster, req.usersToAggregate, qt,
            req.unit, req.zone, req.startMs, req.endMs, bounds)
          .collect().sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq
      UsageResponse(
        times = ticks,
        users = req.users.map(u =>
          UserSeries(u, perUser.getOrElse(u, ticks.map(_ => qt.defaultValue)))),
        usersAggregated = aggregated,
        numAggregatedUsers = req.usersToAggregate.size,
        cluster = req.cluster)
    })

  /** `/api/table` CSV lines (`app.rb:110-157`): header then one row per
    * tick, every cell divided by 60 — the reference scales
    * unconditionally (`app.rb:152`), counters included (QUIRK 11). */
  def exportCsv(req: UsageRequest): Seq[String] = {
    val resp = usage(req)
    val qt = QueryType.All(req.queryType)
    val scale = 60.0
    val header = ("time" +: resp.users.map(_.user)).mkString(",")
    val rows = resp.times.zipWithIndex.map { case (t, i) =>
      (t.toString +: resp.users.map(u => (u.data(i) / scale).toString))
        .mkString(",")
    }
    header +: rows
  }
}
