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
  *
  * Serving-session tuning (measured in STRESS.md round 10, 10⁷-row
  * fact): the owner of the SparkSession should consider
  * `spark.sql.codegen.wholeStage=false` for a dedicated serving
  * process — every request embeds fresh literals so whole-stage
  * codegen compiles a new class per request, and at interactive row
  * counts the compile latency (~0.3 s on the P95 tail) outweighs the
  * interpreted path's per-row cost (cold P95 658 → 343 ms).
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

final class UsageApi(fact0: DataFrame)(implicit spark: SparkSession) {

  // The reference caches the hourly fact in HSQLDB memory with B-tree
  // indexes on the query keys (usage_database.rb:23-26); the Spark
  // analog is a cache CLUSTERED by the request predicates:
  // range-partition on (cluster, user) and sort each partition by
  // (cluster, user, time), so the in-memory columnar cache's per-batch
  // min/max stats prune a request's scan to just the requested users'
  // batches (InMemoryTableScan partition pruning — measured round 10:
  // cold P50 dropped 1.29 s → sub-second on a 10⁷-row fact; an
  // interleaved cache prunes NOTHING because every batch spans every
  // cluster/user). Range (not hash-by-cluster) keeps full parallelism:
  // hash on 2 clusters would collapse the scan to 2 tasks. At cluster
  // scale the same layout is bucketing/Z-order on the same keys.
  private val fact = fact0
    .repartitionByRange(
      org.apache.spark.sql.functions.col("cluster"),
      org.apache.spark.sql.functions.col("user"))
    .sortWithinPartitions("cluster", "user", "time")
  fact.cache()

  private val memo = TrieMap.empty[UsageRequest, UsageResponse]
  // per-cluster time bounds are request-invariant between ingests —
  // memoized so a cold request pays its series job(s), not a
  // metadata scan too
  private val boundsMemo = TrieMap.empty[String, (Long, Long)]
  private def bounds(cluster: String): (Long, Long) =
    boundsMemo.getOrElseUpdate(cluster,
      UsageQueries.timeBounds(fact, cluster))

  /** Ingest hook: new data arrived → drop memoized results
    * (`usage_loader.rb:195-196`). */
  def invalidate(): Unit = {
    memo.clear()
    boundsMemo.clear()
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
      // bounds memoized per cluster, forwarded everywhere below — an
      // uncached request costs exactly: perUser (+ aggregate) jobs
      val (minMs, maxMs) = bounds(req.cluster)
      val ticks = TimeBuckets.ticks(
        req.unit, req.zone, req.startMs, req.endMs, minMs, maxMs)
      // ONE Spark job per cold request — the reference's own shape
      // (one SQL GROUP BY, then the server densifies in Ruby,
      // `usage_data.rb:56-90`): a single filtered aggregation over
      // named ∪ aggregate users, collected sparse, densified onto the
      // driver-computed tick spine here. The previous implementation
      // ran the oracle-pinned perUserSeries + aggregatedSeries plans —
      // spine crossJoin, left join, a global orderBy (range-sampling
      // job), and a SECOND aggregation job for the aggregate set —
      // ~2-3 multi-stage jobs per request; measured round 10 (10⁷-row
      // cached fact), collapsing to one job + driver densify cut cold
      // P95 from ~2.3 s to sub-second. perUserSeries/aggregatedSeries
      // remain the distributed (write-a-table) forms and the fuzz/gate
      // surface; UsageApiSpec pins this path's parity with them.
      //
      // Counter measures (started/finished — 13 of the 23 types) sum
      // to LONG, minute measures to DOUBLE; the JSON contract is
      // numbers either way (app.rb serializes both), so extraction
      // must be numeric-type-agnostic — Row.getDouble on the long sum
      // throws ClassCastException (latent until the latency harness
      // ran the full 23-type request mix; UsageApiSpec now pins a
      // counter type too).
      def num(r: org.apache.spark.sql.Row, i: Int): Double =
        r.get(i).asInstanceOf[Number].doubleValue
      val wanted = (req.users ++ req.usersToAggregate).distinct
      val byUser: Map[String, Map[Long, Double]] =
        if (wanted.isEmpty) Map.empty
        else UsageQueries
          .aggregated(fact, req.cluster, qt, req.unit, req.zone)
          .filter(org.apache.spark.sql.functions.col("user")
            .isin(wanted: _*))
          .collect()
          .groupBy(_.getString(0))
          .view.mapValues(_.map(r => r.getLong(1) -> num(r, 2)).toMap)
          .toMap
      def seriesOf(u: String): Seq[Double] = {
        val m = byUser.getOrElse(u, Map.empty[Long, Double])
        ticks.map(t => m.getOrElse(t, qt.defaultValue))
      }
      val aggregated =
        if (req.usersToAggregate.isEmpty) ticks.map(_ => qt.defaultValue)
        // distinct: the isin-filtered aggregation counted a
        // twice-listed user once; summing per-user series must too
        else req.usersToAggregate.distinct.map(seriesOf)
          .transpose.map(_.sum)
      UsageResponse(
        times = ticks,
        users = req.users.map(u => UserSeries(u, seriesOf(u))),
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
