package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over an event stream with columns
  * (`user_id`, `event_type`, `tsMs`): cohort retention and ordered
  * funnels — the OLAP queries a product-analytics workload runs
  * alongside the usage dashboard's time-series aggregates.
  *
  * Everything is exact epoch-ms integer arithmetic (no timestamps, no
  * zone math), so both operators carry bit-exact SQL oracles.
  */
object EventAnalytics {

  /** Cohort retention: each user is assigned to the epoch-week of
    * their first event (`cohort_week`), and activity is counted per
    * (cohort_week, week_offset) cell — the classic retention triangle.
    *
    * Two shuffles on user_id (first-seen agg + the enrich join, which
    * AQE plans as a broadcast when the user dimension is small) and
    * one on the output cell key; distinct-user counting collapses
    * map-side per cell. Output: cohort_week, week_offset, n_users,
    * n_events. */
  def cohortRetention(events: DataFrame,
      weekMs: Long = 604800000L): DataFrame = {
    val ev = events.select(col("user_id"),
      expr(s"tsMs div $weekMs").as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(first, "user_id")
      .withColumn("week_offset", col("wk") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Ordered funnel: for each user, the first time each step in
    * `steps` was reached, where step i counts only at/after the
    * reach-time of step i−1 (a click before the first view is NOT a
    * funnel click). `stage` = number of steps reached. One aggregate
    * pass per step — each a user_id shuffle with map-side partial
    * min — no window, no per-user event collection, no self-join.
    * Output: user_id, <step>_ms per step (null = not reached), stage. */
  def funnelStages(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val ev = events.select("user_id", "event_type", "tsMs")
    val msCol = (st: String) => s"${st}_ms"
    val head = ev.groupBy("user_id").agg(
      min(when(col("event_type") === steps.head, col("tsMs")))
        .as(msCol(steps.head)))
    val reached = steps.tail.foldLeft((head, List(msCol(steps.head)))) {
      case ((acc, prevCols), step) =>
        val next = ev.join(acc, "user_id")
          .groupBy("user_id", prevCols.reverse: _*)
          .agg(min(when(col("event_type") === step &&
            col("tsMs") >= col(prevCols.head), col("tsMs"))).as(msCol(step)))
        (next, msCol(step) :: prevCols)
    }._1
    // forward fold ⇒ the LAST step's check ends up outermost, so the
    // deepest reached step wins (reach times are monotone by
    // construction: step i null ⇒ step i+1 null)
    val stage = steps.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (st, i)) =>
        when(col(msCol(st)).isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    reached.select(col("user_id") +: steps.map(st => col(msCol(st))) :+
      stage.as("stage"): _*)
  }
}
