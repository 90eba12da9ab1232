package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val W = 604800000L // one week of ms

  test("cohortRetention: first-seen week anchors the offsets") {
    val ev = Seq(
      (1L, 0L * W + 5),      // user 1 first seen week 0
      (1L, 2L * W + 9),      //   active again week 2 → offset 2
      (2L, 2L * W + 1),      // user 2 first seen week 2
      (2L, 2L * W + 2),      //   twice in the cohort week
      (2L, 3L * W))          //   offset 1
      .toDF("user_id", "tsMs")
    val got = EventAnalytics.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((0L, 0L)) == ((1L, 1L))) // user 1, week 0
    assert(got((0L, 2L)) == ((1L, 1L)))
    assert(got((2L, 0L)) == ((1L, 2L))) // user 2: two events, one user
    assert(got((2L, 1L)) == ((1L, 1L)))
    assert(got.size == 4)
  }

  test("funnelStages: ordering is enforced, stage = deepest step") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE first view — not a funnel click → stage 1
      (2L, "click", 50L), (2L, "view", 100L),
      // user 3: purchase without view → stage 0, all nulls
      (3L, "purchase", 10L),
      // user 4: click at the SAME ms as view (>= allows it), no purchase
      (4L, "view", 500L), (4L, "click", 500L),
      // user 5: second view is followed by a click, but the funnel
      // anchors at the FIRST view, so the click still counts
      (5L, "view", 100L), (5L, "view", 900L), (5L, "click", 400L))
      .toDF("user_id", "event_type", "tsMs")
    val got = EventAnalytics
      .funnelStages(ev, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toMap
    assert(got(1L) == ((Some(100L), Some(200L), Some(300L), 3L)))
    assert(got(2L) == ((Some(100L), None, None, 1L)))
    assert(got(3L) == ((None, None, None, 0L)))
    assert(got(4L) == ((Some(500L), Some(500L), None, 2L)))
    assert(got(5L) == ((Some(100L), Some(400L), None, 2L)))
  }

  test("funnelStages: single-step funnel degenerates to first-seen") {
    val ev = Seq((1L, "view", 7L), (1L, "view", 3L), (2L, "click", 1L))
      .toDF("user_id", "event_type", "tsMs")
    val got = EventAnalytics.funnelStages(ev, Seq("view")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), r.getLong(2))).toMap
    assert(got(1L) == ((Some(3L), 1L)))
    assert(got(2L) == ((None, 0L)))
  }
}
