package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel — the incremental form of
  * [[graft.operators.EventAnalytics.funnelStages]]: per-user events are
  * buffered in state while they may still be re-ordered (the watermark
  * lateness window), and the funnel is computed ONCE, in event-time
  * order, when the watermark passes the user's last activity +
  * lateness. Emit-on-timeout makes the result EXACTLY the batch
  * funnel over the same events — a late-arriving first view
  * re-anchors the clicks after it, which a fold-as-they-arrive design
  * would get wrong (it would have already rejected them).
  *
  * State is O(funnel-step events per user per lateness window) — only
  * events whose type is a funnel step are buffered, everything else is
  * filtered before the shuffle — and every key expires at its timeout,
  * so the store never accumulates history. Same T5-style contract as
  * [[StreamingAssembly]]: event-time timeout only (processing-time
  * timeouts livelock `processAllAvailable`), late events beyond the
  * window are engine-dropped.
  */
object StreamingFunnel {

  /** One funnel-relevant event, keyed and timestamped for the stateful
    * shuffle. `stepIdx` = position in the funnel step list. */
  final case class StepEvent(user_id: Long, stepIdx: Int, ts: Timestamp,
      tsMs: Long)

  /** Buffered per-user state: (stepIdx, tsMs) pairs + max event time. */
  final case class Buffered(events: Seq[(Int, Long)], maxEventMs: Long)
  object Buffered { val empty: Buffered = Buffered(Nil, 0L) }

  /** Emitted per-user result: first-reach ms per step (-1 = not
    * reached; sentinel because Seq[Option[Long]] encodes poorly),
    * stage = deepest step reached. */
  final case class Reach(user_id: Long, reachMs: Seq[Long], stage: Long)

  /** The batch fold, applied to the buffered events in (tsMs, stepIdx)
    * order: step 0's first event anchors, step i counts at/after step
    * i-1's reach time. Processing same-ms events in step order makes
    * `>=` behave exactly like the batch operator's three aggregate
    * passes (a click at the same ms as the first view qualifies). */
  def fold(nSteps: Int, events: Seq[(Int, Long)]): Reach = {
    val reach = Array.fill(nSteps)(-1L)
    events.sortBy { case (i, ms) => (ms, i) }.foreach { case (i, ms) =>
      if (reach(i) < 0 && (i == 0 || reach(i - 1) >= 0) &&
        (i == 0 || ms >= reach(i - 1))) reach(i) = ms
    }
    Reach(0L, reach.toSeq, reach.lastIndexWhere(_ >= 0) + 1L)
  }

  def funnelFn(nSteps: Int, latenessMs: Long, useTimeout: Boolean)(
      userId: Long,
      events: Iterator[StepEvent],
      state: GroupState[Buffered]): Iterator[Reach] = {
    if (useTimeout && state.hasTimedOut) {
      val st = state.getOption.getOrElse(Buffered.empty)
      state.remove()
      Iterator.single(fold(nSteps, st.events).copy(user_id = userId))
    } else {
      val prev = state.getOption.getOrElse(Buffered.empty)
      val (evs, maxMs) = events.foldLeft((prev.events, prev.maxEventMs)) {
        case ((acc, mx), e) => (acc :+ (e.stepIdx, e.tsMs), math.max(mx, e.tsMs))
      }
      if (useTimeout) {
        state.update(Buffered(evs, maxMs))
        state.setTimeoutTimestamp(math.max(
          maxMs + latenessMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty
      } else {
        // static execution: the whole history is present — emit now
        state.remove()
        Iterator.single(fold(nSteps, evs).copy(user_id = userId))
      }
    }
  }

  /** Wire the stateful funnel over a (possibly streaming) event feed
    * with columns (user_id LONG, event_type STRING, ts TIMESTAMP,
    * tsMs LONG). Output columns match the batch operator exactly:
    * user_id, <step>_ms per step (null = not reached), stage. */
  def funnel(events: DataFrame, steps: Seq[String],
      latenessMs: Long)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty, "at least one funnel step")
    val idx = typedLit(steps.zipWithIndex.toMap)
    val streaming = events.isStreaming
    val stepEvents: Dataset[StepEvent] = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), idx(col("event_type")).as("stepIdx"),
        col("ts"), col("tsMs"))
      .withWatermark("ts", s"${latenessMs / 1000} seconds")
      .as[StepEvent]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val reached = stepEvents
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        funnelFn(steps.size, latenessMs, streaming))
    reached.select(col("user_id") +: steps.zipWithIndex.map { case (st, i) =>
      when(col("reachMs")(i) >= 0, col("reachMs")(i)).as(s"${st}_ms")
    } :+ col("stage"): _*)
  }
}
