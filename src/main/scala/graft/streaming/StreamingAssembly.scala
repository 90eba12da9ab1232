package graft.streaming

import graft.etl.JobAssembly
import graft.model._
import graft.parse.LineParsing
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** Streaming job-tree assembly — the stateful piece the batch path does
  * with `groupByKey.mapGroups` ([[JobAssembly.assembleJobs]]), running
  * incrementally: history-log fragments for one jobId arrive across
  * micro-batches; state accumulates them; the assembled [[Job]] is
  * emitted when the job reaches a final state (status + finishTime
  * together — the reference's "only the final state has both",
  * `ParseJobsFromLogs.java:384-389`).
  *
  * Jobs that never reach a final state (truncated logs) are flushed by
  * an EVENT-TIME timeout: when the watermark passes
  * last-fragment-time + 5 days (the reference's late-data window,
  * `base.properties:21`, T5), the partial tree is emitted as-is and the
  * key expires — the state store holds only in-flight jobs, never
  * history. (Processing-time timeouts are deliberately not used: the
  * engine keeps scheduling wake-ups under `processAllAvailable`, which
  * livelocks tests; event-time timeouts only fire when data moves the
  * watermark.)
  *
  * Fragments older than the watermark are dropped INSIDE the state
  * function — the same 5-day late-arrival contract as the batch
  * trailing-window reprocess. The engine does NOT pre-filter late
  * input for `flatMapGroupsWithState` (it only does so for stateful
  * aggregations/dedup); without the explicit drop, a burst of 5+
  * day-late fragments would mint a fresh state group per stale jobId
  * and re-emit long-completed jobs on timeout — unbounded state growth
  * under replay, measured by the StreamSoak late-burst stage.
  *
  * Lines are parsed ONCE into a sparse union [[Fragment]] (same
  * Encoder-friendly shape the batch shuffle uses) — key extraction and
  * assembly reuse the parsed record.
  */
object StreamingAssembly {

  /** T5: the reference reprocesses a 5-day trailing window. */
  val DefaultLatenessMs: Long = 5L * 24 * 60 * 60 * 1000

  /** One parsed fragment, keyed and timestamped for the stateful
    * shuffle. `ts` = the fragment's own latest timestamp (its event
    * time). Fragments whose lines carry no timestamps inherit the
    * running max event time of their partition (history-log lines are
    * chronological within a file), so they ride the watermark with
    * their neighbors instead of being stamped epoch-0 and silently
    * late-dropped; a fragment before ANY timestamped line still gets
    * the epoch — counted by the `epochTsFragments` observed metric so
    * the loss is visible. */
  final case class Fragment(
      jobId: String,
      ts: Timestamp,
      job: Option[JobLine],
      task: Option[TaskLine],
      attempt: Option[AttemptLine])

  def toFragment(p: LineParsing.Parsed): Fragment = p match {
    case LineParsing.PJob(j) =>
      Fragment(j.jobId, new Timestamp(maxDefined(
        j.submitTime, j.launchTime, j.finishTime)), Some(j), None, None)
    case LineParsing.PTask(t) =>
      Fragment(t.jobId, new Timestamp(maxDefined(
        t.startTime, t.finishTime)), None, Some(t), None)
    case LineParsing.PAttempt(a) =>
      Fragment(a.jobId, new Timestamp(maxDefined(
        a.startTime, a.finishTime, a.shuffleFinished, a.sortFinished)),
        None, None, Some(a))
  }

  private def maxDefined(ts: Option[Long]*): Long =
    ts.flatten.foldLeft(0L)(math.max)

  /** Accumulated fragments for one in-flight job. */
  final case class Frags(
      jobs: Seq[JobLine], tasks: Seq[TaskLine], attempts: Seq[AttemptLine],
      maxEventMs: Long) {
    def add(f: Fragment): Frags = {
      val bumped = math.max(maxEventMs, f.ts.getTime)
      f match {
        case Fragment(_, _, Some(j), _, _) =>
          copy(jobs = jobs :+ j, maxEventMs = bumped)
        case Fragment(_, _, _, Some(t), _) =>
          copy(tasks = tasks :+ t, maxEventMs = bumped)
        case Fragment(_, _, _, _, Some(a)) =>
          copy(attempts = attempts :+ a, maxEventMs = bumped)
        case _ => copy(maxEventMs = bumped)
      }
    }
    def isFinal: Boolean =
      jobs.exists(j => j.status.isDefined && j.finishTime.isDefined)
  }
  object Frags { val empty: Frags = Frags(Nil, Nil, Nil, 0L) }

  /** The per-key state function. Emits zero or one assembled Job per
    * invocation: complete on final state, truncated on event-time
    * timeout. `useTimeout` is false under batch execution, where
    * timeouts don't exist (static runs assemble everything in one
    * pass anyway). */
  def assembleFn(cluster: String, latenessMs: Long, useTimeout: Boolean)(
      jobId: String,
      frags: Iterator[Fragment],
      state: GroupState[Frags]): Iterator[Job] = {
    if (useTimeout && state.hasTimedOut) {
      // watermark passed last activity + lateness: flush the partial
      // tree (assemble synthesizes the missing job line)
      val st = state.getOption.getOrElse(Frags.empty)
      state.remove()
      Iterator.single(JobAssembly.assemble(
        jobId, cluster, st.jobs, st.tasks, st.attempts))
    } else {
      // Enforce the late-arrival contract ourselves: the engine does
      // not watermark-filter flatMapGroupsWithState input. ts >= wm
      // keeps everything in batch mode (wm stays Long.MinValue).
      val wm = if (useTimeout) state.getCurrentWatermarkMs() else Long.MinValue
      var sawLive = false
      val live = frags.filter { f =>
        val ok = f.ts.getTime >= wm
        if (ok) sawLive = true
        ok
      }
      // Merge via per-invocation buffers, NOT per-fragment Seq :+
      // (Frags.add): on the restored state the decoded Seq is array-
      // backed, so :+ copies the whole collection per fragment —
      // O(fragments²) for a single hot jobId. A skewed stream where
      // one job carries 40% of fragment mass (the StreamSoak
      // assembly_skew stage) turns that into minutes per micro-batch;
      // buffering is one O(state)+O(new) pass per invocation.
      val st = state.getOption.getOrElse(Frags.empty)
      val jb = ArrayBuffer.empty[JobLine] ++= st.jobs
      val tb = ArrayBuffer.empty[TaskLine] ++= st.tasks
      val ab = ArrayBuffer.empty[AttemptLine] ++= st.attempts
      var maxEv = st.maxEventMs
      live.foreach { f =>
        maxEv = math.max(maxEv, f.ts.getTime)
        if (f.job.isDefined) jb += f.job.get
        else if (f.task.isDefined) tb += f.task.get
        else if (f.attempt.isDefined) ab += f.attempt.get
      }
      val merged = Frags(jb.toVector, tb.toVector, ab.toVector, maxEv)
      if (!sawLive && state.getOption.isEmpty) {
        // every fragment was late and no job is in flight: leave no
        // trace (creating state here is exactly the replay leak)
        Iterator.empty
      } else if (merged.isFinal) {
        state.remove()
        Iterator.single(JobAssembly.assemble(
          jobId, cluster, merged.jobs, merged.tasks, merged.attempts))
      } else {
        state.update(merged)
        if (useTimeout) {
          // never earlier than the current watermark (a very late
          // fragment could otherwise set an already-passed timeout)
          state.setTimeoutTimestamp(math.max(
            merged.maxEventMs + latenessMs, state.getCurrentWatermarkMs() + 1))
        }
        Iterator.empty
      }
    }
  }

  /** Wire the stateful assembly over a (possibly streaming) Dataset of
    * raw log lines. Works identically on a static Dataset (state
    * machinery runs once over the whole input; watermark/timeout are
    * no-ops there). */
  def assembleJobsStream(lines: Dataset[String], cluster: String,
      latenessMs: Long = DefaultLatenessMs)(
      implicit spark: SparkSession): Dataset[Job] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, when}
    val streaming = lines.isStreaming
    val frags = lines
      .mapPartitions { it =>
        var runMax = 0L
        it.flatMap(raw => LineParsing.parseLine(raw).map { p =>
          val f = toFragment(p)
          if (f.ts.getTime == 0L) f.copy(ts = new Timestamp(runMax))
          else { runMax = math.max(runMax, f.ts.getTime); f }
        })
      }
      .observe("graft_assembly",
        count(when(col("ts") === lit(new Timestamp(0L)), 1))
          .as("epochTsFragments"))
      .withWatermark("ts", s"${latenessMs / 1000} seconds")
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    frags
      .groupByKey(_.jobId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        assembleFn(cluster, latenessMs, streaming))
  }
}
