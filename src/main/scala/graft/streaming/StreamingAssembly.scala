package graft.streaming

import graft.etl.JobAssembly
import graft.model._
import graft.parse.LineParsing
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming job-tree assembly — the stateful piece the batch path does
  * with `groupByKey.mapGroups` ([[JobAssembly.assembleJobs]]), running
  * incrementally: history-log fragments for one jobId arrive across
  * micro-batches; state accumulates them; the assembled [[Job]] is
  * emitted when the job reaches a final state (status + finishTime
  * together — the reference's "only the final state has both",
  * `ParseJobsFromLogs.java:384-389`). Jobs that never reach a final
  * state (truncated logs) are NOT emitted by the stream; they surface
  * through the batch trailing-window reprocess (T5), which assembles
  * whatever fragments exist — the same division of labor as the
  * reference (its loader also only saw completed day files).
  *
  * State size is bounded by fragments-per-job (≈ tasks×attempts×3
  * lines), and keys expire on emit — the state store holds only
  * in-flight jobs, not history.
  */
object StreamingAssembly {

  /** Accumulated fragments for one in-flight job. */
  final case class Frags(
      jobs: Seq[JobLine], tasks: Seq[TaskLine], attempts: Seq[AttemptLine]) {
    def add(p: LineParsing.Parsed): Frags = p match {
      case LineParsing.PJob(j)     => copy(jobs = jobs :+ j)
      case LineParsing.PTask(t)    => copy(tasks = tasks :+ t)
      case LineParsing.PAttempt(a) => copy(attempts = attempts :+ a)
    }
    def isFinal: Boolean =
      jobs.exists(j => j.status.isDefined && j.finishTime.isDefined)
  }
  object Frags { val empty: Frags = Frags(Nil, Nil, Nil) }

  /** The per-key state function. Emits zero or one assembled Job per
    * invocation. */
  def assembleFn(cluster: String)(
      jobId: String,
      lines: Iterator[String],
      state: GroupState[Frags]): Iterator[Job] = {
    val merged = lines
      .flatMap(LineParsing.parseLine(_))
      .foldLeft(state.getOption.getOrElse(Frags.empty))(_ add _)
    if (merged.isFinal) {
      state.remove()
      Iterator.single(JobAssembly.assemble(
        jobId, cluster, merged.jobs, merged.tasks, merged.attempts))
    } else {
      state.update(merged)
      Iterator.empty
    }
  }

  /** Wire the stateful assembly over a (possibly streaming) Dataset of
    * raw log lines. Works identically on a static Dataset (state
    * machinery runs once over the whole input). */
  def assembleJobsStream(lines: Dataset[String], cluster: String)(
      implicit spark: SparkSession): Dataset[Job] = {
    import spark.implicits._
    lines
      .flatMap(raw => LineParsing.parseLine(raw).map(_ => raw))
      .groupByKey { raw =>
        LineParsing.parseLine(raw) match {
          case Some(LineParsing.PJob(j))     => j.jobId
          case Some(LineParsing.PTask(t))    => t.jobId
          case Some(LineParsing.PAttempt(a)) => a.jobId
          case None                          => ""
        }
      }
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        assembleFn(cluster))
  }
}
