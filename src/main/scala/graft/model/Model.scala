package graft.model

/** Data model for the job-history analytics engine.
  *
  * Mirrors the reference's Avro record shapes (WHAT it stores), expressed
  * as Scala case classes with Spark `Encoder`-friendly types (HOW we store
  * them):
  *  - `LogData.avsc:17-142` → [[Job]] ⊃ [[Task]] ⊃ [[Attempt]]
  *  - `Stats.avsc:22-65`    → [[HourlyUsage]] (key+value flattened)
  *  - `JobConf.avsc:17-38`  → [[JobConfRec]]
  *
  * The reference shuffles a tagged union LogData ∈ {Job,Task,Attempt};
  * we keep three parsed-line Datasets instead (see SURVEY.md §1.2) and
  * only build the nested tree at assembly time.
  *
  * All times are epoch milliseconds UTC (`LogData.avsc:52-58`); the fact
  * table converts to TimestampType at the boundary.
  */

/** Task status / job status domain. The reference's log format emits
  * `SUCCESS|FAILURE|FAILED|KILLED`; its enum only has SUCCESS/FAILED/KILLED
  * (`LogData.avsc:46-49,113-119`), so `FAILURE` is normalized to `FAILED`
  * (see SURVEY.md §7.1 step 2).
  */
object Status {
  val Success = "SUCCESS"
  val Failed  = "FAILED"
  val Killed  = "KILLED"
  def normalize(raw: String): Option[String] = raw match {
    case "SUCCESS"             => Some(Success)
    case "FAILED" | "FAILURE"  => Some(Failed)
    case "KILLED"              => Some(Killed)
    case _                     => None
  }
}

object TaskType {
  val Map    = "MAP"
  val Reduce = "REDUCE"
}

/** One parsed `Job JOBID="…"` history line (reference parser:
  * `parsing/LineParsing.java:53-156`). A job's state is spread over many
  * such lines; they are merged by [[graft.etl.JobAssembly]].
  */
final case class JobLine(
    jobId: String,
    user: Option[String],
    jobName: Option[String],
    jobQueue: Option[String],
    status: Option[String],
    submitTime: Option[Long],
    launchTime: Option[Long],
    finishTime: Option[Long],
    totalMaps: Option[Int],
    totalReduces: Option[Int],
    finishedMaps: Option[Int],
    finishedReduces: Option[Int],
    failedMaps: Option[Int],
    failedReduces: Option[Int])

/** One parsed `Task TASKID="…"` line (`LineParsing.java:267-338`). */
final case class TaskLine(
    taskId: String,
    jobId: String,
    taskType: String,
    status: Option[String],
    startTime: Option[Long],
    finishTime: Option[Long])

/** One parsed `(Map|Reduce)Attempt` line (`LineParsing.java:158-260`). */
final case class AttemptLine(
    taskAttemptId: String,
    taskId: String,
    jobId: String,
    taskType: String,
    status: Option[String],
    startTime: Option[Long],
    finishTime: Option[Long],
    shuffleFinished: Option[Long],
    sortFinished: Option[Long],
    counters: Map[String, Long])

/** Fully merged attempt (`LogData.avsc` Attempt record + derived fields
  * from `ParseJobsFromLogs.java:715-731`). `excess` marks attempts whose
  * work was wasted (speculative / failed duplicates,
  * `ParseJobsFromLogs.java:696-759`).
  */
final case class Attempt(
    taskAttemptId: String,
    taskType: String,
    status: String,
    startTime: Long,
    finishTime: Long,
    shuffleFinished: Option[Long],
    sortFinished: Option[Long],
    counters: Map[String, Long],
    excess: Boolean,
    minutes: Double,
    cpuMinutes: Option[Double])

final case class Task(
    taskId: String,
    taskType: String,
    status: Option[String],
    startTime: Option[Long],
    finishTime: Option[Long],
    attempts: Seq[Attempt])

final case class Job(
    jobId: String,
    cluster: String,
    user: Option[String],
    jobName: Option[String],
    jobQueue: Option[String],
    status: Option[String],
    submitTime: Option[Long],
    launchTime: Option[Long],
    finishTime: Option[Long],
    totalMaps: Option[Int],
    totalReduces: Option[Int],
    finishedMaps: Option[Int],
    finishedReduces: Option[Int],
    failedMaps: Option[Int],
    failedReduces: Option[Int],
    tasks: Seq[Task])

/** Job configuration record (`JobConf.avsc:17-38`). */
final case class JobConfRec(
    jobId: String,
    cluster: String,
    path: String,
    configuration: Map[String, String])

/** One hour-grain fact row — the reference's `AttemptStatsKey` +
  * `AttemptStatsValue` pair (`Stats.avsc:22-65`) flattened, plus
  * `spilledRecords` which the reference computes but drops at serving
  * load (`server/app/usage_file_load_task.rb:107-121`; SURVEY.md §1.4).
  *
  * `time` is the hour-start epoch ms, UTC
  * (`analysis/ComputeUsagePerHour.java:340-376`).
  */
final case class HourlyUsage(
    user: String,
    time: Long,
    cluster: String,
    excess: Boolean,
    taskType: String,
    status: String,
    started: Int,
    finished: Int,
    elapsedMinutes: Double,
    cpuMinutes: Option[Double],
    spilledRecords: Option[Double],
    reduceShuffleBytes: Option[Long])
