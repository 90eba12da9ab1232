package graft.parse

import graft.model._

/** Pure parsers for Hadoop 1.x JobTracker history log lines.
  *
  * Behavior matches the reference's regex parsers
  * (`hadoop/src/java/com/linkedin/whiteelephant/parsing/LineParsing.java:44-338`):
  *  - `\"` escape sequences are stripped before matching (`:56,161,270`);
  *  - parameters are `KEY="value"` pairs with upper-snake keys (`:47`);
  *  - counters are `[(NAME)(Display Name)(value)]` groups (`:48,186-193`);
  *  - an attempt/task's jobId is derived from its taskId
  *    (`task_(\d+_\d+)_[mr]_\d+` → `job_$1`, `:49,195-209`);
  *  - a line is tried as Job → Attempt → Task in that order
  *    (`ParseJobsFromLogs.java:209-219`) — [[parseLine]] preserves this.
  *
  * Deviation (documented in SURVEY.md §7.4): statuses are normalized
  * through [[graft.model.Status.normalize]] so the `FAILURE` literal the
  * log format emits maps onto the engine's FAILED value instead of
  * crashing enum conversion.
  *
  * These are plain Scala functions so they unit-test without a
  * SparkSession and run inside `Dataset.flatMap` (no UDF wrapping, no
  * serialization surprises).
  */
object LineParsing {

  private val ParamRx   = """([A-Z_]+)="([^"]*)"""".r
  private val JobIdRx   = """job_\d+_\d+""".r
  private val JobLineRx = """^Job JOBID="(job_\d+_\d+)"""".r
  private val AttemptLineRx =
    """^(?:Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)"""".r
  private val TaskLineRx = """^Task TASKID="(task_\d+_\d+_[mr]_\d+)" TASK_TYPE="(MAP|REDUCE)"""".r
  private val TaskIdToJobRx = """task_(\d+_\d+)_[mr]_\d+""".r
  private val CounterRx = """\[\(([A-Z_]+)\)\((.+?)\)\((\d+)\)\]""".r

  /** Strip escaped quotes so quoted-value regexes don't terminate early
    * (reference `LineParsing.java:56`). */
  def scrub(line: String): String = line.replace("\\\"", "")

  /** All `KEY="value"` parameters on the line. */
  def params(line: String): Map[String, String] =
    ParamRx.findAllMatchIn(line).map(m => m.group(1) -> m.group(2)).toMap

  /** Counters block → name→value map (`LineParsing.java:186-193`). */
  def counters(countersField: String): Map[String, Long] =
    CounterRx
      .findAllMatchIn(countersField)
      .map(m => m.group(1) -> m.group(3).toLong)
      .toMap

  private def jobIdOfTask(taskId: String): Option[String] =
    TaskIdToJobRx.findFirstMatchIn(taskId).map(m => s"job_${m.group(1)}")

  private def longOf(p: Map[String, String], k: String): Option[Long] =
    p.get(k).flatMap(v => v.toLongOption)

  private def intOf(p: Map[String, String], k: String): Option[Int] =
    p.get(k).flatMap(v => v.toIntOption)

  /** Job lines: `^Job JOBID="…"`, or any line carrying `USER=` plus a
    * job id (`LineParsing.java:45-46,53-97`). */
  def parseJobLine(raw: String): Option[JobLine] = {
    val line = scrub(raw)
    val jobId: Option[String] = JobLineRx.findFirstMatchIn(line) match {
      case Some(m) => Some(m.group(1))
      case None =>
        if (line.contains("USER=")) JobIdRx.findFirstIn(line) else None
    }
    jobId.map { id =>
      val p = params(line)
      JobLine(
        jobId = id,
        user = p.get("USER"),
        jobName = p.get("JOBNAME"),
        jobQueue = p.get("JOB_QUEUE"),
        status = p.get("JOB_STATUS").flatMap(Status.normalize),
        submitTime = longOf(p, "SUBMIT_TIME"),
        launchTime = longOf(p, "LAUNCH_TIME"),
        finishTime = longOf(p, "FINISH_TIME"),
        totalMaps = intOf(p, "TOTAL_MAPS"),
        totalReduces = intOf(p, "TOTAL_REDUCES"),
        finishedMaps = intOf(p, "FINISHED_MAPS"),
        finishedReduces = intOf(p, "FINISHED_REDUCES"),
        failedMaps = intOf(p, "FAILED_MAPS"),
        failedReduces = intOf(p, "FAILED_REDUCES"))
    }
  }

  /** Attempt lines: `^(Map|Reduce)Attempt TASK_TYPE="…"`
    * (`LineParsing.java:158-260`). Requires taskId + attemptId; drops
    * truncated fragments (`ParseJobsFromLogs.java:231-262`, F1). */
  def parseAttemptLine(raw: String): Option[AttemptLine] = {
    val line = scrub(raw)
    AttemptLineRx.findFirstMatchIn(line).flatMap { m =>
      val taskType = m.group(1)
      val p = params(line)
      for {
        taskId    <- p.get("TASKID")
        attemptId <- p.get("TASK_ATTEMPT_ID")
        jobId     <- jobIdOfTask(taskId)
      } yield AttemptLine(
        taskAttemptId = attemptId,
        taskId = taskId,
        jobId = jobId,
        taskType = taskType,
        status = p.get("TASK_STATUS").flatMap(Status.normalize),
        startTime = longOf(p, "START_TIME"),
        finishTime = longOf(p, "FINISH_TIME"),
        shuffleFinished = longOf(p, "SHUFFLE_FINISHED"),
        sortFinished = longOf(p, "SORT_FINISHED"),
        counters = p.get("COUNTERS").map(counters).getOrElse(Map.empty))
    }
  }

  /** Task lines: `^Task TASKID="…" TASK_TYPE="…"`
    * (`LineParsing.java:267-338`). */
  def parseTaskLine(raw: String): Option[TaskLine] = {
    val line = scrub(raw)
    TaskLineRx.findFirstMatchIn(line).flatMap { m =>
      val taskId = m.group(1)
      val p = params(line)
      jobIdOfTask(taskId).map { jobId =>
        TaskLine(
          taskId = taskId,
          jobId = jobId,
          taskType = m.group(2),
          status = p.get("TASK_STATUS").flatMap(Status.normalize),
          startTime = longOf(p, "START_TIME"),
          finishTime = longOf(p, "FINISH_TIME"))
      }
    }
  }

  /** Tagged parse result for a single-pass scan over a log file. */
  sealed trait Parsed extends Product with Serializable
  final case class PJob(value: JobLine) extends Parsed
  final case class PTask(value: TaskLine) extends Parsed
  final case class PAttempt(value: AttemptLine) extends Parsed

  /** Try Job → Attempt → Task, like the reference mapper
    * (`ParseJobsFromLogs.java:209-219`); unparseable lines yield None. */
  def parseLine(raw: String): Option[Parsed] =
    parseJobLine(raw)
      .map(PJob(_): Parsed)
      .orElse(parseAttemptLine(raw).map(PAttempt(_): Parsed))
      .orElse(parseTaskLine(raw).map(PTask(_): Parsed))
}
