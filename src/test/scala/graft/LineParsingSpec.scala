package graft

import graft.model._
import graft.parse.LineParsing
import org.scalatest.funsuite.AnyFunSuite

/** Fixture lines from FIXTURES.md §1 (Hadoop 1.x job-history format). */
class LineParsingSpec extends AnyFunSuite {

  val jobLine1 =
    """Job JOBID="job_201301280000_0001" JOBNAME="word count" USER="alice" SUBMIT_TIME="1359385200000" JOB_QUEUE="default" ."""
  val jobLine3 =
    """Job JOBID="job_201301280000_0001" FINISH_TIME="1359389100000" JOB_STATUS="SUCCESS" FINISHED_MAPS="4" FINISHED_REDUCES="2" FAILED_MAPS="0" FAILED_REDUCES="0" ."""
  val taskLine =
    """Task TASKID="task_201301280000_0001_m_000000" TASK_TYPE="MAP" START_TIME="1359385215000" ."""
  val mapAttempt =
    """MapAttempt TASK_TYPE="MAP" TASKID="task_201301280000_0001_m_000000" TASK_ATTEMPT_ID="attempt_201301280000_0001_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="1359390000000" COUNTERS="[(CPU_MILLISECONDS)(CPU time spent)(4200000)][(SPILLED_RECORDS)(Spilled Records)(1200)]" ."""
  val reduceAttempt =
    """ReduceAttempt TASK_TYPE="REDUCE" TASKID="task_201301280000_0001_r_000000" TASK_ATTEMPT_ID="attempt_201301280000_0001_r_000000_0" START_TIME="1359386000000" SHUFFLE_FINISHED="1359387000000" SORT_FINISHED="1359387500000" TASK_STATUS="KILLED" FINISH_TIME="1359388000000" COUNTERS="[(REDUCE_SHUFFLE_BYTES)(Reduce shuffle bytes)(104857600)][(CPU_MILLISECONDS)(CPU time spent)(900000)]" ."""

  test("job line: header fields") {
    val j = LineParsing.parseJobLine(jobLine1).get
    assert(j.jobId == "job_201301280000_0001")
    assert(j.user.contains("alice"))
    assert(j.jobName.contains("word count"))
    assert(j.jobQueue.contains("default"))
    assert(j.submitTime.contains(1359385200000L))
    assert(j.status.isEmpty && j.finishTime.isEmpty)
  }

  test("job line: final status fields") {
    val j = LineParsing.parseJobLine(jobLine3).get
    assert(j.status.contains(Status.Success))
    assert(j.finishTime.contains(1359389100000L))
    assert(j.finishedMaps.contains(4) && j.failedReduces.contains(0))
  }

  test("FAILURE literal is normalized to FAILED (reference enum crash)") {
    val line =
      """Job JOBID="job_1_2" USER="bob" JOB_STATUS="FAILURE" FINISH_TIME="5" ."""
    assert(LineParsing.parseJobLine(line).get.status.contains(Status.Failed))
  }

  test("job id via USER= fallback (no ^Job prefix)") {
    val line = """JobStatusChanged USER="carol" JOB="job_42_7" ."""
    assert(LineParsing.parseJobLine(line).get.jobId == "job_42_7")
  }

  test("task line: jobId derived from taskId") {
    val t = LineParsing.parseTaskLine(taskLine).get
    assert(t.jobId == "job_201301280000_0001")
    assert(t.taskType == TaskType.Map)
    assert(t.startTime.contains(1359385215000L))
    assert(t.status.isEmpty)
  }

  test("map attempt: counters parsed") {
    val a = LineParsing.parseAttemptLine(mapAttempt).get
    assert(a.taskAttemptId == "attempt_201301280000_0001_m_000000_0")
    assert(a.jobId == "job_201301280000_0001")
    assert(a.counters == Map(
      "CPU_MILLISECONDS" -> 4200000L, "SPILLED_RECORDS" -> 1200L))
    assert(a.status.contains(Status.Success))
  }

  test("reduce attempt: shuffle/sort times") {
    val a = LineParsing.parseAttemptLine(reduceAttempt).get
    assert(a.taskType == TaskType.Reduce)
    assert(a.shuffleFinished.contains(1359387000000L))
    assert(a.sortFinished.contains(1359387500000L))
    assert(a.status.contains(Status.Killed))
    assert(a.counters("REDUCE_SHUFFLE_BYTES") == 104857600L)
  }

  test("truncated attempt without TASKID is dropped") {
    val line = """MapAttempt TASK_TYPE="MAP" TASK_STATUS="SUCCESS" ."""
    assert(LineParsing.parseAttemptLine(line).isEmpty)
  }

  test("escaped quotes are scrubbed before matching") {
    val line =
      "Job JOBID=\"job_1_1\" USER=\"dave\" JOBNAME=\"my \\\"cool\\\" job\" ."
    val j = LineParsing.parseJobLine(line).get
    // the scrub deletes the \" sequences entirely, so the quoted value
    // survives un-terminated — reference behavior (LineParsing.java:56)
    assert(j.jobName.contains("my cool job"))
  }

  test("parseLine dispatch order: Job, then Attempt, then Task") {
    assert(LineParsing.parseLine(jobLine1).get.isInstanceOf[LineParsing.PJob])
    assert(LineParsing.parseLine(mapAttempt).get.isInstanceOf[LineParsing.PAttempt])
    assert(LineParsing.parseLine(taskLine).get.isInstanceOf[LineParsing.PTask])
    assert(LineParsing.parseLine("garbage line").isEmpty)
  }
}
