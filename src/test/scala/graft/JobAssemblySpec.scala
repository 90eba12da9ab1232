package graft

import graft.etl.JobAssembly
import graft.model._
import graft.parse.LineParsing
import org.scalatest.funsuite.AnyFunSuite

class JobAssemblySpec extends AnyFunSuite {

  private def attLine(id: String, task: String, status: Option[String],
      start: Option[Long], finish: Option[Long],
      counters: Map[String, Long] = Map.empty): AttemptLine =
    AttemptLine(id, task, "job_1_1", "MAP", status, start, finish,
      None, None, counters)

  test("attempt fragment merge: max times, last status, last counters (A3)") {
    val merged = JobAssembly.mergeAttemptLines(Seq(
      attLine("a0", "t0", None, Some(100L), None),
      attLine("a0", "t0", Some("SUCCESS"), Some(50L), Some(500L),
        Map("CPU_MILLISECONDS" -> 60000L))))
    assert(merged.startTime.contains(100L)) // max wins
    assert(merged.finishTime.contains(500L))
    assert(merged.status.contains("SUCCESS"))
    assert(merged.counters("CPU_MILLISECONDS") == 60000L)
  }

  test("invalid attempts dropped: missing status/times, finish<start (A4)") {
    assert(!JobAssembly.isValidAttempt(attLine("a", "t", None, Some(1L), Some(2L))))
    assert(!JobAssembly.isValidAttempt(attLine("a", "t", Some("SUCCESS"), None, Some(2L))))
    assert(!JobAssembly.isValidAttempt(
      attLine("a", "t", Some("SUCCESS"), Some(5L), Some(2L))))
    assert(!JobAssembly.isValidAttempt(
      attLine("a", "t", Some("SUCCESS"), Some(0L), Some(2L))))
    assert(JobAssembly.isValidAttempt(
      attLine("a", "t", Some("SUCCESS"), Some(2L), Some(2L))))
  }

  test("excess marking: killed-then-success → killed is excess (A5)") {
    val atts = JobAssembly.markExcess(Seq(
      attLine("a1", "t0", Some("SUCCESS"), Some(200L), Some(300L)),
      attLine("a0", "t0", Some("KILLED"), Some(100L), Some(150L))))
    assert(atts.map(_.taskAttemptId) == Seq("a0", "a1")) // sorted by id
    assert(atts.find(_.taskAttemptId == "a0").get.excess)
    assert(!atts.find(_.taskAttemptId == "a1").get.excess)
  }

  test("excess marking: no success → earliest attempt is non-excess (A5)") {
    val atts = JobAssembly.markExcess(Seq(
      attLine("a1", "t0", Some("FAILED"), Some(100L), Some(150L)),
      attLine("a0", "t0", Some("KILLED"), Some(200L), Some(250L))))
    // a1 started first → non-excess despite failing
    assert(!atts.find(_.taskAttemptId == "a1").get.excess)
    assert(atts.find(_.taskAttemptId == "a0").get.excess)
  }

  test("job fragment merge: status+finishTime adopted together (A1)") {
    val j1 = JobLine("job_1_1", Some("alice"), None, None, None,
      Some(1L), None, None, None, None, None, None, None, None)
    // a non-final fragment carrying only a status must not win
    val j2 = j1.copy(user = None, status = Some("SUCCESS"), finishTime = None)
    val j3 = j1.copy(user = None, status = Some("SUCCESS"), finishTime = Some(99L))
    val m = JobAssembly.mergeJobLines(Seq(j1, j2, j3))
    assert(m.user.contains("alice"))
    assert(m.status.contains("SUCCESS") && m.finishTime.contains(99L))
    val m2 = JobAssembly.mergeJobLines(Seq(j1, j2))
    assert(m2.status.isEmpty && m2.finishTime.isEmpty)
  }

  test("derived metrics: minutes and cpuMinutes (P8)") {
    val atts = JobAssembly.markExcess(Seq(
      attLine("a0", "t0", Some("SUCCESS"), Some(0L), Some(120000L),
        Map("CPU_MILLISECONDS" -> 90000L))))
    assert(atts.head.minutes == 2.0)
    assert(atts.head.cpuMinutes.contains(1.5))
  }

  test("end-to-end assembly from fixture lines (J1/J2)") {
    val lines = Seq(
      """Job JOBID="job_1_1" JOBNAME="wc" USER="alice" SUBMIT_TIME="1000" JOB_QUEUE="default" .""",
      """Job JOBID="job_1_1" LAUNCH_TIME="2000" TOTAL_MAPS="1" TOTAL_REDUCES="1" .""",
      """Job JOBID="job_1_1" FINISH_TIME="9000" JOB_STATUS="SUCCESS" FINISHED_MAPS="1" FINISHED_REDUCES="1" .""",
      """Task TASKID="task_1_1_m_000000" TASK_TYPE="MAP" START_TIME="2500" .""",
      """Task TASKID="task_1_1_m_000000" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="5000" .""",
      """MapAttempt TASK_TYPE="MAP" TASKID="task_1_1_m_000000" TASK_ATTEMPT_ID="attempt_1_1_m_000000_0" START_TIME="2600" .""",
      """MapAttempt TASK_TYPE="MAP" TASKID="task_1_1_m_000000" TASK_ATTEMPT_ID="attempt_1_1_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="4900" COUNTERS="[(CPU_MILLISECONDS)(cpu)(1200)]" .""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="task_1_1_r_000000" TASK_ATTEMPT_ID="attempt_1_1_r_000000_0" START_TIME="5000" TASK_STATUS="SUCCESS" FINISH_TIME="8000" .""",
      "garbage that parses to nothing")
    val parsed = lines.flatMap(LineParsing.parseLine)
    val js = parsed.collect { case LineParsing.PJob(j) => j }
    val ts = parsed.collect { case LineParsing.PTask(t) => t }
    val as = parsed.collect { case LineParsing.PAttempt(a) => a }
    val job = JobAssembly.assemble("job_1_1", "clusterA", js, ts, as)
    assert(job.user.contains("alice"))
    assert(job.status.contains("SUCCESS") && job.finishTime.contains(9000L))
    assert(job.tasks.map(_.taskId) ==
      Seq("task_1_1_m_000000", "task_1_1_r_000000"))
    val mapTask = job.tasks.head
    assert(mapTask.status.contains("SUCCESS"))
    assert(mapTask.attempts.size == 1)
    assert(mapTask.attempts.head.counters("CPU_MILLISECONDS") == 1200L)
    // reduce task has no Task line but exists via its attempt
    assert(job.tasks(1).taskType == "REDUCE")
  }
}
