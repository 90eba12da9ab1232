package graft

import graft.etl.JobAssembly
import graft.usage.{HourProration, UsageEtl}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark end-to-end: log lines → job tree → hourly usage fact; plus the
  * typed-vs-Column proration cross-check (SURVEY.md §7.2 first slice). */
class PipelineSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val H = HourProration.HourMs

  test("distributed assembly + usage fact from fixture lines") {
    import spark.implicits._
    // attempt spanning 01:30→03:15 (3 hour buckets)
    val start = H + 30 * 60000L
    val finish = 3 * H + 15 * 60000L
    val lines = Seq(
      s"""Job JOBID="job_1_1" JOBNAME="wc" USER="alice" SUBMIT_TIME="$H" JOB_QUEUE="default" .""",
      s"""Job JOBID="job_1_1" FINISH_TIME="${3 * H + 20 * 60000L}" JOB_STATUS="SUCCESS" .""",
      s"""MapAttempt TASK_TYPE="MAP" TASKID="task_1_1_m_000000" TASK_ATTEMPT_ID="attempt_1_1_m_000000_0" START_TIME="$start" .""",
      s"""MapAttempt TASK_TYPE="MAP" TASKID="task_1_1_m_000000" TASK_ATTEMPT_ID="attempt_1_1_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="$finish" COUNTERS="[(CPU_MILLISECONDS)(cpu)(6300000)]" .""")
    val jobs = JobAssembly.assembleJobs(spark.createDataset(lines), "cl")
    assert(jobs.count() == 1)
    val fact = UsageEtl.usageFact(jobs).orderBy("time")
    val rows = fact.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Double]("elapsedMinutes")).toSeq ==
      Seq(30.0, 60.0, 15.0))
    // prorated cpu sums back to 6300000ms = 105 min
    val cpu = rows.map(_.getAs[Double]("cpuMinutes")).sum
    assert(math.abs(cpu - 105.0) < 1e-9)
    assert(rows.forall(_.getAs[String]("user") == "alice"))
  }

  test("typed prorate and Column explodeHours agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cases = (1 to 200).map { i =>
      val s = rnd.nextLong(1000L * 24 * H)
      (i.toLong, s, s + rnd.nextLong(8 * H))
    }
    val df = cases.toDF("id", "startMs", "finishMs")
    val exploded = HourProration
      .explodeHours(df, col("startMs"), col("finishMs"))
      .select("id", "hourMs", "overlapMs", "started", "finished")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSet
    val expected = cases.flatMap { case (id, s, f) =>
      val att = graft.model.Attempt("a", "MAP", "SUCCESS", s, f, None, None,
        Map.empty, excess = false, 0.0, None)
      HourProration.prorate("u", "c", att).map { h =>
        (id, h.time, math.round(h.elapsedMinutes * 60000).toLong,
          h.started, h.finished)
      }
    }.toSet
    assert(exploded == expected)
  }
}
