package graft

import graft.app.ProcessLogs
import graft.serve.{QueryType, UsageQueries}
import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** End-to-end: fixture log files on disk → ProcessLogs.run → partitioned
  * parquet outputs → serving query (SURVEY.md §7.2 full slice). */
class ProcessLogsSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fixture logs → jobs + usage parquet → serving query") {
    val root = Files.createTempDirectory("graft_e2e")
    val logs = root.resolve("logs")
    val out = root.resolve("out")
    // 2024-01-10, cluster 'prod', queue 'default'
    val day = logs.resolve("prod/daily/default/2024/0110")
    Files.createDirectories(day)
    val jan10h8 = 1704873600000L // 2024-01-10 08:00 UTC
    val lines = Seq(
      s"""Job JOBID="job_42_1" JOBNAME="etl" USER="alice" SUBMIT_TIME="$jan10h8" JOB_QUEUE="default" .""",
      s"""Job JOBID="job_42_1" FINISH_TIME="${jan10h8 + 5400000}" JOB_STATUS="SUCCESS" .""",
      // attempt 08:00→09:30 (spans 2 hours: 60 + 30 minutes)
      s"""MapAttempt TASK_TYPE="MAP" TASKID="task_42_1_m_000000" TASK_ATTEMPT_ID="attempt_42_1_m_000000_0" START_TIME="$jan10h8" .""",
      s"""MapAttempt TASK_TYPE="MAP" TASKID="task_42_1_m_000000" TASK_ATTEMPT_ID="attempt_42_1_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="${jan10h8 + 5400000}" COUNTERS="[(CPU_MILLISECONDS)(cpu)(2700000)]" .""")
    Files.write(day.resolve("history.log"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    Files.write(day.resolve("job_42_1_conf.xml"),
      "<configuration><property><name>k</name><value>v</value></property></configuration>"
        .getBytes("UTF-8"))

    ProcessLogs.run(spark, ProcessLogs.Config(
      logsRoot = logs.toString,
      outputRoot = out.toString,
      clusters = Seq("prod"),
      numDays = 10, numDaysForced = 2,
      today = LocalDate.of(2024, 1, 15)))

    // jobs output: one assembled tree under cluster/date partitions
    val jobs = spark.read.parquet(s"$out/jobs")
    assert(jobs.count() == 1)
    val j = jobs.head()
    assert(j.getAs[String]("jobId") == "job_42_1")
    assert(j.getAs[String]("user") == "alice")

    // confs output: J4 enrichment joins
    val confs = spark.read.parquet(s"$out/confs")
    val enriched = ProcessLogs.jobsWithConfs(jobs, confs)
    assert(enriched.head().getAs[Map[String, String]]("configuration") ==
      Map("k" -> "v"))

    // usage fact: 2 hour-buckets, 60 + 30 minutes
    val usage = spark.read.parquet(s"$out/usage")
    val rows = usage.orderBy("time").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Double]("elapsedMinutes")).toSeq == Seq(60.0, 30.0))
    // cpu prorated 45min total (2700000ms), split 30/15
    assert(rows.map(_.getAs[Double]("cpuMinutes")).toSeq == Seq(30.0, 15.0))

    // serving query over the written fact
    val series = UsageQueries.aggregated(
      usage, "prod", QueryType.All("minutesTotal"), "HOURS", "UTC")
    assert(series.agg(sum("value")).head().getDouble(0) == 90.0)

    // file-count pin: the pre-write repartition keys each (cluster,
    // date) to filesPerDay tasks — without it every shuffle task holds
    // every day and a day dir gets tasks× small files (6 040 files for
    // 142 MB in the 100-day rehearsal)
    for (tbl <- Seq("jobs", "usage", "confs")) {
      val dayDirs = Files.walk(out.resolve(tbl)).iterator()
        .asScala.filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("date=")).toList
      assert(dayDirs.nonEmpty, s"$tbl: no date partitions")
      dayDirs.foreach { d =>
        val n = d.toFile.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n <= 4, s"$tbl/$d has $n part files (> filesPerDay)")
      }
    }
  }

  test("forced-window re-run is idempotent: no duplicate conf/job/usage rows") {
    // the reference skips already-processed days but always re-runs the
    // trailing numDaysForced days (JobStatsProcessing.java:69-90); a
    // re-run must REPLACE those partitions, not append to them
    val root = Files.createTempDirectory("graft_idem")
    val logs = root.resolve("logs")
    val out = root.resolve("out")
    val day = logs.resolve("prod/daily/default/2024/0110")
    Files.createDirectories(day)
    val jan10h8 = 1704873600000L
    Files.write(day.resolve("history.log"),
      (s"""Job JOBID="job_7_1" JOBNAME="etl" USER="bob" SUBMIT_TIME="$jan10h8" JOB_QUEUE="default" .""" + "\n" +
        s"""Job JOBID="job_7_1" FINISH_TIME="${jan10h8 + 3600000}" JOB_STATUS="SUCCESS" .""" + "\n" +
        s"""MapAttempt TASK_TYPE="MAP" TASKID="task_7_1_m_000000" TASK_ATTEMPT_ID="attempt_7_1_m_000000_0" START_TIME="$jan10h8" .""" + "\n" +
        s"""MapAttempt TASK_TYPE="MAP" TASKID="task_7_1_m_000000" TASK_ATTEMPT_ID="attempt_7_1_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="${jan10h8 + 3600000}" .""").getBytes("UTF-8"))
    Files.write(day.resolve("job_7_1_conf.xml"),
      "<configuration><property><name>k</name><value>v</value></property></configuration>"
        .getBytes("UTF-8"))

    // today = Jan 11, forced = 2 days → Jan 10 is re-parsed EVERY run
    val cfg = ProcessLogs.Config(
      logsRoot = logs.toString, outputRoot = out.toString,
      clusters = Seq("prod"), numDays = 10, numDaysForced = 2,
      today = LocalDate.of(2024, 1, 11))
    ProcessLogs.run(spark, cfg)
    ProcessLogs.run(spark, cfg)

    assert(spark.read.parquet(s"$out/confs").count() == 1)
    assert(spark.read.parquet(s"$out/jobs").count() == 1)
    assert(spark.read.parquet(s"$out/usage").count() == 1)
  }
}
