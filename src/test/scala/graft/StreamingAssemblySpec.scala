package graft

import graft.streaming.StreamingAssembly
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class StreamingAssemblySpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val openLines = Seq(
    """Job JOBID="job_9_1" JOBNAME="wc" USER="eve" SUBMIT_TIME="1000" .""",
    """MapAttempt TASK_TYPE="MAP" TASKID="task_9_1_m_000000" TASK_ATTEMPT_ID="attempt_9_1_m_000000_0" START_TIME="2000" .""")
  val closingLines = Seq(
    """MapAttempt TASK_TYPE="MAP" TASKID="task_9_1_m_000000" TASK_ATTEMPT_ID="attempt_9_1_m_000000_0" TASK_STATUS="SUCCESS" FINISH_TIME="9000" .""",
    """Job JOBID="job_9_1" FINISH_TIME="9500" JOB_STATUS="SUCCESS" .""")

  test("incremental assembly across micro-batches emits on final state") {
    val in = Files.createTempDirectory("sa_in")
    val ckpt = Files.createTempDirectory("sa_ck")
    Files.write(in.resolve("b1.txt"),
      String.join("\n", openLines: _*).getBytes)

    val stream = spark.readStream.textFile(in.toString)
    val jobs = StreamingAssembly.assembleJobsStream(stream, "cl")
    val q = jobs.writeStream
      .outputMode("append")
      .format("memory").queryName("assembled")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      // job not final yet — nothing emitted, state held
      assert(spark.table("assembled").count() == 0)

      // second micro-batch completes the job
      Files.write(in.resolve("b2.txt"),
        String.join("\n", closingLines: _*).getBytes)
      q.processAllAvailable()
      val out = spark.table("assembled").collect()
      assert(out.length == 1)
      val job = out.head
      assert(job.getAs[String]("jobId") == "job_9_1")
      assert(job.getAs[String]("user") == "eve")
      assert(job.getAs[String]("status") == "SUCCESS")
      val tasks = job.getSeq[org.apache.spark.sql.Row](job.fieldIndex("tasks"))
      assert(tasks.length == 1)
      val attempts = tasks.head.getSeq[org.apache.spark.sql.Row](
        tasks.head.fieldIndex("attempts"))
      assert(attempts.head.getAs[Long]("finishTime") == 9000L)
    } finally q.stop()
  }

  test("truncated job (no final fragment) flushes when the watermark passes +5 days") {
    val in = Files.createTempDirectory("sa_to_in")
    val ckpt = Files.createTempDirectory("sa_to_ck")
    // batch 1: job_9_1 opens but never finishes (max event time 2000)
    Files.write(in.resolve("b1.txt"),
      String.join("\n", openLines: _*).getBytes)

    val stream = spark.readStream.textFile(in.toString)
    val jobs = StreamingAssembly.assembleJobsStream(stream, "cl")
    val q = jobs.writeStream
      .outputMode("append")
      .format("memory").queryName("flushed")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("flushed").count() == 0) // state held, nothing final

      // batch 2: an unrelated job whose event time pushes the watermark
      // past job_9_1's last activity + 2×lateness (delay + timeout)
      val far = 2000L + 2 * StreamingAssembly.DefaultLatenessMs + 1000000L
      Files.write(in.resolve("b2.txt"),
        s"""Job JOBID="job_9_2" JOBNAME="x" USER="mallory" SUBMIT_TIME="$far" .""".getBytes)
      q.processAllAvailable()

      val out = spark.table("flushed").collect()
      assert(out.length == 1)
      val job = out.head
      assert(job.getAs[String]("jobId") == "job_9_1")
      assert(job.getAs[String]("user") == "eve") // partial fields kept
      assert(job.getAs[String]("status") == null) // truncated: no final state
    } finally q.stop()
  }

  test("timestampless fragment inherits partition running-max ts, survives watermark") {
    val in = Files.createTempDirectory("sa_nt_in")
    val ckpt = Files.createTempDirectory("sa_nt_ck")
    // batch 1: an old job advances the watermark far past the epoch
    val base = 100L * 24 * 3600 * 1000 // day 100
    Files.write(in.resolve("b1.txt"),
      s"""Job JOBID="job_7_1" JOBNAME="w" USER="ann" SUBMIT_TIME="$base" .""".getBytes)

    val stream = spark.readStream.textFile(in.toString)
    val jobs = StreamingAssembly.assembleJobsStream(stream, "cl")
    val q = jobs.writeStream
      .outputMode("append")
      .format("memory").queryName("no_ts")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable() // watermark now ≈ base − 5 d ≫ epoch

      // batch 2: a timestamped line followed (same file/partition) by a
      // TIMESTAMPLESS job-metadata fragment (JOBNAME/USER, no time
      // fields — batch assembly merges it last-non-null), then the
      // final state. Epoch-0 stamping would have the engine late-drop
      // the metadata fragment and lose the user; inheriting the
      // running max keeps it.
      Files.write(in.resolve("b2.txt"), String.join("\n",
        s"""Job JOBID="job_7_1" SUBMIT_TIME="${base + 1000}" .""",
        """Job JOBID="job_7_1" JOBNAME="w" USER="ann" .""",
        s"""Job JOBID="job_7_1" FINISH_TIME="${base + 9000}" JOB_STATUS="SUCCESS" .""").getBytes)
      q.processAllAvailable()

      val out = spark.table("no_ts").collect()
      assert(out.length == 1)
      val job = out.head
      assert(job.getAs[String]("status") == "SUCCESS")
      assert(job.getAs[String]("user") == "ann",
        "timestampless metadata fragment was late-dropped")
    } finally q.stop()
  }

  test("static execution matches batch assembly") {
    val all = (openLines ++ closingLines).toDS()
    val streaming = StreamingAssembly.assembleJobsStream(all, "cl").collect()
    val batch = graft.etl.JobAssembly.assembleJobs(all, "cl").collect()
    assert(streaming.length == 1 && batch.length == 1)
    assert(streaming.head == batch.head)
  }
}
