package graft

import graft.app.ProcessLogs
import graft.ingest.FileLedger
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end ETL window rehearsal at the reference's actual operating
  * shape: a synthetic 100-day × 2-cluster Hadoop log tree through the
  * WHOLE pipeline (parse → assemble → usage cube → Avro export), then
  * two incremental re-runs proving the window semantics of
  * `util/JobStatsProcessing.java:37-96`:
  *
  *   re-run 1 (no input change): only the trailing numDaysForced=5 day
  *     partitions are rewritten — the planner skips every day whose
  *     output exists outside the forced window;
  *   re-run 2 (one HISTORICAL day's log mutated): the ledger diff over
  *     the input tree ([[FileLedger.listFilesDs]]/[[FileLedger.diffDs]]
  *     — the T2 mtime-change machinery) detects exactly that day; its
  *     output partitions are invalidated and the re-run rewrites the
  *     forced window PLUS that day, nothing else.
  *
  * Both assertions compare per-partition latest-file mtimes before and
  * after — "rewrote exactly these partitions" is observed on disk, not
  * inferred from the plan. Prints one JSON line per phase (lines/s for
  * the full run, rewritten-partition sets for the re-runs); numbers
  * land in STRESS.md.
  *
  * Usage: sbt "runMain graft.EtlRehearsal [workDir] [jobsPerDay] [nClusters]"
  *
  * `nClusters` (default 2) is the fleet-width knob: the reference runs
  * ~20 grids through its per-cluster MR fan-out; our single-pass
  * fleet-wide jobs claim O(1)-in-clusters structure, proven by
  * comparing lines/s at 2 vs 24 clusters (STRESS r11).
  */
object EtlRehearsal {
  private val DayFmt = DateTimeFormatter.ofPattern("MMdd")

  /** Ledger glob for the log tree: listFilesDs expands the DIRECTORY
    * component driver-side (cluster/queue/year/day dirs) and lists the
    * filename component on executors — a bare "*" would only see
    * depth-1 entries under logsRoot (i.e. nothing). */
  private val LogGlob = "*/daily/*/*/*/*.log"

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0) else "/tmp/etl_rehearsal"
    val jobsPerDay = if (args.length > 1) args(1).toInt else 120
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val logsRoot = s"$work/logs"
    val outRoot = s"$work/out"
    val avroRoot = s"$work/avro"
    val ledgerDir = s"$work/ledger"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))

    val nClusters = if (args.length > 2) args(2).toInt else 2
    val clusters =
      if (nClusters == 2) Seq("alpha", "beta")
      else (0 until nClusters).map(i => f"grid$i%02d")
    val today = LocalDate.of(2024, 4, 9)
    val days = (0 until 100).map(today.minusDays(_)).reverse

    // ---- synthesize the log tree ------------------------------------ //
    // Layout per the reference README ("Hadoop Logs"):
    //   <logsRoot>/<cluster>/daily/<queue>/<yyyy>/<MMdd>/<file>.log
    // Each job: submit + N task-attempt start/finish pairs + finish,
    // timestamps inside the day so proration lands in real hour buckets.
    var totalLines = 0L
    val t0gen = System.nanoTime()
    for (cluster <- clusters; (d, di) <- days.zipWithIndex) {
      val dir = Paths.get(logsRoot, cluster, "daily", "default",
        f"${d.getYear}%04d", d.format(DayFmt))
      Files.createDirectories(dir)
      val sb = new StringBuilder
      val dayMs = d.toEpochDay * 86400000L
      for (j <- 0 until jobsPerDay) {
        val jid = s"job_${di}_$j" // LineParsing JobIdRx: job_\d+_\d+
        val user = s"u${j % 17}"
        // spread submits across ~22 h of the day (977017 ms stride mod
        // 79 000 000 ≈ 21.9 h) so proration exercises every hour
        // bucket, while submit + the 2 h job lifetime stays inside the
        // day — usage partitions by each prorated hour's DATE, and a
        // job leaking into D+1 would rewrite a partition outside the
        // forced window and break the incremental re-run asserts
        val submit = dayMs + (j * 977017L) % 79000000L
        sb.append(s"""Job JOBID="$jid" JOBNAME="gen" USER="$user" SUBMIT_TIME="$submit" .""").append('\n')
        val nAtt = 4 + j % 7
        for (a <- 0 until nAtt) {
          val tid = s"task_${di}_${j}_m_$a"
          val att = s"attempt_${di}_${j}_m_${a}_0"
          val st = submit + 60000L + a * 1000L
          val fin = st + 1800000L + (a * 137000L) % 3600000L
          sb.append(s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" START_TIME="$st" .""").append('\n')
          sb.append(s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" TASK_STATUS="SUCCESS" FINISH_TIME="$fin" COUNTERS="[(CPU_MILLISECONDS)(cpu)(60000)]" .""").append('\n')
          totalLines += 2
        }
        val jfin = submit + 3600000L * 2
        sb.append(s"""Job JOBID="$jid" FINISH_TIME="$jfin" JOB_STATUS="SUCCESS" .""").append('\n')
        totalLines += 2
      }
      Files.writeString(dir.resolve("history.log"), sb.toString)
    }
    val genSec = (System.nanoTime() - t0gen) / 1e9
    System.err.println(f"[etl] generated $totalLines lines in $genSec%.1f s")

    val cfg = ProcessLogs.Config(logsRoot, outRoot, clusters,
      numDays = 100, numDaysForced = 5, today = today)

    // ---- full run + Avro export ------------------------------------- //
    val t0 = System.nanoTime()
    ProcessLogs.run(spark, cfg)
    val runSec = (System.nanoTime() - t0) / 1e9
    val fact = spark.read.parquet(s"$outRoot/usage")
    val tAv = System.nanoTime()
    ProcessLogs.exportUsageAvro(fact, avroRoot)
    val avroSec = (System.nanoTime() - tAv) / 1e9
    val fullSec = (System.nanoTime() - t0) / 1e9
    val factRows = fact.count()
    val jobRows = spark.read.parquet(s"$outRoot/jobs").count()
    require(jobRows == clusters.size.toLong * days.size * jobsPerDay,
      s"expected ${clusters.size * days.size * jobsPerDay} jobs, got $jobRows")
    println(f"""{"phase":"full_run","lines":$totalLines,"sec":$fullSec%.1f,"run_sec":$runSec%.1f,"avro_export_sec":$avroSec%.1f,"lines_per_sec":${(totalLines / fullSec).toLong},"jobs":$jobRows,"fact_rows":$factRows}""")

    // snapshot per-partition latest mtime for jobs + usage
    def partitionMtimes(root: String): Map[String, Long] = {
      val base = Paths.get(root)
      if (!Files.exists(base)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        Files.walk(base).iterator().asScala
          .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
          .toSeq
          .groupBy { p =>
            base.relativize(p).toString.split('/').init.mkString("/")
          }
          .view.mapValues(_.map(Files.getLastModifiedTime(_).toMillis).max)
          .toMap
      }
    }
    def rewritten(before: Map[String, Long], after: Map[String, Long]): Set[String] =
      after.collect { case (part, m) if before.get(part).forall(_ < m) => part }.toSet

    // persist the input ledger (distributed listing of the log tree)
    def snapshotLedger(): Unit =
      FileLedger.listFilesDs(spark, logsRoot, LogGlob)
        .toDF().write.mode("overwrite").parquet(ledgerDir)
    snapshotLedger()

    // ---- re-run 1: no input change ---------------------------------- //
    Thread.sleep(1100) // mtime resolution guard
    val before1 = partitionMtimes(s"$outRoot/usage") ++
      partitionMtimes(s"$outRoot/jobs").map { case (k, v) => s"J/$k" -> v }
    val t1 = System.nanoTime()
    ProcessLogs.run(spark, cfg)
    val rerun1Sec = (System.nanoTime() - t1) / 1e9
    val after1 = partitionMtimes(s"$outRoot/usage") ++
      partitionMtimes(s"$outRoot/jobs").map { case (k, v) => s"J/$k" -> v }
    val rw1 = rewritten(before1, after1)
    val forcedDates = (0 until 5).map(today.minusDays(_)).map(_.toString).toSet
    val rw1Dates = rw1.map(_.split("date=").last.take(10))
    require(rw1Dates == forcedDates,
      s"re-run 1 rewrote $rw1Dates, expected exactly the forced window $forcedDates")
    println(f"""{"phase":"rerun_noop","sec":$rerun1Sec%.1f,"rewritten_dates":${rw1Dates.toSeq.sorted.mkString("[\"", "\",\"", "\"]")}}""")

    // ---- re-run 2: mutate one historical day, ledger detects it ----- //
    val mutated = today.minusDays(40)
    val mutFile = Paths.get(logsRoot, clusters.head, "daily", "default",
      f"${mutated.getYear}%04d", mutated.format(DayFmt), "history.log")
    Thread.sleep(1100)
    Files.writeString(mutFile,
      s"""Job JOBID="job_99999_0" JOBNAME="late" USER="u3" SUBMIT_TIME="${mutated.toEpochDay * 86400000L + 1000}" .""" + "\n" +
        s"""Job JOBID="job_99999_0" FINISH_TIME="${mutated.toEpochDay * 86400000L + 7200000}" JOB_STATUS="SUCCESS" .""" + "\n",
      StandardOpenOption.APPEND)

    // T2 machinery: distributed listing diffed against the persisted
    // ledger — the changed file maps back to its day partition, whose
    // output is invalidated so the planner reprocesses it
    import spark.implicits._
    val ledger = spark.read.parquet(ledgerDir).as[FileLedger.FileState]
    // O(changed) collect — the diff is join-based and cluster-side
    val changed = FileLedger
      .diffDs(FileLedger.listFilesDs(spark, logsRoot, LogGlob), ledger)
      .select("path", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    require(changed.map(_._2).forall(_ == "changed") &&
        changed.map(p => FileLedger.normalizePath(p._1)).toSet ==
          Set(FileLedger.normalizePath(mutFile.toString)),
      s"ledger diff found $changed, expected only the mutated file as 'changed'")
    val changedDates = changed.map { case (p, _) =>
      val m = "/(\\d{4})/(\\d{2})(\\d{2})/".r.findFirstMatchIn(p).get
      LocalDate.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
    }.toSet
    require(changedDates == Set(mutated))
    // invalidate the mutated day's output partitions (both tables) so
    // IncrementalPlanner's outputExists turns false for it
    for (tbl <- Seq("usage", "jobs"); cluster <- clusters) {
      val p = Paths.get(outRoot, tbl, s"cluster=$cluster", s"date=$mutated")
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    }
    snapshotLedger()

    Thread.sleep(1100)
    val before2 = partitionMtimes(s"$outRoot/usage") ++
      partitionMtimes(s"$outRoot/jobs").map { case (k, v) => s"J/$k" -> v }
    val t2 = System.nanoTime()
    ProcessLogs.run(spark, cfg)
    val rerun2Sec = (System.nanoTime() - t2) / 1e9
    val after2 = partitionMtimes(s"$outRoot/usage") ++
      partitionMtimes(s"$outRoot/jobs").map { case (k, v) => s"J/$k" -> v }
    val rw2Dates = rewritten(before2, after2).map(_.split("date=").last.take(10))
    require(rw2Dates == forcedDates + mutated.toString,
      s"re-run 2 rewrote $rw2Dates, expected forced window + $mutated")
    // the late job landed
    val lateJobs = spark.read.parquet(s"$outRoot/jobs")
      .filter(col("jobId") === "job_99999_0").count()
    require(lateJobs == 1L, s"mutated day's late job missing (found $lateJobs)")
    println(f"""{"phase":"rerun_mutated","sec":$rerun2Sec%.1f,"mutated_day":"$mutated","rewritten_dates":${rw2Dates.toSeq.sorted.mkString("[\"", "\",\"", "\"]")}}""")

    // Avro export readback parity (S5/S6 boundary) on one sample day
    val avroBack = graft.sources.AvroKv.readUsageFact(spark, s"$avroRoot/*/*/*")
    val avroRows = avroBack.count()
    require(avroRows > 0, "avro export readback empty")
    println(s"""{"phase":"avro_readback","rows":$avroRows}""")

    spark.stop()
    println("""{"phase":"done","ok":true}""")
  }
}
