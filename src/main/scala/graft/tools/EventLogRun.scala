package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 scratch diagnostic (NOT part of the driver contract): run
  * selected gate queries with the Spark event log enabled so stage-level
  * wall/metrics can be read back offline (the sandbox has no live UI).
  * Mirrors Bench's session config; one untimed sf0.001 warm-up pass
  * first so codegen/JIT costs don't land in the measured run.
  *
  * Usage: runMain graft.tools.EventLogRun <sfDir> <q1,q2,...> [logDir]
  */
object EventLogRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Seq("q80")
    val logDir = if (args.length > 2) args(2) else "/tmp/spark-events"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("OPT_MIN_COALESCE", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.exists(n.startsWith) }
    sel.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    graft.operators.OperatorCaches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    sel.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[eventlogrun] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
    println(s"[eventlogrun] log dir: $logDir")
  }
}
