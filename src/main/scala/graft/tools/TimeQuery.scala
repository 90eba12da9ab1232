package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time one or more registered queries in isolation.
  *
  * Usage:
  *   sbt "runMain graft.tools.TimeQuery <sfDir> q35_term_freq [q38_tfidf ...]"
  *   SPARK_GRAFT_EXPLAIN=1 to also dump the formatted plan.
  *
  * Each query runs twice: once for warm-up (JIT/codegen/footers), once
  * timed — so numbers isolate the plan, matching Bench's methodology.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    val qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> all(n))
    // SPARK_GRAFT_JOBS=1: per-Spark-job wall times of the timed run —
    // separates fixed job-count overhead (eager dispatch pre-passes,
    // cache materializations) from real stage work when a query's cost
    // is suspected to be scheduling, not compute.
    val jobLog =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val starts = scala.collection.mutable.HashMap.empty[Int, (Long, String)]
    if (sys.env.contains("SPARK_GRAFT_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = (System.nanoTime(),
              Option(j.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .getOrElse(""))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { case (t0, d) =>
              jobLog.synchronized {
                jobLog += ((j.jobId, System.nanoTime() - t0, d)) }
            }
        })
    qs.foreach { case (name, fn) =>
      fn(spark, sfDir).count() // warm
      // drop caches the warm-up built: operators that cache internally
      // would otherwise serve the timed run from memory and hide their
      // build cost (Bench clears between queries for the same reason)
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      jobLog.synchronized(jobLog.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name%-22s $dt%8.3f s  ($n rows)")
      jobLog.synchronized(jobLog.toList).sortBy(_._1).foreach {
        case (id, ns, desc) =>
          println(f"  job $id%3d ${ns / 1e9}%7.3f s  ${desc.take(80)}")
      }
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
