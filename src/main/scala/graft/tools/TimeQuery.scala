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
    qs.foreach { case (name, fn) =>
      fn(spark, sfDir).count() // warm
      // drop caches the warm-up built: operators that cache internally
      // would otherwise serve the timed run from memory and hide their
      // build cost (Bench clears between queries for the same reason)
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name%-22s $dt%8.3f s  ($n rows)")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
