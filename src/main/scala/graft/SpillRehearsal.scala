package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure rehearsal for the dedup/ANN subset — the
  * early-warning system for payload-staging regressions.
  *
  * Round 8's two disk-fill failures (q21/q71's per-candidate attach
  * shuffles, q72's text-attach stage) were found by luck: a bench
  * co-resident with other work happened to exhaust the disk. This main
  * reproduces that pressure deliberately: it runs the dedup subset
  * under a deliberately small `spark.memory.fraction` (execution+
  * storage pool squeezed so shuffles/aggregations spill early) and
  * records per-query wall time and spill bytes from
  * `SparkListenerTaskEnd` task metrics. A query whose spill volume is
  * a large multiple of its input is staging payloads per candidate —
  * the exact failure class — and shows up here at bench scale instead
  * of at 100 TB.
  *
  * The HEAP axis is driven from outside (the JVM's -Xmx is fixed at
  * launch): the campaign script runs this main twice via sbt's -mem
  * flag. In-JVM we pin the pool small; completion is asserted (any
  * thrown query fails the run), spill is reported per query.
  *
  * Usage: sbt -mem 4096 "runMain graft.SpillRehearsal [sfDir] [frac]"
  * Prints one JSON line per query + a total line; numbers land in
  * STRESS.md.
  */
object SpillRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val frac = if (args.length > 1) args(1).toDouble else 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // squeeze the unified pool: execution+storage get `frac` of
      // (heap - 300MB reserved) instead of the default 0.6 — shuffle
      // hash tables and sorts spill at a fraction of their usual size
      .config("spark.memory.fraction", frac.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-metric accumulation across the whole app; per-query deltas
    // are snapshots around each query (queries run serially here, so
    // the delta is attributable)
    @volatile var memSpilled = 0L
    @volatile var diskSpilled = 0L
    @volatile var shuffleWritten = 0L
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) lock.synchronized {
          memSpilled += m.memoryBytesSpilled
          diskSpilled += m.diskBytesSpilled
          shuffleWritten += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })

    val subset = Seq("q19_exact_dedup", "q20_ngram_jaccard",
      "q21_minhash_lsh", "q22_simhash", "q24_blocked_nn",
      "q32_embed_neardup", "q44_hybrid_dedup", "q48_cc_clusters",
      "q67_semdedup", "q71_incr_neardup", "q72_fuzzy_editdist",
      "q81_lsh_groups", "q82_ngram_tiled", "q85_edit_tiled")
    // completion contract: a renamed/removed registry entry must fail
    // the harness loudly, not silently shrink its coverage
    val missing = subset.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries in spill subset: $missing")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    System.err.println(s"[spill] heap=${heapMb}MB memory.fraction=$frac sf=$sfDir")

    var failures = 0
    val rows = subset.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val (m0, d0, w0) = lock.synchronized((memSpilled, diskSpilled, shuffleWritten))
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => failures += 1; Some(e) }
        val sec = (System.nanoTime() - t0) / 1e9
        // brief settle so straggler task-end events land in the delta
        Thread.sleep(200)
        val (m1, d1, w1) = lock.synchronized((memSpilled, diskSpilled, shuffleWritten))
        spark.sharedState.cacheManager.clearCache()
        val row = f"""{"query":"$name","sec":$sec%.2f,"spill_mem_mb":${(m1 - m0) / 1048576},"spill_disk_mb":${(d1 - d0) / 1048576},"shuffle_write_mb":${(w1 - w0) / 1048576},"ok":${err.isEmpty}}"""
        println(row)
        err.foreach(e => System.err.println(s"[spill] FAIL $name: $e"))
        row
      }
    }
    println(f"""{"summary":true,"heap_mb":$heapMb,"fraction":$frac,"queries":${rows.size},"failures":$failures,"spill_disk_mb_total":${diskSpilled / 1048576},"shuffle_write_mb_total":${shuffleWritten / 1048576}}""")
    spark.stop()
    // completion contract: a failed query under memory pressure is the
    // regression this harness exists to catch
    if (failures > 0) sys.exit(1)
  }
}
