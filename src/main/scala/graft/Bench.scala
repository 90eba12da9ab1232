package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * A full untimed warm-up pass at sf0.001 runs first so the timed
  * numbers measure the plans, not JVM/codegen/parquet-footer warm-up
  * (JIT of the regex/hash paths was otherwise attributed to whichever
  * query happened to run first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override for scale-proof runs: 32 partitions is
    // right for sf<=0.1 but undersizes sorts at sf10 (~GB partitions
    // spill serially); the driver contract (unset) keeps cpus.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // NOTE (r17, measured-and-rejected): AQE's byte-based partition
    // coalescing serializes some CPU-dense small-byte stages (q80's
    // candidate join ran on 8 post-AQE tasks carrying 12 s of CPU), and
    // lowering spark.sql.adaptive.coalescePartitions.minPartitionSize to
    // 64k does widen those stages — but a 3×3 alternating full-bench A/B
    // read sum-of-mins 76.9 s (64k) vs 73.4 s (default): the extra task
    // overhead on the many-small-shuffle queries (q95 +1.1 s, q25 +0.5 s)
    // outweighs the q72/q80 wins. Operators that need width get it
    // explicitly (REPARTITION_BY_NUM is AQE-exempt) instead.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional subset filter for scale-proof runs (comma-separated name
    // prefixes, e.g. "q19,q2,q32"); unset ⇒ the full driver contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.isEmpty || only.exists(name.startsWith)
    }

    val warmDir = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    spark.sharedState.cacheManager.clearCache()

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.err.println(s"[bench] start $name")
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e) }
      val dt = (System.nanoTime() - t0) / 1e9
      // A thrown query must be LOUD: in round 8's first sf10 run, five
      // swallowed failures recorded ~0.03 s each and read as "fast".
      err match {
        case Some(e) => System.err.println(
          f"[bench] FAIL $name after $dt%.1f s: $e")
        case None => System.err.println(f"[bench] done  $name in $dt%.1f s")
      }
      // Operators that cache internally (LSH signatures, CC iterations)
      // would otherwise leak blocks into the next query's measurement —
      // by q35 of a 66-query run the accumulated pressure inflated
      // unrelated queries up to 9×. Each query is timed on its own plan.
      // releaseAll additionally drops the registry's strong refs so the
      // DataFrame handles themselves don't accumulate across 87 queries.
      graft.operators.OperatorCaches.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      (name, dt, err.isDefined)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failed = results.collect { case (k, _, true) => "\"" + k + "\"" }
    // "failed" only appears when something threw — the driver's happy
    // path sees the unchanged contract shape.
    val failedField =
      if (failed.isEmpty) "" else s""","failed":[${failed.mkString(",")}]"""
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","cpus":$cpus,"queries":$qs$failedField,"sf":"$sfDir"}"""
    println(json)
    // The driver captures only a ~2000-char TAIL of stdout, and at 100
    // queries the full-name line above is ~3.3 KB — head-truncated and
    // unparseable every round since ~r13 (BENCH_r13..r17 all have
    // parsed:null; the 0.1 ms-precision trick that kept the 79-query
    // line under the window stopped sufficing at 100). So a SECOND,
    // compact line is printed LAST — short query ids (the "qNN" prefix,
    // unique by construction) at 2-decimal precision, ~1.25 KB for 100
    // queries — and lands complete inside the tail window. The full
    // per-query names and 0.1 ms values stay in the first line and in
    // the bench_out mirror below; the compact line is a projection of
    // the same run, never a different measurement. If a short id ever
    // collided the compact line would silently drop a query, so fall
    // back to full names in that (never-expected) case.
    val shortIds = results.map { case (k, _, _) => k.takeWhile(_ != '_') }
    val useShort = shortIds.distinct.length == results.length
    def shortOf(k: String) = if (useShort) k.takeWhile(_ != '_') else k
    val qsShort = results.map { case (k, v, _) =>
      "\"" + shortOf(k) + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val failedShortField = if (failed.isEmpty) "" else
      s""","failed":[${results.collect { case (k, _, true) =>
        "\"" + shortOf(k) + "\"" }.mkString(",")}]"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","cpus":$cpus,"queries":$qsShort$failedShortField,"sf":"$sfDir"}""")
    // Stdout of a long run can be tail-truncated by harness plumbing
    // (r6's driver artifact lost 14 query timings that way) — also
    // land the full-name line in files the driver can ship whole.
    // Subset runs must not clobber the full-contract mirror the driver
    // ships — they default to a /tmp path instead. Scaling runs
    // (SPARK_GRAFT_CPUS != 32) write only a cpus-suffixed mirror: in
    // r17 the driver's 8-cpu run overwrote the 32-cpu contract mirror
    // minutes after it was written.
    val outPaths: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_OUT") match {
      case Some(p) => Seq(p)
      case None if only.nonEmpty => Seq("/tmp/bench_subset.json")
      case None =>
        val suffixed = s"/root/repo/bench_out_c$cpus.json"
        if (cpus == "32") Seq("/root/repo/bench_out.json", suffixed)
        else Seq(suffixed)
    }
    outPaths.foreach { outPath =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $outPath: $e") }
    }
    spark.stop()
  }
}
