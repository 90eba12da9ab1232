package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main (not part of the driver contract): the
  * PRODUCTION IVFADC path end-to-end over a real embeddings table —
  * both quantizer halves resolved through their artifact-or-fit
  * dispatch ([[graft.operators.IvfCentroids.forCorpus]] via
  * `SPARK_GRAFT_IVF_DIR`, [[graft.operators.PqCodebooks.forCorpus]]
  * via `SPARK_GRAFT_PQ_DIR`), the slim index built once, then a
  * query batch searched against it with exact rerank. Prints one JSON
  * line per phase; the `[graft.dispatch]` stderr lines record which
  * tier each half actually took. Numbers land in STRESS.md.
  *
  * Usage: sbt "runMain graft.tools.AdcProbe <sfDir> [nProbe] [k] [rerank]
  *             [maintenanceWindows] [incrDenom]"
  */
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val nProbe = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 5
    val rerank = if (args.length > 3) args(3).toInt else 50
    val spark = graft.GraftSession.create("adc-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{IvfCentroids, PqCodebooks, Similarity}

    val emb = graft.Tables.embeddings(spark, dir).cache()
    val n = emb.count()

    val t0 = System.nanoTime()
    val cents = IvfCentroids.forCorpus(emb)
    val tCents = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (cbs, dsub) = PqCodebooks.forCorpus(emb)
    val tCbs = (System.nanoTime() - t1) / 1e9
    println(f"""{"stage":"quantizers","n":$n,"cells":${cents.size},"codewords":${cbs.size},"dsub":$dsub,"cents_sec":$tCents%.2f,"cbs_sec":$tCbs%.2f}""")

    val t2 = System.nanoTime()
    val index = Similarity.buildAdcIndex(emb, cents, cbs, dsub).cache()
    val idxRows = index.count()
    val tIdx = (System.nanoTime() - t2) / 1e9
    println(f"""{"stage":"build_index","rows":$idxRows,"sec":$tIdx%.2f}""")

    val q = emb.filter(pmod(col("vec_id"), lit(1000L)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val nQ = q.count()
    val t3 = System.nanoTime()
    val res = Similarity.ivfAdcSearchAgainst(q, index, cents, cbs, dsub,
      nProbe, k, rerank, rawVectors = Some(emb))
    val nRes = res.count()
    val tSearch = (System.nanoTime() - t3) / 1e9
    println(f"""{"stage":"search","queries":$nQ,"results":$nRes,"nProbe":$nProbe,"k":$k,"rerank":$rerank,"sec":$tSearch%.2f,"ms_per_query":${tSearch * 1000 / math.max(nQ, 1)}%.1f}""")

    // ---- residual tier A/B (same budget, same probes) -------------- //
    val t4 = System.nanoTime()
    val (rcbs, rdsub) = PqCodebooks.forCorpusResidual(emb, cents)
    val tRcbs = (System.nanoTime() - t4) / 1e9
    val t5 = System.nanoTime()
    val rIndex = Similarity.buildResidualAdcIndex(emb, cents, rcbs, rdsub)
      .cache()
    val rIdxRows = rIndex.count()
    val tRIdx = (System.nanoTime() - t5) / 1e9
    println(f"""{"stage":"residual_build","rows":$rIdxRows,"cbs_sec":$tRcbs%.2f,"index_sec":$tRIdx%.2f}""")
    val t6 = System.nanoTime()
    val rRes = Similarity.ivfAdcResidualSearchAgainst(q, rIndex, cents, rcbs,
      rdsub, nProbe, k, rerank, rawVectors = Some(emb))
    val nRRes = rRes.count()
    val tRSearch = (System.nanoTime() - t6) / 1e9
    println(f"""{"stage":"residual_search","queries":$nQ,"results":$nRRes,"sec":$tRSearch%.2f,"ms_per_query":${tRSearch * 1000 / math.max(nQ, 1)}%.1f}""")

    // recall A/B vs exact L2 ground truth over a bounded SAMPLE of the
    // query batch (the full crossJoin + window form crawled at 2 M ×
    // 2 000 queries — 4×10⁹ pairs through one exchange; a 200-query
    // exact reference answers the same quality question in seconds,
    // the AnnRouteProbe discipline)
    import org.apache.spark.sql.DataFrame
    val qSample = q.orderBy("query_id").limit(200).cache()
    val nSample = qSample.count()
    def topSet(df: DataFrame): Set[(Long, Long)] =
      df.join(qSample.select("query_id"), "query_id")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bruteForceTopK ranks by cosine; recall vs the L2-metric engines
    // is still the right reference here because corpus vectors are
    // L2-normalized upstream (cosine and L2 order agree); sample size
    // printed so the denominator is visible
    val exact = topSet(Similarity.bruteForceTopK(
      qSample.select(col("query_id").as("vec_id"), col("embedding")), emb, k))
    val recNon = (exact & topSet(res)).size.toDouble / exact.size
    val recRes = (exact & topSet(rRes)).size.toDouble / exact.size
    println(f"""{"stage":"recall_ab","k":$k,"sample_queries":$nSample,"nonresidual":$recNon%.3f,"residual":$recRes%.3f}""")

    // ---- persisted bucketed index: write + pruned search ----------- //
    val dir2 = java.nio.file.Files.createTempDirectory("adc_probe_tbl").toString
    val buckets = math.max(8, cents.size / 4)
    val t7 = System.nanoTime()
    Similarity.writeAdcIndexBucketed(rIndex, "adc_probe_idx", buckets,
      Some(s"$dir2/adc_probe_idx"))
    val tWrite = (System.nanoTime() - t7) / 1e9
    val t8 = System.nanoTime()
    val persisted = Similarity.ivfAdcSearchPruned(q, spark.table("adc_probe_idx"),
      cents, rcbs, rdsub, nProbe, k, rerank, Some(emb), residual = true)
    val nP = persisted.count()
    val tPersist = (System.nanoTime() - t8) / 1e9
    println(f"""{"stage":"persisted_search","buckets":$buckets,"write_sec":$tWrite%.2f,"results":$nP,"sec":$tPersist%.2f,"ms_per_query":${tPersist * 1000 / math.max(nQ, 1)}%.1f}""")

    // ---- increment + compaction (the maintenance window) ----------- //
    // A 1% "daily" increment: fresh vec_ids past the corpus max,
    // encoded against the SAME pinned artifacts (appendResidualAdcIndex
    // semantics — base corpus never rescanned).
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    // slim to the 2 columns every union below needs (scale corpora
    // carry extra columns, e.g. label, that would break unionByName)
    val embSlim = emb.select("vec_id", "embedding")
    val incVecs = emb.filter(pmod(col("vec_id"), lit(100L)) === 7)
      .select((col("vec_id") + lit(maxId + 1L)).as("vec_id"), col("embedding"))
    val nInc = incVecs.count()
    val t9a = System.nanoTime()
    val increment = Similarity.buildResidualAdcIndex(incVecs, cents, rcbs, rdsub)
      .cache()
    val incRows = increment.count()
    val tEncode = (System.nanoTime() - t9a) / 1e9
    require(incRows == nInc, s"increment encode dropped rows: $incRows != $nInc")
    val t9 = System.nanoTime()
    val unioned = Similarity.ivfAdcSearchPruned(q,
      spark.table("adc_probe_idx").unionByName(increment),
      cents, rcbs, rdsub, nProbe, k, rerank,
      Some(embSlim.unionByName(incVecs)), residual = true)
    val nU = unioned.count()
    val tUnion = (System.nanoTime() - t9) / 1e9
    val t10 = System.nanoTime()
    Similarity.compactAdcIndexBucketed(spark, "adc_probe_idx", increment,
      "adc_probe_idx_v2", buckets, Some(s"$dir2/adc_probe_idx_v2"))
    val tCompact = (System.nanoTime() - t10) / 1e9
    val t11 = System.nanoTime()
    val compacted = Similarity.ivfAdcSearchPruned(q,
      spark.table("adc_probe_idx_v2"), cents, rcbs, rdsub, nProbe, k, rerank,
      Some(embSlim.unionByName(incVecs)), residual = true)
    val nC = compacted.count()
    val tComp = (System.nanoTime() - t11) / 1e9
    val drift = unioned.select("query_id", "neighbor_id")
      .exceptAll(compacted.select("query_id", "neighbor_id")).count()
    println(f"""{"stage":"compaction","increment_rows":$nInc,"encode_sec":$tEncode%.2f,"union_search_sec":$tUnion%.2f,"compact_sec":$tCompact%.2f,"compacted_search_sec":$tComp%.2f,"union_ms_per_query":${tUnion * 1000 / math.max(nQ, 1)}%.1f,"compacted_ms_per_query":${tComp * 1000 / math.max(nQ, 1)}%.1f,"results_union":$nU,"results_compacted":$nC,"result_drift":$drift}""")

    // ---- maintenance LOOP: N raw append windows, then compact ------ //
    // What a deployment actually does between compactions: each ingest
    // window writes its encoded increment as PLAIN (unbucketed) parquet
    // next to the bucketed base, and pruned search reads base ∪ all
    // accumulated raw files. The raw side has no bucket metadata, so
    // its scan cannot prune — per-window search cost should degrade
    // proportionally to accumulated raw rows, and one compaction
    // ([[Similarity.compactAdcIndexBucketed]]) must restore the
    // bucketed-base latency. One JSON row per window + one after
    // compaction; the flat-vs-degraded pair is the STRESS.md evidence
    // the compaction scaladoc's "per window" claim was missing.
    val windows = if (args.length > 4) args(4).toInt else 4
    // increment fraction = 1/incrDenom of the corpus per window
    // (default 1%; pass a smaller denom to exaggerate the erosion)
    val incrDenom = if (args.length > 5) args(5).toLong else 100L
    // Divisibility keeps each reserved slice a SINGLE residue class
    // mod incrDenom that the window cycle can skip: the compaction
    // increment is vec_id % 100 == 7 (residue 7 % incrDenom) and the
    // query batch vec_id % 1000 == 0 (residue 0 — incrDenom | 100 ⇒
    // incrDenom | 1000). A non-divisor (e.g. 30) smears both slices
    // across several residues and windows silently re-contain query/
    // compaction vectors.
    require(incrDenom > 4 && 100L % incrDenom == 0,
      s"incrDenom must be > 4 and divide 100 (got $incrDenom): window " +
        "residues must be able to skip the compaction slice " +
        "(vec_id % 100 == 7) and the query slice (vec_id % 1000 == 0) " +
        "as single residue classes")
    if (windows > 0) {
      val rawDir = s"$dir2/raw_incr"
      var wIncVecs = Vector.empty[org.apache.spark.sql.DataFrame]
      (1 to windows).foreach { w =>
        // a fresh 1/incrDenom slice per window, ids offset past
        // everything. The residue cycles over 1..incrDenom-1 SKIPPING
        // the compaction-increment residue (7 % incrDenom — see the
        // divisibility require above) and never hits 0 (the
        // vec_id % 1000 == 0 query ids) — the old `w % (incrDenom-3)`
        // form landed on 0 whenever w was a multiple of incrDenom-3,
        // polluting that window's content with the query vectors and
        // skewing the per-window degradation comparison.
        val off = (maxId + 1L) * (w + 1L)
        val skipR = 7L % incrDenom
        val r0 = 1L + ((w - 1L) % (incrDenom - 2L))
        val residue = if (r0 >= skipR) r0 + 1L else r0
        val vecs = emb
          .filter(pmod(col("vec_id"), lit(incrDenom)) === residue)
          .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"))
        wIncVecs :+= vecs
        Similarity.buildResidualAdcIndex(vecs, cents, rcbs, rdsub)
          .write.mode("append").parquet(rawDir)
        val raws = spark.read.parquet(rawDir)
        val rawRows = raws.count()
        val allVecs = wIncVecs.foldLeft(embSlim)(_ unionByName _)
        val tw = System.nanoTime()
        val rws = Similarity.ivfAdcSearchPruned(q,
          spark.table("adc_probe_idx").unionByName(raws),
          cents, rcbs, rdsub, nProbe, k, rerank, Some(allVecs),
          residual = true)
        val nW = rws.count()
        val twSec = (System.nanoTime() - tw) / 1e9
        println(f"""{"stage":"maintenance_window","window":$w,"raw_rows":$rawRows,"results":$nW,"search_sec":$twSec%.2f,"ms_per_query":${twSec * 1000 / math.max(nQ, 1)}%.1f}""")
      }
      val allRaw = spark.read.parquet(rawDir)
      val tc = System.nanoTime()
      Similarity.compactAdcIndexBucketed(spark, "adc_probe_idx", allRaw,
        "adc_probe_idx_v3", buckets, Some(s"$dir2/adc_probe_idx_v3"))
      val tcSec = (System.nanoTime() - tc) / 1e9
      val allVecs = wIncVecs.foldLeft(embSlim)(_ unionByName _)
      val tf = System.nanoTime()
      val fin = Similarity.ivfAdcSearchPruned(q,
        spark.table("adc_probe_idx_v3"), cents, rcbs, rdsub, nProbe, k,
        rerank, Some(allVecs), residual = true)
      val nF = fin.count()
      val tfSec = (System.nanoTime() - tf) / 1e9
      println(f"""{"stage":"maintenance_compacted","windows":$windows,"compact_sec":$tcSec%.2f,"results":$nF,"search_sec":$tfSec%.2f,"ms_per_query":${tfSec * 1000 / math.max(nQ, 1)}%.1f}""")
    }
    spark.stop()
  }
}
