package graft

import graft.usage.HourProration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness: synthesizes attempts with `spark.range` (no
  * disk, no driver-side data) and measures the hot pipeline stages at
  * row counts far beyond the sf0.1 bench, to validate the 100 TB
  * design claims with observed throughput:
  *
  *   1. hour-proration fan-out + 6-key cube (the W-E core);
  *   2. shingle→minhash signature computation (the dedup core).
  *
  * Usage: `sbt "runMain graft.StressBench [rows] [docs]"` — defaults
  * 20M attempts / 200k docs. Prints one JSON line per stage with
  * rows/sec. Not part of the driver gate; numbers land in STRESS.md.
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val nAttempts = if (args.nonEmpty) args(0).toLong else 20000000L
    val nDocs = if (args.length > 1) args(1).toLong else 200000L
    // optional 3rd arg: only run stages whose name contains this substring
    val only = if (args.length > 2) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(name: String, inputRows: Long)(f: => Long): Unit = {
      if (only.nonEmpty && !name.contains(only)) return
      val t0 = System.nanoTime()
      val outRows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"$name","input_rows":$inputRows,"output_rows":$outRows,"sec":$s%.2f,"rows_per_sec":${(inputRows / s).toLong}}""")
    }

    // --- stage 1: proration + cube over synthetic attempts ---------- //
    // deterministic attempts: ~1000 users, 4 clusters, start spread over
    // 100 days, durations 0..4h (mean ~2h ⇒ fan-out ~×3)
    val attempts = spark.range(nAttempts)
      .withColumn("user", concat(lit("u"), pmod(col("id"), lit(1000))))
      .withColumn("cluster", concat(lit("c"), pmod(col("id"), lit(4))))
      .withColumn("taskType",
        when(pmod(col("id"), lit(3)) === 0, "REDUCE").otherwise("MAP"))
      .withColumn("status",
        when(pmod(col("id"), lit(11)) === 0, "FAILED")
          .when(pmod(col("id"), lit(7)) === 0, "KILLED")
          .otherwise("SUCCESS"))
      .withColumn("excess", pmod(col("id"), lit(5)) === 0)
      .withColumn("startMs",
        (pmod(col("id") * 2654435761L, lit(100L * 86400000L))))
      .withColumn("durMs", pmod(col("id") * 40503L, lit(4L * 3600000L)))
      .withColumn("finishMs", col("startMs") + col("durMs"))
    timed("proration_cube", nAttempts) {
      HourProration.explodeHours(attempts, col("startMs"), col("finishMs"))
        .groupBy("user", "hourMs", "cluster", "excess", "taskType", "status")
        .agg(sum("overlapMs").as("elapsedMs"),
          sum("started").as("started"), sum("finished").as("finished"))
        .count()
    }

    // --- stage 1b: skewed assembly — one monster job --------------- //
    // 1 jobId carrying `nMonster` attempts (2 log lines each) among
    // 1000 normal 10-attempt jobs: the worst-case key for the
    // groupByKey(jobId) shuffle. Validates the JobAssembly scale note
    // ("group size bounded by tasks-per-job ⇒ fits an executor") with
    // an observed run instead of a claim.
    val nMonster = 100000L
    val monsterLines = spark.range(nMonster).flatMap { i =>
      val att = f"attempt_900000_1_m_$i%06d_0"
      val tid = f"task_900000_1_m_$i%06d"
      Seq(
        s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" START_TIME="${1000 + i}" .""",
        s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" TASK_STATUS="SUCCESS" FINISH_TIME="${2000 + i}" COUNTERS="[(CPU_MILLISECONDS)(cpu)(500)]" .""")
    }
    val normalLines = spark.range(1000L * 10).flatMap { k =>
      val j = 10000 + k / 10; val i = k % 10
      val att = f"attempt_${j}_2_m_$i%06d_0"
      val tid = f"task_${j}_2_m_$i%06d"
      Seq(
        s"""Job JOBID="job_${j}_2" JOBNAME="x" USER="u$j" SUBMIT_TIME="500" .""",
        s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" START_TIME="${1000 + i}" .""",
        s"""MapAttempt TASK_TYPE="MAP" TASKID="$tid" TASK_ATTEMPT_ID="$att" TASK_STATUS="SUCCESS" FINISH_TIME="${2000 + i}" .""",
        s"""Job JOBID="job_${j}_2" FINISH_TIME="3000" JOB_STATUS="SUCCESS" .""")
    }
    val skewedInput = monsterLines
      .union(spark.createDataset(Seq(
        """Job JOBID="job_900000_1" JOBNAME="monster" USER="um" SUBMIT_TIME="500" .""",
        """Job JOBID="job_900000_1" FINISH_TIME="999999" JOB_STATUS="SUCCESS" .""")))
      .union(normalLines)
    val nSkewLines = 2 * nMonster + 2 + 4 * 1000 * 10
    timed("skewed_assembly_monster_job", nSkewLines) {
      implicit val s: SparkSession = spark
      val jobs = graft.etl.JobAssembly.assembleJobs(skewedInput, "c")
      // force full tree construction AND read a derived value
      val (nJobs, nAttempts2) = jobs
        .map(j => (1L, j.tasks.map(_.attempts.size.toLong).sum))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      require(nJobs == 1001 && nAttempts2 == nMonster + 10000,
        s"assembly mismatch: $nJobs jobs, $nAttempts2 attempts")
      nJobs
    }

    // --- stage 2: shingle + minhash signatures over synthetic docs -- //
    val words = (0 until 64).map(i => s"w$i")
    val wordArr = array(words.map(lit): _*)
    val docs = spark.range(nDocs)
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(0), lit(79)),
          i => element_at(wordArr,
            (pmod(col("id") * 31 + i * 7 + (col("id") + i) * (col("id") + i), lit(64)) + 1)
              .cast("int")))))
    timed("minhash_signatures", nDocs) {
      // read the aggregate VALUE — count() alone lets Catalyst fold the
      // one-row aggregate away without computing any signature
      val checksum = docs.select(
        graft.functions.HashExpressions.shingleHashes(col("text"), 5).as("hs"))
        .select(graft.functions.HashExpressions.minHashSig(col("hs")).as("sig"))
        .select(sum(element_at(col("sig"), 1)).as("s"))
        .first().getLong(0)
      checksum % 1000000
    }

    // --- stage 3: corpus-curation operators over the same docs ------ //
    val docsWithId = docs.withColumnRenamed("id", "doc_id")
    timed("repetition_stats", nDocs) {
      graft.operators.Corpus.repetitionStats(docsWithId)
        .agg(sum("top_bigram_cnt")).first().getLong(0) % 1000000
    }
    timed("tfidf_topk", nDocs) {
      graft.operators.Corpus.tfIdfTopTerms(docsWithId, 3).count()
    }

    // --- stage 4: banded-LSH ANN at 100× the bench vector count ----- //
    // Deterministic pseudo-random embeddings straight from spark.range,
    // components from xxhash64(id, i) — a linear-congruential formula
    // here collapses to id mod 2000 and yields 100-deep identical
    // vectors, whose duplicate groups no bucketing can split.
    // Bits-per-band must grow with N to stay sub-quadratic
    // (volume ∝ nBands·N²/2^bits): at 200 k vectors the 2-band×16-bit
    // config keeps the candidate join ~N²/65536 per band.
    val nVecs = 200000L
    val emb = spark.range(nVecs)
      .withColumn("vec_id", col("id"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(col("id"), i), lit(2000L)) - 1000L) / 1000.0)
            .cast("float")))
    timed("lsh_ann_200k_vectors", nVecs) {
      graft.operators.Similarity
        .lshTopK(emb, dim = 64, nPlanes = 32, nBands = 2, k = 3)
        .count()
    }

    // --- stage 4b: composed IVFADC at the same vector count ---------- //
    // The 10⁹⁺ shape (q88): 512 IVF cells (~390 vectors each), 8×16
    // PQ codebooks, 8 probed cells, ADC scan over the slim codes
    // index, exact rerank of the top-50 shortlist. The scan side
    // never carries raw vectors — candidates ∝ Σ probed-cell sizes
    // (~3.1k per query here), the property that distinguishes this
    // from ivfTopK's exact-dot rerank at scale.
    val ivfCells512: Seq[(Int, Seq[Double])] = (0 until 512).map { j =>
      j -> (0 until 64).map(i =>
        (((j * 2654435761L + i * 40503L) % 2000L) - 1000L) / 1000.0).toSeq
    }
    val pqCodebooks8x16: Seq[(Int, Int, Seq[Double])] =
      for (s <- 0 until 8; c <- 0 until 16) yield (s, c,
        (0 until 8).map(i =>
          (((s * 7349L + c * 524287L + i * 40503L) % 2000L) - 1000L) / 1000.0).toSeq)
    timed("ivfadc_200k_vectors", nVecs) {
      graft.operators.Similarity.ivfAdcTopK(emb,
          pmod(col("vec_id"), lit(1000L)) === 0, // 200 queries
          ivfCells512, pqCodebooks8x16, dsub = 8,
          nProbe = 8, k = 5, rerank = 50)
        .count()
    }

    // --- stage 5: as-of join at scale ------------------------------- //
    // nAttempts left rows against nAttempts/4 right rows over 1000 keys
    // (per-key history ~right/1000 — the bounded-history regime the
    // operator is designed for)
    val asofLeft = spark.range(nAttempts)
      .select(col("id"), pmod(col("id"), lit(1000)).as("k"),
        pmod(col("id") * 2654435761L, lit(100L * 86400000L)).as("ts"))
    val asofRight = spark.range(nAttempts / 4)
      .select(pmod(col("id"), lit(1000)).as("k"),
        pmod(col("id") * 40503L, lit(100L * 86400000L)).as("ts"),
        (col("id") % 977).as("v"))
      .groupBy("k", "ts").agg(max("v").as("v")) // unique per (k, ts)
    timed("asof_join", nAttempts) {
      graft.operators.AsOf
        .asofJoin(asofLeft, asofRight, Seq("k"), "ts", Seq("v"))
        .agg(count(lit(1)), sum("asof_v")).first().getLong(0)
    }

    // --- stage 6: binned range join --------------------------------- //
    // nAttempts points vs nAttempts/100 hour-long intervals over the
    // same 100-day span, 5-min bins (12 bins/interval)
    val rjPoints = asofLeft
    val rjIvs = spark.range(nAttempts / 100)
      .select(col("id").as("iv_id"), pmod(col("id"), lit(1000)).as("k"),
        pmod(col("id") * 48271L, lit(100L * 86400000L)).as("lo"))
      .withColumn("hi", col("lo") + 3600000L)
    timed("range_join", nAttempts) {
      graft.operators.RangeJoin
        .intervalJoin(rjPoints, rjIvs, Seq("k"), "ts", "lo", "hi",
          binWidth = 3600000L)
        .count()
    }

    // --- stage 7: connected components on a power-law-ish graph ----- //
    // nDocs*4 edges over nDocs nodes arranged as many small clusters
    // (mod-sharded stars + a few long chains) — the dedup-graph shape
    val ccEdges = spark.range(nDocs * 4)
      .select(
        (pmod(col("id"), lit(nDocs / 10)) * 10 +
          pmod(col("id") * 7, lit(10))).as("a"),
        (pmod(col("id"), lit(nDocs / 10)) * 10).as("b"))
      .union(spark.range(nDocs / 100) // 8-star chains (diameter stays
        // far below maxIter; min-propagation is diameter-bounded)
        .select(((col("id") / 7) * 8 + pmod(col("id"), lit(7))).multiply(10).as("a"),
          ((col("id") / 7) * 8 + pmod(col("id"), lit(7)) + 1).multiply(10).as("b")))
    timed("connected_components", nDocs * 4 + nDocs / 100) {
      graft.operators.Dedup
        .connectedComponents(ccEdges, "a", "b")
        .agg(countDistinct("component")).first().getLong(0)
    }

    // --- stage 8: sub-document span duplication --------------------- //
    timed("span_dedup_stats", nDocs) {
      graft.operators.Corpus
        .duplicateSpanStats(docsWithId, n = 8, minDf = 2)
        .agg(sum("n_dup_spans")).first().getLong(0) % 1000000
    }
    // same operator on the xxhash64 gram fast path (production knob;
    // the exact polyhash family above stays the oracle default) — the
    // per-gram cost drops from O(len·n) char re-hashing to O(len +
    // windows·n) token-hash combining
    timed("span_dedup_stats_fast", nDocs) {
      graft.operators.Corpus
        .duplicateSpanStats(docsWithId, n = 8, minDf = 2, fastGrams = true)
        .agg(sum("n_dup_spans")).first().getLong(0) % 1000000
    }
    // isolated hashing kernels (narrow scan, no shuffle): the full
    // operator above mixes hashing with the two gram shuffles, so the
    // kernel ratio — the thing the fast path changes — is measured on
    // its own. `sum(size(...))` forces every gram without exploding.
    timed("gram_kernel_exact", nDocs) {
      docsWithId.select(size(graft.functions.HashExpressions
          .tokenNGramHashes(col("text"), 8)).as("n"))
        .agg(sum("n")).first().getLong(0) % 1000000
    }
    timed("gram_kernel_fast", nDocs) {
      docsWithId.select(size(graft.functions.HashExpressions
          .tokenNGramXxHashes(col("text"), 8)).as("n"))
        .agg(sum("n")).first().getLong(0) % 1000000
    }

    // --- stage 9: ordered funnel + cohort over synthetic events ----- //
    // nAttempts events over 100 k users, 4 types, 100-day span — the
    // funnel is 3 aggregate passes on user_id, the retention triangle
    // two aggregates + a join; both shuffle-bound, no windows
    val evTypes = array(lit("view"), lit("click"), lit("purchase"), lit("other"))
    val events = spark.range(nAttempts).select(
      pmod(col("id"), lit(100000L)).as("user_id"),
      element_at(evTypes,
        (pmod(col("id") * 48271L, lit(4)) + 1).cast("int")).as("event_type"),
      pmod(col("id") * 2654435761L, lit(100L * 86400000L)).as("tsMs"))
    timed("funnel_stages", nAttempts) {
      graft.operators.EventAnalytics
        .funnelStages(events, Seq("view", "click", "purchase"))
        .agg(sum("stage")).first().getLong(0) % 1000000
    }
    timed("cohort_retention", nAttempts) {
      graft.operators.EventAnalytics.cohortRetention(events).count()
    }

    // --- stage 10: PII scan (regex-heavy narrow map) ---------------- //
    timed("pii_scan", nDocs) {
      graft.operators.Corpus.piiScan(
          docsWithId.withColumn("text", concat(col("text"),
            lit(" u"), col("doc_id"), lit("@ex.com via 10.0.0.1"))))
        .agg(sum("n_email")).first().getLong(0) % 1000000
    }

    // --- stage 11: vocabulary coverage (explode + top-k + join) ----- //
    timed("vocabulary_coverage", nDocs) {
      graft.operators.Corpus.vocabularyCoverage(docsWithId, 32)
        .agg(sum("n_oov"), sum("n_tokens")).first().getLong(1) % 1000000
    }

    // --- stage 12: semantic dedup at 100× the bench vector count ---- //
    // 512 deterministic pseudo-random centroids: the SemDeDup scale
    // knob is cluster COUNT — within-cell pair volume is Σ cell², so
    // cells must stay small (~400 vectors here) as N grows; the paper
    // uses ~50 k clusters at web scale for the same reason. Assignment
    // cost (N × nCentroids broadcast dots) is the other side of the
    // trade — both are measured here.
    val stressCentroids: Seq[(Int, Seq[Double])] = (0 until 512).map { j =>
      j -> (0 until 64).map(i =>
        (((j * 2654435761L + i * 40503L) % 2000L) - 1000L) / 1000.0).toSeq
    }
    timed("semantic_dedup_200k_vectors", nVecs) {
      val pinned = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
      val n = graft.operators.Dedup
        .semanticDedup(emb, stressCentroids, tau = 0.6, pin = pinned += _)
        .filter(col("is_dup")).count()
      pinned.foreach(_.unpersist()) // scoped: other pinned caches survive
      n
    }

    // --- stage 13: bloom-prefiltered decontamination ----------------- //
    // 200 k-doc corpus against a 1 000-doc probe set: the corpus side
    // sees only the bloom bits; candidates confirm through the exact
    // join (result identical to the exact-broadcast operator)
    timed("bloom_decontamination", nDocs) {
      graft.operators.Corpus
        .contaminationCheckBloom(docsWithId,
          docsWithId.filter(col("doc_id") < 1000), n = 7, minMatches = 2)
        .agg(sum(when(col("contaminated"), 1L).otherwise(0L)))
        .first().getLong(0)
    }
    timed("bloom_decontamination_fast", nDocs) {
      graft.operators.Corpus
        .contaminationCheckBloom(docsWithId,
          docsWithId.filter(col("doc_id") < 1000), n = 7, minMatches = 2,
          fastGrams = true)
        .agg(sum(when(col("contaminated"), 1L).otherwise(0L)))
        .first().getLong(0)
    }

    // --- stage 14: sequence packing ---------------------------------- //
    // contiguous concat-and-chunk over (source, 64 shards): the window
    // cumsum parallelizes 20×64 ways — throughput should track the
    // token-count scan, not a single-partition sort
    val docsWithSource = docsWithId
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20))))
    timed("sequence_packing", nDocs) {
      graft.operators.Corpus
        .packSequences(docsWithSource, budget = 2048L, nShards = 64)
        .agg(sum("seq_tokens")).first().getLong(0) % 1000000
    }

    // --- stage 15b: blocked fuzzy edit distance ---------------------- //
    // the honest cost of the exact operator: a Levenshtein DP per
    // surviving pair dominates everything else in this file (~480-char
    // texts ⇒ ~10 µs/pair even with the threshold band). 10 k docs over
    // 2 000 blocks ≈ 20 k pair-DPs — the full self-join form is a
    // backfill tool; steady state runs the incremental variant (pair
    // volume ∝ increment, not corpus²/blocks)
    // the operator reads its input several times (slim join, shingle
    // attach, text attach) — materialize the synthetic slice once so
    // the measurement is the OPERATOR, not repeated limit+generation
    // (a real pipeline's parquet scans are cheap column-pruned
    // re-reads; the synthetic limit() pipeline is not)
    val fuzzyDocs = docsWithId.limit(10000)
      .withColumn("blk", pmod(col("doc_id"), lit(2000)))
      .withColumn("blk200", pmod(col("doc_id"), lit(200)))
      .localCheckpoint()
    timed("fuzzy_edit_distance_10k", 10000L) {
      graft.operators.Dedup.editDistancePairs(
          fuzzyDocs, Seq("blk"), maxDist = 60)
        .count()
    }
    // DP-dominated regime (50-doc blocks → ~1.2 M candidate DPs):
    // the lossless q-gram prune discards non-duplicate block-join
    // survivors with an O(len) merge scan before the O(len·k) DP —
    // identical output, the DP volume collapses to the true pairs
    timed("fuzzy_edit_distance_bigblock", 10000L) {
      graft.operators.Dedup.editDistancePairs(
          fuzzyDocs, Seq("blk200"), maxDist = 60)
        .count()
    }
    timed("fuzzy_edit_distance_bigblock_pruned", 10000L) {
      graft.operators.Dedup.editDistancePairs(
          fuzzyDocs, Seq("blk200"), maxDist = 60, prefilterGram = 4)
        .count()
    }

    // --- stage 15: importance weighting ------------------------------ //
    // DSIR-shaped scoring of the full corpus against the s0 slice: one
    // token explode, term-keyed weight join, doc-keyed partial agg
    timed("importance_weights", nDocs) {
      graft.operators.Corpus
        .importanceWeights(docsWithSource, col("source") === "s0")
        .agg(sum("score_sum")).first().getLong(0) % 1000000
    }

    // --- stage 16: bigram LM scoring --------------------------------- //
    // one bigram explode feeding both count tables, bigram-keyed join
    // back, doc-keyed partial agg — vocabulary² (64² here) bounds the
    // model table regardless of corpus size
    timed("bigram_lm_scores", nDocs) {
      graft.operators.Corpus.bigramLmScores(docsWithSource)
        .agg(sum("lm_sum")).first().getLong(0) % 1000000
    }

    // --- stage 17: per-source cap under heavy skew ------------------- //
    // 90% of documents in ONE source: the two-phase shard/top-k must
    // keep the hot source parallel (the single-window form would pull
    // 180 k rows through one task)
    val skewedSource = docsWithId.withColumn("source",
      when(pmod(col("doc_id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("cold"), pmod(col("doc_id"), lit(97)))))
    timed("per_source_cap_skewed", nDocs) {
      graft.operators.Corpus.perSourceCap(skewedSource, cap = 1000, nShards = 64)
        .count()
    }

    // --- stage 18: real pixel decode throughput ---------------------- //
    // 50 k genuinely-deflated 16×12 PNGs decoded (inflate + unfilter)
    // with channel stats — the multimodal content tier's narrow map
    timed("pixel_decode_50k_png", 50000L) {
      val media = graft.operators.Multimodal.decodePixelStats(
        spark.range(50000).select(col("id").as("doc_id"))
          .as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .map { id =>
            val rgb = Array.tabulate[Byte](16 * 12 * 3)(i => ((id + i) % 256).toByte)
            (id, graft.operators.PixelDecode.pngPixelFixture(16, 12, rgb))
          }(org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.BINARY))
          .toDF("doc_id", "media"))(spark)
      media.agg(sum("sum_r")).first().getLong(0) % 1000000
    }

    spark.stop()
  }
}
