package graft.app

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the operator family composed the way a
  * pretraining data pipeline actually runs it, documents in → training
  * chunks out:
  *
  *   1. quality filter (C4-style rule battery, keep only passing docs)
  *   2. exact dedup (keep the canonical min-id copy per content hash)
  *   3. minhash near-dup (drop the higher-id side of verified pairs)
  *   4. benchmark decontamination (bloom-prefiltered, exact confirm —
  *      drop docs overlapping the probe set)
  *   5. hash-stratified sampling (per-language rates, reproducible)
  *   6. context-window chunking + deterministic training-order rank
  *      (the training-ready output)
  *
  * Order matters and is load-bearing: exact dedup BEFORE similarity
  * (identical copies defeat LSH bucketing — measured in STRESS.md),
  * filters before pair generators (fewer candidates), sampling after
  * dedup (or the sample rate compounds with duplication), chunking
  * last.
  *
  * Every stage is a narrow filter or a bucket-join — the pipeline
  * inherits each operator's documented 100 TB posture. Stage counts
  * are returned for observability (a silent 90% drop is a data bug,
  * not a success).
  */
object CurateCorpus {

  final case class StageCounts(
      input: Long, quality: Long, exactDedup: Long, nearDedup: Long,
      decontaminated: Long, sampled: Long, chunks: Long)

  /** Run the chain; write the chunk table to `outDir` partitioned by
    * language; return per-stage document counts. `probes` is the
    * held-out benchmark set for decontamination (pass an empty
    * DataFrame with a `text` column to skip). Optional governance
    * knobs: `minLmScore` drops documents under the corpus-bigram LM
    * quality score (joins the quality stage); `maxDocsPerSource` caps
    * each source's contribution after sampling (highest-token-count
    * docs win, [[Corpus.perSourceCap]]). */
  /** `fastGrams` switches the decontamination stage's gram hashing to
    * the native xxhash64 kernel ([[graft.functions.HashExpressions
    * .TokenNGramXxHashes]] — 3.5× the oracle-exact polyhash on the
    * hashing kernel, parity pinned in HashExprSpec at gate scale).
    *
    * Collision asymmetry, measured at 500 k docs / 2 k probes
    * (STRESS.md round 10): in EITHER family a gram-hash collision can
    * only ADD a phantom match (drop a clean doc as "contaminated"),
    * never leak a contaminated doc through — but the RATES differ by
    * ~2³⁴. The polyhash's oracle-SQL-expressible modulus (P = 1e9+7,
    * ~2³⁰ space) enters the birthday regime around 10⁵ probe grams:
    * with minMatches = 1 it phantom-flagged 1 786 clean docs (44 % of
    * its flags) where the 2⁶⁴ xxhash64 space flagged zero phantoms
    * (fast survivor set was a strict SUPERSET, confirmed by set
    * algebra: slow-only survivors = 0). At production scale the fast
    * path is therefore both faster AND more accurate; the polyhash
    * stays the default only because it is the DuckDB-mirrorable gate
    * shape (the small modulus is exactly what keeps the oracle SQL's
    * `(h*31+c) % P` inside BIGINT). */
  def run(docs: DataFrame, probes: DataFrame, outDir: String,
      sampleKeepOf: Map[String, Long] = Map.empty,
      sampleDefaultKeep: Long = 20L, sampleMod: Long = 20L,
      chunkTokens: Int = 64, chunkStride: Int = 48,
      minLmScore: Option[Long] = None,
      maxDocsPerSource: Option[Int] = None,
      fastGrams: Boolean = false,
      dedupMode: String = "auto")(
      implicit spark: SparkSession): StageCounts = {
    require(Set("pairs", "groups", "auto", "jaccard")(dedupMode),
      s"dedupMode must be pairs|groups|auto|jaccard, got $dedupMode")
    // Each stage output is pinned and materialized by its count —
    // without the persist, every downstream stage (and the final
    // write) re-executes the whole upstream chain, making the
    // pipeline cost quadratic in stages. The counts are wanted for
    // observability anyway, so materialization is free; caches are
    // dropped once the chunks are written.
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def stage(df: DataFrame): (DataFrame, Long) = {
      val c = df.cache(); pinned += c; (c, c.count())
    }
    try {
      val input = docs.count()

      // 1. quality: keep passing doc_ids (filters are narrow — they
      // reach the scan when the fact is columnar); the optional LM
      // gate composes here — both are per-doc predicates
      val qualityIds = Corpus.qualityFilter(docs)
        .filter(col("keep")).select("doc_id")
      val keptIds = minLmScore match {
        case Some(minScore) => qualityIds.join(
          Corpus.bigramLmScores(docs)
            .filter(col("lm_score") >= minScore).select("doc_id"),
          "doc_id")
        case None => qualityIds
      }
      val (quality, nQuality) = stage(docs.join(keptIds, "doc_id"))

      // 2. exact dedup: canonical copy only
      val (exact, nExact) = stage(quality.join(
        Dedup.exactDupGroups(quality)
          .filter(col("doc_id") === col("canonical_id")).select("doc_id"),
        "doc_id"))

      // 3. near-dup. The pipeline only needs SURVIVORS, so the pair
      // list is an implementation detail — and its volume is
      // data-quadratic inside a duplicate family (Σ family²: one
      // 37 500-member gen_skew family is ~7×10⁸ true pairs). "auto"
      // routes on the measured candidate bound: the familiar verified-
      // pairs shape while the bound stays within budget (the gate
      // regime — small families, pair list ≈ linear), the star-edge
      // groups labeling ([[Dedup.lshDupGroups]], edge volume ≤
      // nBands·N) beyond it, so a skewed 100 TB corpus cannot
      // accidentally materialize a quadratic pair set on the way to a
      // survivor list. Budget: 256 candidate pairs/doc — a corpus
      // whose candidate mass is O(1) per doc is linear however big it
      // grows (the campaign's uniform corpus measures ~186/doc at
      // BOTH 50 k and 500 k docs: its boilerplate families replicate
      // per copy, so Σfamily² grows ∝ N), while quadratic families
      // push the per-doc rate unbounded (gen_skew: 94/doc at 50 k,
      // 938/doc at 500 k, ~10× per decade). 32/doc was measured too
      // tight — it flipped the linear uniform corpus too. Floor 10⁶
      // so tiny runs never flap. Both modes keep each family's
      // min-id member: pairs drops every verified doc_b (higher id),
      // groups keeps doc_id == canonical (component min) — identical
      // on mutually-similar families, divergent only on borderline
      // chains (lshDupGroups scaladoc documents the trade). The pin
      // hook shares the cached signature rel between the bound
      // estimate and the chosen operator (plan-identical → one
      // materialization).
      val dedupChosen = dedupMode match {
        case "auto" =>
          val budget = math.max(256L * nExact, 1000000L)
          val bound = Dedup.lshPairBound(exact, pinned += _)
          val pick = if (bound > budget) "groups" else "pairs"
          graft.operators.Parallelism.logDispatch("CurateCorpus.nearDup",
            s"candidatePairBound=$bound budget=$budget -> $pick")
          pick
        case m => m
      }
      val (near, nNear) =
        if (dedupChosen == "jaccard") {
          // the exact blocked n-gram jaccard EDGE family instead of
          // minhash pairs — routed by the same measured-statistic
          // discipline ([[Dedup.jaccardEdgesAuto]]: exact block pairs
          // within budget, banded star edges beyond — the r12 sf100
          // refusal turned into a route), then transitive labeling
          // keeps each component's min-id member (the "groups"
          // survivor contract)
          val edges = Dedup.jaccardEdgesAuto(exact, Seq("lang", "source"),
            n = 3, threshold = 0.6, pin = pinned += _)
          val comp = Dedup.connectedComponents(edges, "doc_a", "doc_b")
          val survivors = exact.select("doc_id")
            .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
            .filter(col("component").isNull || col("doc_id") === col("component"))
            .select("doc_id")
          stage(exact.join(survivors, "doc_id"))
        } else if (dedupChosen == "groups") {
          val survivors = Dedup.lshDupGroups(exact, 0.6, pinned += _)
            .filter(col("doc_id") === col("canonical_id"))
            .select("doc_id")
          stage(exact.join(survivors, "doc_id"))
        } else {
          val dropNear = Dedup.minHashLshPairs(exact, 0.6, pinned += _)
            .select(col("doc_b").as("doc_id")).distinct()
          stage(exact.join(dropNear, Seq("doc_id"), "left_anti"))
        }

      // 4. decontamination vs the probe set — the bloom-prefiltered
      // form (the corpus side sees the filter bits, only candidates
      // reach the exact confirm join; result identical to the exact
      // broadcast, see CurationOpsSpec); its gram index joins this
      // run's cache lifecycle via the pin hook
      val contaminated = Corpus
        .contaminationCheckBloom(near, probes, n = 5, minMatches = 1,
          fastGrams = fastGrams, pin = pinned += _)
        .filter(col("contaminated")).select("doc_id")
      val (clean, nClean) = stage(near.join(contaminated, Seq("doc_id"), "left_anti"))

      // 5. reproducible stratified sample, then the optional per-source
      // cap (mixing governance — no source may dominate the output)
      val sampledBase = clean.join(
        Corpus.hashStratifiedSample(clean, "lang",
          sampleKeepOf, sampleDefaultKeep, sampleMod).select("doc_id"),
        "doc_id")
      val (sampled, nSampled) = stage(maxDocsPerSource match {
        case Some(cap) => sampledBase.join(
          Corpus.perSourceCap(sampledBase, cap).select("doc_id"), "doc_id")
        case None => sampledBase
      })

      // 6. chunk, stamp the deterministic training order (same seed →
      // same permutation on any cluster; readers shuffle-free by
      // sorting on train_rank), and write partitioned by language
      val order = Corpus.shuffleRank(sampled, seed = 42L)
        .select(col("doc_id"), col("rank").as("train_rank"))
      val chunks = Corpus.chunkDocuments(sampled, chunkTokens, chunkStride)
        .join(sampled.select("doc_id", "lang"), "doc_id")
        .join(order, "doc_id")
      chunks.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(outDir)
      val nChunks = spark.read.parquet(outDir).count()

      StageCounts(input, nQuality, nExact, nNear, nClean, nSampled, nChunks)
    } finally pinned.foreach(_.unpersist())
  }

  /** CLI: `runMain graft.app.CurateCorpus <docsPath> <outDir>
    * [probesPath]` — docs as parquet or .jsonl/.json (JSONL goes
    * through the quarantining reader); probes optional (parquet). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateCorpus <docsPath> <outDir> [probesPath]")
    implicit val spark: SparkSession = graft.GraftSession.create("curate-corpus")
    val docs =
      if (args(0).endsWith(".jsonl") || args(0).endsWith(".json")) {
        val (clean, quarantine) =
          graft.sources.CorpusSources.readJsonlDocs(spark, args(0))
        val nBad = quarantine.count()
        if (nBad > 0) println(s"[curate] quarantined $nBad malformed lines")
        clean
      } else spark.read.parquet(args(0))
    import spark.implicits._
    val probes =
      if (args.length > 2) spark.read.parquet(args(2))
      else Seq.empty[String].toDF("text")
    // Config-VERSIONED kernel selection (RELEASE_NOTES.md "curate v2"):
    // v2 (the default) hashes decontamination grams with xxhash64 —
    // at production scale both faster and phantom-free, while the v1
    // polyhash family's 2³⁰ modulus phantom-flags clean docs past
    // ~10⁵ probe grams (STRESS.md round 10). v2 output is NOT
    // byte-identical to v1: previously phantom-dropped docs survive,
    // so consumers expecting reproducible v1 corpora must pin
    // SPARK_GRAFT_CURATE_V=1 (or re-baseline). SPARK_GRAFT_FAST_GRAMS
    // (=0 oracle polyhash / =1 xxhash64) force-overrides either
    // version for parity debugging — the gate shape stays the
    // DuckDB-mirrorable polyhash path.
    val ver = sys.env.getOrElse("SPARK_GRAFT_CURATE_V", "2")
    require(ver == "1" || ver == "2", s"SPARK_GRAFT_CURATE_V must be 1 or 2, got $ver")
    val fast = sys.env.get("SPARK_GRAFT_FAST_GRAMS") match {
      case Some(v) => v != "0"
      case None    => ver != "1"
    }
    // SPARK_GRAFT_DEDUP=pairs|groups|auto|jaccard (default auto):
    // force the near-dup survivor strategy; auto routes on the
    // measured candidate-pair bound (see run()'s stage-3 comment);
    // jaccard switches to the exact blocked n-gram edge family,
    // itself auto-routed to banded star edges past its block bound
    val dedup = sys.env.getOrElse("SPARK_GRAFT_DEDUP", "auto")
    val counts = run(docs, probes, args(1), fastGrams = fast,
      dedupMode = dedup)
    println(s"[curate] $counts")
    spark.stop()
  }
}
