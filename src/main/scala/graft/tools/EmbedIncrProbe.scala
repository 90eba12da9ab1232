package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main (not part of the driver contract): the
  * incremental embedding near-dup path
  * ([[graft.operators.Dedup.incrementalEmbeddingNearDupPairs]], q99's
  * operator) at scale — a 1/incrDenom "daily" vector batch against the
  * rest of the corpus as the persisted embedding rel, vs the one-shot
  * full-corpus pair run it replaces. The interesting regime is the
  * Zipf-clustered corpus (gen_skew embeddings): blocks there are the
  * dense topical clusters, so the one-shot pair volume is Σ cluster²
  * while the increment's is Σ batch_b × cluster_b — bounded by the
  * batch.  Blocking key: `label` (present in every scale fixture).
  *
  * The ROUTED stage measures the radius-exact cell route
  * (`strategy="cells"`): nightly costs (quantizer resolve + corpus
  * cell-rel build) are timed separately from the per-batch routed
  * join. Recall is still computed as |routed ∩ exact| / |exact| on the
  * vs-corpus leg — the route is exact by construction, so anything
  * below 1.0000 is a BUG detector, not a tuning knob. The `routed_hi`
  * stage re-runs both plans at a dedup-actionable threshold (`tauHi`)
  * where the radius ball tightens and cell pruning actually pays.
  *
  * Usage: sbt "runMain graft.tools.EmbedIncrProbe <sfDir> [threshold]
  *             [incrDenom] [oneshot=1] [routed=1] [tauHi=0.9]
  *             [block=label] [forceRoutedMaxN=400000]"
  *        (pass oneshot=0 at scales where the full re-pair is the
  *        hours-long run the increment exists to avoid;
  *        forceRoutedMaxN = corpus size up to which the routed join is
  *        measured even when pricing favors dense — small corpora run
  *        it anyway for the recall cross-check; probes at other scales
  *        pass their own cap instead of editing source)
  */
object EmbedIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val incrDenom = if (args.length > 2) args(2).toLong else 100L
    val oneshot = if (args.length > 3) args(3) != "0" else true
    val routed = if (args.length > 4) args(4) != "0" else true
    val tauHi = if (args.length > 5) args(5).toDouble else 0.9
    // block="none" runs the UNBLOCKED regime (constant block) — the
    // 100 TB ingest shape when no natural blocking column exists:
    // dense cost becomes batch × corpus and cell routing is the only
    // sub-dense candidate generator
    val blockMode = if (args.length > 6) args(6) else "label"
    val forceRoutedMaxN = if (args.length > 7) args(7).toLong else 400000L
    val spark = graft.GraftSession.create("embed-incr-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, IvfCentroids}

    val emb0 = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val emb = (if (blockMode == "none") emb0.withColumn("label", lit(0))
               else emb0).cache()
    val n = emb.count()
    val batch = emb.filter(pmod(col("vec_id"), lit(incrDenom)) === 3)
    val corpus = emb.filter(pmod(col("vec_id"), lit(incrDenom)) =!= 3)
    val nB = batch.count()

    val t0 = System.nanoTime()
    val incr0 = Dedup.incrementalEmbeddingNearDupPairs(
      batch, corpus, "label", threshold, strategy = "exact")
    // cache the exact pairs when the routed stage will re-read them
    // for recall — at 2 M the exact join is ~6 min, not a rerun
    val incr = if (routed) incr0.cache() else incr0
    val nIncr = incr.count()
    val tIncr = (System.nanoTime() - t0) / 1e9
    println(f"""{"stage":"incr","n":$n,"batch":$nB,"block":"$blockMode","pairs":$nIncr,"sec":$tIncr%.1f}""")

    if (routed) {
      // nightly artifact costs, priced apart from the per-batch join
      val tc0 = System.nanoTime()
      val cents = IvfCentroids.forCorpus(
        corpus.select(col("vec_id"), col("embedding")))
      val tCents = (System.nanoTime() - tc0) / 1e9
      val tr0 = System.nanoTime()
      val cellRel = Dedup.embedCellRel(corpus, "label", cents).cache()
      val nCorpus = cellRel.count()
      val tRel = (System.nanoTime() - tr0) / 1e9
      println(f"""{"stage":"routed_nightly","cells":${cents.size},"corpus":$nCorpus,"centSec":$tCents%.1f,"relSec":$tRel%.1f}""")

      // the dispatch arithmetic, printed as data: the dense bound
      // (Σ batch_b × corpus_b) vs the routed candidate mass
      // (Σ probed-cell sizes) at both thresholds — what `auto` prices
      val bb = batch.groupBy("label").agg(count(lit(1)).as("na"))
      val cb = cellRel.groupBy("blk").agg(count(lit(1)).as("nb"))
      val denseBound = bb.join(cb, col("label") === col("blk"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L))).head.getLong(0)
      val probeTable = Dedup.cellProbeTable(cellRel, cents)
      val sizes = cellRel.groupBy("cell").agg(count(lit(1)).as("nc"))
      def routedBound(tau: Double): Long = {
        val rr = math.sqrt(math.max(2.0 - 2.0 * tau, 0.0))
        batch.select(explode(graft.functions.HashExpressions
            .cellsWithinRadius(col("embedding"), probeTable, rr)).as("cell"))
          .join(sizes, "cell")
          .agg(coalesce(sum(col("nc")), lit(0L))).head.getLong(0)
      }
      val denseB = denseBound
      val routedB = routedBound(threshold)
      println(f"""{"stage":"pricing","denseBound":$denseB,"routedBound":$routedB,"routedBoundHi":${routedBound(tauHi)},"tau":$threshold,"tauHi":$tauHi}""")

      // the per-batch number: assigned batch vs the prebuilt cell rel.
      // Forced ONLY when the pricing favors it (what `auto` would do);
      // when dense is cheaper the skip line IS the measurement — at a
      // loose τ the radius ball covers most cells and no candidate
      // generator beats the blocked dense scan, which auto detects.
      if (routedB < denseB || n <= forceRoutedMaxN) {
        val tj0 = System.nanoTime()
        val routedPairs = Dedup.incrementalEmbeddingNearDupPairs(
          batch, cellRel, "label", threshold, strategy = "cells",
          centroids = cents).cache()
        val nRouted = routedPairs.count()
        val tRouted = (System.nanoTime() - tj0) / 1e9

        // recall stratified by cosine: overall AND on the ≥0.7 band —
        // the route is exact by construction, so anything below 1.0000
        // is a bug detector
        val exactVs = incr.filter(col("vs_corpus"))
          .select("vec_a", "vec_b", "cosine").cache()
        val routedVs = routedPairs.filter(col("vs_corpus"))
          .select("vec_a", "vec_b")
        val nExactVs = exactVs.count()
        val hitRel = exactVs.join(routedVs, Seq("vec_a", "vec_b")).cache()
        val hit = hitRel.count()
        val nExactHi = exactVs.filter(col("cosine") >= 0.7).count()
        val hitHi = hitRel.filter(col("cosine") >= 0.7).count()
        def rec(h: Long, n: Long) = if (n == 0) 1.0 else h.toDouble / n
        println(f"""{"stage":"routed","tau":$threshold,"pairs":$nRouted,"sec":$tRouted%.1f,"recall":${rec(hit, nExactVs)}%.4f,"recallHi":${rec(hitHi, nExactHi)}%.4f,"exactVsPairs":$nExactVs,"exactHiPairs":$nExactHi}""")
        hitRel.unpersist(); exactVs.unpersist(); routedPairs.unpersist()
      } else
        println(f"""{"stage":"routed","tau":$threshold,"skipped":"pricing picked dense ($routedB >= $denseB)"}""")

      // the pruning regime: at a dedup-actionable threshold the radius
      // ball tightens and the probed-cell volume drops — measure the
      // exact and routed walls at tauHi on the same split
      val te0 = System.nanoTime()
      val exactHiN = Dedup.incrementalEmbeddingNearDupPairs(
        batch, corpus, "label", tauHi, strategy = "exact").count()
      val tExactHi = (System.nanoTime() - te0) / 1e9
      val tr2 = System.nanoTime()
      val routedHiN = Dedup.incrementalEmbeddingNearDupPairs(
        batch, cellRel, "label", tauHi, strategy = "cells",
        centroids = cents).count()
      val tRoutedHi = (System.nanoTime() - tr2) / 1e9
      println(f"""{"stage":"routed_hi","tau":$tauHi,"exactPairs":$exactHiN,"exactSec":$tExactHi%.1f,"routedPairs":$routedHiN,"routedSec":$tRoutedHi%.1f}""")
      cellRel.unpersist(); incr.unpersist()
    }

    // the one-shot run the increment replaces (auto strategy — tiled
    // past the candidate crossover, exactly what a full re-pair costs)
    if (oneshot) {
      val t1 = System.nanoTime()
      val full = Dedup.embeddingNearDupPairs(emb, "label", threshold)
      val nFull = full.count()
      val tFull = (System.nanoTime() - t1) / 1e9
      println(f"""{"stage":"oneshot","pairs":$nFull,"sec":$tFull%.1f}""")
    }
    spark.stop()
  }
}
