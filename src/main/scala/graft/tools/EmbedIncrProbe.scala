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
  * The ROUTED stage measures the cell route (`strategy="cells"`) the
  * way AnnRouteProbe scores regret: nightly costs (quantizer resolve +
  * corpus cell-rel build) are timed separately from the per-batch
  * routed join, and recall = |routed ∩ exact| / |exact| on the
  * vs-corpus leg (candidate generation is the only approximation —
  * surviving cosines are exact).
  *
  * Usage: sbt "runMain graft.tools.EmbedIncrProbe <sfDir> [threshold]
  *             [incrDenom] [oneshot=1] [routed=1] [nProbe=8]"
  *        (pass oneshot=0 at scales where the full re-pair is the
  *        hours-long run the increment exists to avoid)
  */
object EmbedIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val incrDenom = if (args.length > 2) args(2).toLong else 100L
    val oneshot = if (args.length > 3) args(3) != "0" else true
    val routed = if (args.length > 4) args(4) != "0" else true
    val nProbe = if (args.length > 5) args(5).toInt else 8
    val spark = graft.GraftSession.create("embed-incr-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, IvfCentroids}

    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding")).cache()
    val n = emb.count()
    val batch = emb.filter(pmod(col("vec_id"), lit(incrDenom)) === 3)
    val corpus = emb.filter(pmod(col("vec_id"), lit(incrDenom)) =!= 3)
    val nB = batch.count()

    val t0 = System.nanoTime()
    val incr = Dedup.incrementalEmbeddingNearDupPairs(
      batch, corpus, "label", threshold, strategy = "exact")
    val nIncr = incr.count()
    val tIncr = (System.nanoTime() - t0) / 1e9
    println(f"""{"stage":"incr","n":$n,"batch":$nB,"pairs":$nIncr,"sec":$tIncr%.1f}""")

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

      // the per-batch number: assigned batch vs the prebuilt cell rel
      val tj0 = System.nanoTime()
      val routedPairs = Dedup.incrementalEmbeddingNearDupPairs(
        batch, cellRel, "label", threshold, strategy = "cells",
        centroids = cents, nProbe = nProbe).cache()
      val nRouted = routedPairs.count()
      val tRouted = (System.nanoTime() - tj0) / 1e9

      // recall stratified by cosine: overall AND on the ≥0.7 band —
      // the high-cosine pairs are the ones a dedup pass acts on, and
      // cell collision probability rises with cosine, so the two
      // numbers tell different stories (a 0.4-threshold pair can sit
      // in genuinely distant cells)
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
      println(f"""{"stage":"routed","nProbe":$nProbe,"pairs":$nRouted,"sec":$tRouted%.1f,"recall":${rec(hit, nExactVs)}%.4f,"recallHi":${rec(hitHi, nExactHi)}%.4f,"exactVsPairs":$nExactVs,"exactHiPairs":$nExactHi}""")
      hitRel.unpersist(); exactVs.unpersist()
      routedPairs.unpersist(); cellRel.unpersist()
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
