package graft.app

import graft.operators.{Dedup, IvfCentroids, OperatorCaches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end EMBEDDING curation — [[CurateCorpus]]/[[CurateMedia]]'s
  * discipline applied to vector payloads, completing the pipeline-app
  * family across the three modalities: vectors in → deduplicated
  * vectors + the nightly routing artifact out.
  *
  *   1. exact dedup (keep the canonical min-id copy per identical
  *      embedding — bitwise-equal vectors defeat cosine blocking the
  *      same way identical text defeats LSH, and they're free to drop
  *      first; [[Dedup.exactCanonicalIdsVerified]] — the 64-bit hash
  *      only pre-filters, colliding candidates are byte-equality
  *      verified before anything is dropped, and non-candidate
  *      payloads never shuffle)
  *   2. cosine near-dup inside `blockCol` blocks through the
  *      auto-dispatched pair generator
  *      ([[Dedup.embeddingNearDupPairs]] — join-plain vs tiled on the
  *      measured Σ n_b² statistic, dispatch line logged), dropping the
  *      higher-id side of each pair (min-id survivor, the pairs-mode
  *      contract shared with [[CurateMedia]])
  *   3. write the survivors plus the NIGHTLY ROUTING ARTIFACT both
  *      ingest paths consume: the home-cell rel
  *      ([[Dedup.writeEmbedCellRelBucketedVersioned]] — blue/green
  *      view swap, quantizer fingerprint stamped, (cell, blk)-
  *      bucketed, `cdist` radius stats carried) that
  *      [[Dedup.incrementalEmbeddingNearDupPairs]] and
  *      [[graft.streaming.StreamingEmbedNearDup.embedNearDupAgainstCellIndex]]
  *      join exchange-free; centroids resolve artifact-or-fit via
  *      [[IvfCentroids.forCorpus]] (the quantizer is a versioned
  *      artifact — this build step is where the fit cost belongs, not
  *      the ingest hot path).
  *
  * The one-shot pair stage is corpus-scale work (Σ block² candidates)
  * and belongs at initial-curation time; DAILY maintenance is the
  * incremental operator against the artifact written here — the
  * division of labor the media pipeline documents. */
object CurateEmbeddings {

  final case class EmbedStageCounts(
      input: Long, exactDedup: Long, nearDedup: Long, cellRelRows: Long)

  /** Run the chain; write survivor vectors to `outDir/vectors` and the
    * home-cell rel to table `cellTable` (data under
    * `outDir/cell_rel`). */
  def run(vectors: DataFrame, outDir: String, blockCol: String = "label",
      tau: Double = 0.9, buckets: Int = 32,
      cellTable: String = "embed_cell_rel")(
      implicit spark: SparkSession): EmbedStageCounts = {
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val input = vectors.count()

      // 1. exact dedup: canonical min-id copy per identical embedding.
      // Collision-verified ([[Dedup.exactCanonicalIdsVerified]]): the
      // 64-bit hash only PRE-FILTERS — candidates in multi-member hash
      // groups are byte-equality-verified before any row is dropped,
      // so a birthday collision (expected territory at the multi-
      // billion-row scale this family targets) costs a comparison,
      // never a silently deleted non-duplicate vector.
      val canonical = Dedup.exactCanonicalIdsVerified(
        vectors, "vec_id", "embedding")
      val exact = vectors.join(canonical, "vec_id").cache()
      pinned += exact
      val nExact = exact.count()

      // 2. blocked cosine near-dup, min-id survivor (vec_a < vec_b —
      // dropping every vec_b keeps exactly the per-family minimum)
      val dropNear = Dedup.embeddingNearDupPairs(exact, blockCol, tau)
        .select(col("vec_b").as("vec_id")).distinct()
      val survivors = exact.join(dropNear, Seq("vec_id"), "left_anti")
        .cache()
      pinned += survivors
      val nNear = survivors.count()

      // 3. survivors + the nightly routing artifact (survivor vectors
      // only — a dropped dup must not linger in the ingest-facing rel)
      survivors.write.mode("overwrite").parquet(s"$outDir/vectors")
      val cents = IvfCentroids.forCorpus(
        survivors.select(col("vec_id"), col("embedding")))
      // BLUE/GREEN versioned rebuild: the rel serves a running
      // stream's per-micro-batch join, so the serving name must never
      // point at a half-written table — the view swaps atomically and
      // the previous version stays for in-flight readers. The rel
      // carries the quantizer fingerprint (embedCellRel stamps it), so
      // a consumer passing centroids from a different fit is refused.
      Dedup.writeEmbedCellRelBucketedVersioned(survivors, blockCol, cents,
        cellTable, buckets, Some(s"$outDir/cell_rel"))
      EmbedStageCounts(input, nExact, nNear, spark.table(cellTable).count())
    } finally {
      pinned.foreach(_.unpersist())
      OperatorCaches.releaseAll()
    }
  }

  /** CLI: `runMain graft.app.CurateEmbeddings <vectorsPath> <outDir>
    * [blockCol] [tau] [buckets]` — vectors as parquet (vec_id BIGINT,
    * <blockCol>, embedding ARRAY<FLOAT>). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CurateEmbeddings <vectorsPath> <outDir> [blockCol] [tau] [buckets]")
    implicit val spark: SparkSession =
      graft.GraftSession.create("curate-embeddings")
    val blockCol = if (args.length > 2) args(2) else "label"
    val tau = if (args.length > 3) args(3).toDouble else 0.9
    val buckets = if (args.length > 4) args(4).toInt else 32
    val t0 = System.nanoTime()
    val counts = run(spark.read.parquet(args(0)), args(1), blockCol, tau,
      buckets)
    println(f"[curate-embeddings] $counts wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
