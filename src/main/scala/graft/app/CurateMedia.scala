package graft.app

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end MEDIA curation — [[CurateCorpus]]'s discipline applied
  * to binary payloads, media in → deduplicated media + the nightly
  * index artifacts out:
  *
  *   1. exact dedup (keep the canonical min-id copy per payload hash —
  *      identical bytes defeat frame-set bucketing the same way
  *      identical text defeats LSH, and they're free to drop first)
  *   2. frame-set near-dup through the PRODUCTION guarded entry
  *      ([[Multimodal.frameNearDupPairsAuto]] — the measured postings
  *      guard ALWAYS on at 256 candidate pairs/doc floor 10⁶, the
  *      `dedupMode=auto` routing discipline in media form; the
  *      dispatch line is logged), dropping the higher-id side of each
  *      pair (min-id survivor, the pairs-mode contract)
  *   3. write the survivors plus BOTH nightly index artifacts the
  *      ingest paths consume: the slim bucketed frame index
  *      ([[Multimodal.writeFrameIndexBucketed]] — the batch
  *      incremental join's corpus side) and the pre-exploded postings
  *      table ([[Multimodal.writeFramePostingsBucketed]] — the
  *      streaming join's exchange-free corpus side, `maxPostings`
  *      baked in as the nightly-derived cut).
  *
  * One container walk total: the media-agnostic kernel
  * ([[Multimodal.mediaFramePHashes]] — mixed video/audio corpora walk
  * correctly per row) runs ONCE over the exact-dedup survivors and its
  * cached slim (doc_id, frame_phash) rows feed the guard statistic,
  * the pair join, and both index writes. Payload bytes never shuffle;
  * only hash rows flow past stage 1.
  */
object CurateMedia {

  final case class MediaStageCounts(
      input: Long, exactDedup: Long, nearDedup: Long, indexRows: Long)

  /** Run the chain; write survivor media to `outDir/media`, the slim
    * frame index to table `indexTable` (data under
    * `outDir/frame_idx`), and the pre-exploded streaming postings to
    * `indexTable_postings` — a BLUE/GREEN versioned rebuild
    * ([[Multimodal.writeFramePostingsBucketedVersioned]]: data under
    * `outDir/frame_postings/v<N>`, the serving name swapped atomically,
    * previous version kept for in-flight readers) so a nightly re-run
    * never serves a half-written table to a running stream.
    *
    * The stop-frame cut baked into the postings artifact is the cut
    * the pair stage ACTUALLY APPLIED: the guarded near-dup join
    * ([[Multimodal.frameNearDupPairsAutoWithCut]]) returns it — the
    * caller's `maxPostings` when the measured candidate volume fits
    * the budget, the auto-derived (or min-combined, if the caller's is
    * looser) cut when it doesn't — so the streaming ingest path
    * inherits the SAME bound the nightly pair join ran under, with no
    * CLI plumbing required on skewed corpora. The slim index stays
    * uncut (the batch incremental join takes its cut at query time
    * against the combined histogram). `autoBudgetFloor` is the guard
    * budget's floor (tests lower it to exercise the cut branch on
    * small fixtures). */
  def run(media: DataFrame, outDir: String, tau: Double = 0.4,
      stride: Int = 1, buckets: Int = 32, maxPostings: Int = 0,
      indexTable: String = "media_frame_idx",
      autoBudgetFloor: Long = 1000000L)(
      implicit spark: SparkSession): MediaStageCounts = {
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val input = media.count()

      // 1. exact payload dedup: canonical min-id copy per content
      // hash. sha2-256, never a bare 64-bit key ([[Dedup
      // .exactDupGroups]]'s discipline): a 64-bit birthday collision
      // is expected by ~5×10⁹ rows — guaranteed territory for a
      // 100 TB media corpus — and a collision on the dedup key
      // silently DROPS a non-duplicate document. The 256-bit key is
      // still a slim shuffle column; payload bytes stay put.
      val canonical = media
        .groupBy(sha2(col("media"), 256).as("payload_hash"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val exact = media.join(canonical, "doc_id").cache()
      pinned += exact
      val nExact = exact.count()

      // 2. ONE media-agnostic container walk; cached slim rows feed
      // the guarded pair generator and both index writes below
      val frames = Multimodal.mediaFramePHashes(exact, stride)(spark)
        .cache()
      pinned += frames
      val (nearPairs, appliedCut) = Multimodal
        .frameNearDupPairsAutoWithCut(frames, tau,
          maxPostings = maxPostings, pin = pinned += _,
          budgetFloor = autoBudgetFloor)
      val dropNear = nearPairs
        .select(col("doc_b").as("doc_id")).distinct()
      val survivors = exact.join(dropNear, Seq("doc_id"), "left_anti")
        .cache()
      pinned += survivors
      val nNear = survivors.count()

      // 3. survivors + the nightly artifacts (survivor frames only —
      // a dropped dup must not linger in the ingest-facing indexes)
      survivors.write.mode("overwrite").parquet(s"$outDir/media")
      val survivorFrames = frames
        .join(survivors.select("doc_id"), "doc_id")
      Multimodal.writeFrameIndexBucketed(survivorFrames, indexTable,
        buckets, Some(s"$outDir/frame_idx"))
      Multimodal.writeFramePostingsBucketedVersioned(survivorFrames,
        s"${indexTable}_postings", buckets,
        Some(s"$outDir/frame_postings"), maxPostings = appliedCut,
        stride = stride)
      val indexRows = spark.table(indexTable).count()
      MediaStageCounts(input, nExact, nNear, indexRows)
    } finally pinned.foreach(_.unpersist())
  }

  /** CLI: `runMain graft.app.CurateMedia <mediaPath> <outDir> [tau]
    * [stride] [maxPostings]` — media as parquet (doc_id BIGINT,
    * media BINARY). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CurateMedia <mediaPath> <outDir> [tau] [stride] [maxPostings]")
    implicit val spark: SparkSession =
      graft.GraftSession.create("curate-media")
    val tau = if (args.length > 2) args(2).toDouble else 0.4
    val stride = if (args.length > 3) args(3).toInt else 1
    val cut = if (args.length > 4) args(4).toInt else 0
    val counts = run(spark.read.parquet(args(0)), args(1), tau,
      stride = stride, maxPostings = cut)
    println(s"[curate-media] $counts")
    spark.stop()
  }
}
