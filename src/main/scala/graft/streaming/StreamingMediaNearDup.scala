package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming media near-duplicate detection against a static corpus
  * frame index — the ingest-time form of
  * [[graft.operators.Multimodal.incrementalFrameNearDupPairs]]'s
  * vs-corpus leg, mirroring [[StreamingNearDup]]'s contract for text:
  * each micro-batch of media payloads is frame-walked ONCE, and its
  * frame-hash sets join the persisted corpus index (a stream-static
  * equi-join — stateless, no watermark, no state store).
  *
  * Two streaming subtleties, both solved the [[StreamingNearDup]] way:
  *
  *  - The per-doc frame SET must not come from `flatMap` + `groupBy`
  *    (a stateful streaming aggregation): the whole set is computed in
  *    one stateless map per payload row
  *    ([[Multimodal.mediaFramePHashSet]] — container walk, hash,
  *    in-row distinct+sort).
  *  - A pair sharing k frame hashes appears k times out of the
  *    postings join, and `.distinct()`/`groupBy` on a stream is
  *    stateful. Both sides carry their full (bounded — see below) hash
  *    set; a joined row survives only when its hash is the MINIMUM of
  *    the pair's intersection — each pair emits exactly once per
  *    micro-batch, and `shared`/`jaccard` come from
  *    `array_intersect` on the carried sets, matching the batch
  *    operator's distinct-set arithmetic bit for bit.
  *
  * Scale bounds: the carried set arrays make a posting row
  * O(|frame set|); `stride` subsamples frames at the walk so |set| is
  * capped by payload frames / stride (pick stride so sets stay in the
  * hundreds — the same knob the batch walk uses). The corpus side is
  * the PERSISTED index ([[Multimodal.writeFrameIndexBucketed]] rows
  * grouped once into sets at index-build time) — corpus payloads are
  * never re-walked, and on a static frame the identical plan gives
  * batch parity (spec-pinned). The batch operator's stop-frame cut is
  * deliberately absent here: it needs the combined corpus+batch
  * posting histogram, which is the nightly maintenance job's business,
  * not the ingest hot path's.
  */
object StreamingMediaNearDup {

  /** (doc_id, fhs) — per-doc DISTINCT sorted frame-hash set, one
    * stateless map per (possibly streaming) payload row. */
  def frameSets(media: DataFrame, stride: Int = 1)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(stride > 0, "positive stride")
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, Multimodal.mediaFramePHashSet(bytes, stride))
      })
      .toDF("doc_id", "fhs")
  }

  /** The static corpus side: persisted (doc_id, frame_phash) index
    * rows grouped into per-doc sets. In a stream-static join the
    * static side's PLAN re-executes every micro-batch, so at scale
    * compute this ONCE at index-build time, persist it next to the
    * bucketed index, and hand the persisted (doc_id, fhs) table to
    * [[mediaNearDupAgainstIndex]] directly — it detects the prebuilt
    * shape by the `fhs` column and skips the aggregation; passing raw
    * index rows makes every tiny ingest batch pay a corpus-wide
    * groupBy. Build the raw rows with
    * [[graft.operators.Multimodal.mediaFramePHashes]] (the same
    * media-agnostic kernel the stream side hashes with) so mixed-media
    * duplicates pair — a video-only index hashes audio payloads
    * differently than the stream would. */
  def corpusFrameSets(corpusSets: DataFrame): DataFrame =
    if (corpusSets.columns.contains("fhs")) corpusSets
    else corpusSets.groupBy("doc_id")
      .agg(sort_array(collect_set(col("frame_phash"))).as("fhs"))

  /** Match a (possibly streaming) media feed against the corpus frame
    * sets — raw (doc_id, frame_phash) index rows or the prebuilt
    * (doc_id, fhs) sets (see [[corpusFrameSets]]; prefer prebuilt on
    * the ingest hot path). Output: (doc_a stream side, doc_b corpus,
    * shared, jaccard) — one row per matching pair per micro-batch,
    * jaccard ≥ `tau`. */
  def mediaNearDupAgainstIndex(media: DataFrame, corpusSets: DataFrame,
      tau: Double, stride: Int = 1)(
      implicit spark: SparkSession): DataFrame = {
    val sRel = frameSets(media, stride)
      .select(col("doc_id").as("doc_a"), col("fhs").as("fhs_a"))
      .select(col("doc_a"), col("fhs_a"),
        explode(col("fhs_a")).as("frame_phash"))
    val cRel = corpusFrameSets(corpusSets)
      .select(col("doc_id").as("doc_b"), col("fhs").as("fhs_b"))
      .select(col("doc_b"), col("fhs_b"),
        explode(col("fhs_b")).as("frame_phash"))
    val inter = array_intersect(col("fhs_a"), col("fhs_b"))
    sRel.join(cRel, Seq("frame_phash"))
      .filter(col("doc_a") =!= col("doc_b"))
      // exactly-once: only the pair's minimum shared hash emits it
      .filter(col("frame_phash") === array_min(inter))
      .withColumn("shared", size(inter).cast("long"))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("fhs_a")) + size(col("fhs_b")) - col("shared"))
          .cast("double"))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "shared", "jaccard")
  }
}
