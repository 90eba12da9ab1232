package graft.streaming

import graft.functions.HashExpressions
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate detection against a static corpus index —
  * the ingest-time form of
  * [[graft.operators.Dedup.incrementalNearDupPairs]]: each micro-batch
  * of documents is signed and joined against the persisted corpus band
  * index (a stream-static equi-join — supported, stateless), emitting
  * (new doc, corpus doc, jaccard) matches as they arrive.
  *
  * The subtlety is pair multiplicity: a pair colliding in k bands
  * appears k times out of the band join, and the batch operator's
  * `.distinct()` is STATEFUL on a stream (unbounded dedup state).
  * Instead both sides carry their full band vector and a joined row
  * survives only when its band is the FIRST shared band of the pair
  * (`band_idx == min{i : bands_a[i] == bands_b[i]}`) — each pair is
  * emitted exactly once per micro-batch with zero state, no watermark,
  * no state store. Duplicate pairs across distant micro-batches don't
  * arise (the corpus side is fixed and each stream doc arrives once);
  * the same plan runs unchanged on a static DataFrame for batch parity.
  */
object StreamingNearDup {

  /** Signature table for the static corpus side: (doc_id, hs, bands).
    * Persist this as the dedup index (at scale: bucketed on the band
    * hashes after exploding — see
    * [[graft.operators.Dedup.minHashBandRel]]); text is read once at
    * index-build time and never again. */
  def indexSignatures(corpus: DataFrame): DataFrame =
    corpus.select(
      col("doc_id"),
      HashExpressions.shingleHashes(col("text"), 5).as("hs"))
      .withColumn("bands",
        bandHashes(HashExpressions.minHashSig(col("hs"))))

  /** Match a (possibly streaming) document feed against the corpus
    * signature index. Output: doc_a (stream side), doc_b (corpus),
    * jac — one row per matching pair per micro-batch. */
  def nearDupAgainstIndex(docs: DataFrame, corpusSigs: DataFrame,
      threshold: Double): DataFrame = {
    val sRel = indexSignatures(docs)
      .select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
        col("bands").as("bands_a"))
      .select(col("doc_a"), col("hs_a"), col("bands_a"),
        posexplode(col("bands_a")).as(Seq("band_idx", "band_hash")))
    val cRel = corpusSigs
      .select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
        col("bands").as("bands_b"))
      .select(col("doc_b"), col("hs_b"), col("bands_b"),
        posexplode(col("bands_b")).as(Seq("band_idx", "band_hash")))
    val firstSharedBand = array_min(filter(
      transform(sequence(lit(0), size(col("bands_a")) - 1), i => i),
      i => element_at(col("bands_a"), i + 1) ===
        element_at(col("bands_b"), i + 1)))
    sRel.join(cRel, Seq("band_idx", "band_hash"))
      .filter(col("band_idx") === firstSharedBand)
      .withColumn("jac",
        HashExpressions.sortedJaccardGeq(col("hs_a"), col("hs_b"),
          threshold))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }
}
