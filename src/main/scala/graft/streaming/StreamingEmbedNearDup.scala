package graft.streaming

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming embedding near-duplicate detection against a static
  * corpus embedding rel — the ingest-time form of
  * [[Dedup.incrementalEmbeddingNearDupPairs]]'s vs-corpus leg,
  * completing the streaming near-dup family (text
  * [[StreamingNearDup]], media [[StreamingMediaNearDup]], embeddings
  * here). The join is stateless by construction: a block equi-join +
  * per-row cosine filter — no aggregation, no distinct, no watermark,
  * no state store — so a streaming `vecs` frame runs the IDENTICAL
  * plan per micro-batch (batch parity is the contract, spec-pinned).
  *
  * Scale shape: the corpus side should be the PERSISTED embedding rel
  * (vec_id, blockCol, embedding) bucketed by `blockCol`, which joins
  * exchange-free (spec-pinned in CurationOpsSpec for the batch twin —
  * the same plan runs here); only the (small) micro-batch shuffles
  * into the block partitioning. Per-block candidate volume is
  * batch_b × corpus_b — bounded by the batch side. New-new pairs are
  * deliberately absent (a stream-stream self-join needs watermarked
  * state); they are the nightly batch job's business, exactly the
  * [[StreamingMediaNearDup]] division of labor. */
object StreamingEmbedNearDup {

  /** Match a (possibly streaming) vector feed against the corpus
    * embedding rel. Output: (vec_a stream side, vec_b corpus, cosine),
    * cosine ≥ `threshold`, one row per pair per micro-batch. */
  def embedNearDupAgainstIndex(vecs: DataFrame, corpus: DataFrame,
      blockCol: String, threshold: Double)(
      implicit spark: SparkSession): DataFrame = {
    val a = vecs.select(col("vec_id").as("vec_a"),
      col(blockCol).as("blk"), col("embedding").as("e_a"),
      Similarity.l2Norm(col("embedding")).as("n_a"))
    val b = corpus.select(col("vec_id").as("vec_b"),
      col(blockCol).as("blk"), col("embedding").as("e_b"),
      Similarity.l2Norm(col("embedding")).as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("vec_a") =!= col("vec_b"))
      .withColumn("cosine",
        Similarity.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }
}
