package graft.streaming

import graft.operators.{Dedup, Parallelism, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding near-duplicate detection against a static
  * corpus embedding rel — the ingest-time form of
  * [[Dedup.incrementalEmbeddingNearDupPairs]]'s vs-corpus leg,
  * completing the streaming near-dup family (text
  * [[StreamingNearDup]], media [[StreamingMediaNearDup]], embeddings
  * here). Both entries are stateless by construction — equi-join +
  * per-row arithmetic, no aggregation, no distinct, no watermark, no
  * state store — so a streaming `vecs` frame runs the IDENTICAL plan
  * per micro-batch (batch parity is the contract, spec-pinned).
  *
  * Two entries, the [[StreamingMediaNearDup]] corpus-shape ranking in
  * embedding form:
  *
  *  1. [[embedNearDupAgainstCellIndex]] — the SCALE path: the corpus
  *     enters as the persisted [[Dedup.embedCellRel]] (home-cell rel,
  *     bucketed by (`cell`, `blk`) via
  *     [[Dedup.writeEmbedCellRelBucketed]] so it scans exchange-free
  *     per micro-batch); arriving vectors probe EVERY cell the
  *     cosine-τ radius ball can touch (RADIUS-EXACT — a stateless
  *     per-row expression bounded by each cell's max assignment
  *     distance, so the entry returns identical rows to the dense leg
  *     at every threshold) and only cell-colliding pairs are
  *     exact-rescored — candidates ∝ probed cells, sub-linear in
  *     corpus.
  *  2. [[embedNearDupAgainstIndex]] — the DENSE block join: exact
  *     within blocks, but candidates are batch_b × corpus_b per block —
  *     linear in corpus per batch. Gate/test scale, or corpora whose
  *     blocks are known-small; the plan-time dispatch line prices it
  *     and names the routed entry when a block is hot.
  *
  * New-new pairs are deliberately absent from both (a stream-stream
  * self-join needs watermarked state); they are the nightly batch
  * job's business, exactly the [[StreamingMediaNearDup]] division of
  * labor. */
object StreamingEmbedNearDup {

  /** A corpus block above this size makes the dense leg's per-batch-row
    * candidate volume (its block's corpus count) the dominant cost —
    * the plan-time dispatch line flags it and names the routed entry. */
  val DenseBlockWarn: Long = 100000L

  /** Match a (possibly streaming) vector feed against the corpus
    * embedding rel — the DENSE block join (shape 2 above). Output:
    * (vec_a stream side, vec_b corpus, cosine), cosine ≥ `threshold`,
    * one row per pair per micro-batch. The corpus-side block histogram
    * is priced ONCE at plan-build time (the stream side cannot be
    * counted): per-batch-row candidates are bounded by the row's
    * block's corpus count, so a hot block means every micro-batch pays
    * a dense scan of it — use [[embedNearDupAgainstCellIndex]] past
    * [[DenseBlockWarn]]. */
  def embedNearDupAgainstIndex(vecs: DataFrame, corpus: DataFrame,
      blockCol: String, threshold: Double): DataFrame = {
    val st = corpus.groupBy(col(blockCol)).agg(count(lit(1)).as("nb"))
      .agg(coalesce(max(col("nb")), lit(0L)),
        coalesce(sum(col("nb")), lit(0L))).head
    val (maxB, total) = (st.getLong(0), st.getLong(1))
    Parallelism.logDispatch("StreamingEmbedNearDup",
      s"dense leg: corpusRows=$total maxBlock=$maxB (per-batch-row " +
        "candidate bound = its block's corpus count)" +
        (if (maxB > DenseBlockWarn)
           s" — HOT BLOCK past $DenseBlockWarn: every micro-batch dense-" +
             "scans it; use embedNearDupAgainstCellIndex (candidates ∝ " +
             "probed cells)"
         else " — ok"))
    val a = vecs.select(col("vec_id").as("vec_a"),
      col(blockCol).as("blk"), col("embedding").as("e_a"),
      Similarity.l2Norm(col("embedding")).as("n_a"))
    val b = corpus.select(col("vec_id").as("vec_b"),
      col(blockCol).as("blk"), col("embedding").as("e_b"),
      Similarity.l2Norm(col("embedding")).as("n_b"))
    a.join(b, Seq("blk"))
      // zero-norm rows never qualify (0/0 = NaN passes `>= τ` under
      // Spark's NaN ordering); same guard as the routed entry, so the
      // two entries stay row-identical with failed embeddings present
      .filter(col("vec_a") =!= col("vec_b") &&
        col("n_a") > 0.0 && col("n_b") > 0.0)
      .withColumn("cosine",
        Similarity.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Match a (possibly streaming) vector feed against the persisted
    * HOME-CELL rel ([[Dedup.embedCellRel]] — columns vec_id, blk,
    * cell, cdist, embedding, nrm) — the SCALE path (shape 1 above),
    * the [[Dedup.cellRoutedVsCorpusPairs]] plan under a stream:
    * arriving vectors probe every cell the cosine-τ radius ball can
    * touch (stateless CellsWithinRadius expression — RADIUS-EXACT, so
    * this entry returns IDENTICAL rows to the dense leg at every
    * threshold, spec-pinned; the probe bound comes from the rel's
    * per-cell max assignment distance, collected once at plan-build
    * time), join on (`cell`, `blk`) — a corpus rel bucketed on both
    * ([[Dedup.writeEmbedCellRelBucketed]]) scans exchange-free per
    * micro-batch — exact cosine on collisions only. `centroids` must
    * be the SAME quantizer the rel was built with — ENFORCED: the rel
    * carries its quantizer's fingerprint in column metadata
    * ([[Dedup.embedCellRel]]) and a mismatched `centroids` argument is
    * refused at plan-build time ([[Dedup.cellProbeTable]]), naming
    * both fingerprints; nightly rebuilds go through the blue/green
    * [[Dedup.writeEmbedCellRelBucketedVersioned]] so this stream never
    * resolves a half-written rel. */
  def embedNearDupAgainstCellIndex(vecs: DataFrame, corpusCells: DataFrame,
      centroids: Seq[(Int, Seq[Double])], blockCol: String,
      threshold: Double): DataFrame = {
    val st = corpusCells.groupBy(col("cell")).agg(count(lit(1)).as("nc"))
      .agg(coalesce(max(col("nc")), lit(0L)),
        coalesce(sum(col("nc")), lit(0L))).head
    Parallelism.logDispatch("StreamingEmbedNearDup",
      s"routed leg: corpusRows=${st.getLong(1)} cells=${centroids.size} " +
        s"maxCell=${st.getLong(0)} tau=$threshold (radius-exact probing; " +
        "per-batch-row candidates = Σ probed-cell sizes)")
    Dedup.cellRoutedVsCorpusPairs(vecs, corpusCells, blockCol, threshold,
      centroids)
  }
}
