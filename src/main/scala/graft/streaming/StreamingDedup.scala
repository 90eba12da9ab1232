package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time form of
  * [[graft.operators.Dedup.exactDupGroups]]: the FIRST document with a
  * given content hash passes, later copies are dropped, and the seen-set
  * state is bounded by the event-time watermark instead of growing
  * forever.
  *
  * `dropDuplicatesWithinWatermark` keys the state store on the 256-bit
  * content hash (never the text — same shuffle discipline as the batch
  * operator) and expires entries once the watermark passes their event
  * time + the lateness window, so state is O(documents per window), not
  * O(corpus). Duplicates further apart than the window are left for the
  * batch dedup pass — the same late-data contract (T5) as the rest of
  * the streaming layer.
  *
  * On a static DataFrame the same call degrades to plain exact dedup
  * (`dropDuplicatesWithinWatermark` is streaming-only in Spark;
  * keeping an arbitrary-but-one copy per content hash is the batch
  * equivalent of the window contract).
  */
object StreamingDedup {

  /** Deduplicate a (possibly streaming) document feed by content hash.
    * `tsCol` must be a TimestampType event-time column. Output: the
    * input rows that survived, plus the `content_hash` key. */
  def dedupByContent(docs: DataFrame, tsCol: String,
      latenessMs: Long): DataFrame = {
    val hashed = docs.withColumn("content_hash", sha2(col("text"), 256))
    if (docs.isStreaming)
      hashed
        .withWatermark(tsCol, s"$latenessMs milliseconds")
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }
}
