package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual media decode is a
  * deterministic STUB (`decodeStub`) because no image/audio libraries
  * ship in this container — swap `decodeStub` for a real decoder
  * (JavaCV / TwelveMonkeys / ffmpeg-over-pipe) without touching the
  * plumbing.
  *
  * Scale notes: `mapPartitions` keeps one decoder instance per
  * partition (amortized init — the reason not to use a per-row UDF);
  * binary payloads stay off the shuffle path (feature extraction is a
  * narrow map; only the small feature vectors flow downstream);
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory.
  */
object Multimodal {

  /** Extracted features for one media blob. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      content_hash: Long,
      // stub "decode" outputs — a real decoder would fill
      // width/height/duration etc. from the media header
      width: Int,
      height: Int)

  /** Deterministic fake decode: byte-fold hash + fake dimensions from
    * the payload. Stands in for the real media decoder. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(id, bytes.length.toLong, h,
      width = (h % 640).toInt, height = (h % 480).toInt)
  }

  /** Batch feature extraction over a (doc_id, media: binary) frame.
    * One decoder per partition via mapPartitions. */
  def extractFeatures(media: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: init decoder once here, close after
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Demo pipeline over the shared testdata: treats each document's
    * UTF-8 text as an opaque media payload (binary column + metadata),
    * runs the batch extraction. The content_hash equals the polynomial
    * text fingerprint for ASCII payloads, which makes this
    * oracle-checkable end-to-end. */
  def documentMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    extractFeatures(media).toDF()
  }
}
