package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode is two-tier:
  *  - PNG / JPEG / GIF payloads get REAL dimensions parsed from the
  *    container header ([[ImageHeaders]] — pure JVM byte reading);
  *  - unknown formats fall back to the deterministic stub (byte-fold
  *    hash + fake dimensions) that stands in for a full media decoder
  *    (no image/audio libraries ship in this container — swap the
  *    fallback for JavaCV / TwelveMonkeys / ffmpeg-over-pipe without
  *    touching the plumbing).
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
      format: String, // png | jpeg | gif | unknown
      n_bytes: Long,
      content_hash: Long,
      width: Int,
      height: Int)

  /** Byte-fold polynomial hash (= the text fingerprint for ASCII
    * payloads — keeps the pipeline oracle-checkable). */
  def byteFoldHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** Header-parse known formats; stub dimensions for everything else. */
  def decodeFeatures(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val h = byteFoldHash(bytes)
    ImageHeaders.decode(bytes) match {
      case Some(m) =>
        MediaFeatures(id, m.format, bytes.length.toLong, h, m.width, m.height)
      case None =>
        MediaFeatures(id, "unknown", bytes.length.toLong, h,
          width = (h % 640).toInt, height = (h % 480).toInt)
    }
  }

  /** Batch feature extraction over a (doc_id, media: binary) frame.
    * One decoder per partition via mapPartitions. */
  def extractFeatures(media: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a heavyweight decoder would be initialized once HERE
        it.map { case (id, bytes) => decodeFeatures(id, bytes) }
      }
  }

  /** One sampled frame of a video-like payload. */
  final case class SampledFrame(
      doc_id: Long,
      frame_idx: Long,
      byte_off: Long,
      n_bytes: Long,
      frame_hash: Long)

  /** Frame-sample a video-like binary column: treat the payload as
    * consecutive fixed-size frames (a truncated tail frame is dropped,
    * the codec contract) and emit every `stride`-th frame. The frame
    * "decode" is a byte-slice + fold hash — the stub standing in for a
    * real codec, which slots into the same per-partition seam — but
    * the plumbing is the real thing: a narrow flatMap generate, frames
    * sliced in place, only (id, idx, hash) rows flow downstream, the
    * binary never shuffles. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[SampledFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0, "positive frame size / stride")
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real codec would be initialized once HERE
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            val off = f * frameBytes
            val slice = java.util.Arrays.copyOfRange(bytes, off, off + frameBytes)
            SampledFrame(id, f.toLong, off.toLong, frameBytes.toLong,
              byteFoldHash(slice))
          }
        }
      }
  }

  /** One codec-true frame of a parsed video container ([[VideoContainers]]):
    * byte range and decode time come from real container structure
    * (MJPEG marker walk / MP4 sample tables), not fixed-size slicing;
    * `width`/`height` from the per-frame SOF (MJPEG) or track header
    * (MP4), 0 when the container carries none. */
  final case class ContainerFrame(
      doc_id: Long,
      container: String, // mjpeg | mp4 | raw
      frame_idx: Long,
      byte_off: Long,
      n_bytes: Long,
      time_ticks: Long,
      width: Int,
      height: Int,
      frame_hash: Long)

  /** Container-aware frame sampling: MJPEG and MP4 payloads are parsed
    * to their REAL frame units ([[VideoContainers.scanMjpeg]] /
    * [[VideoContainers.parseMp4]] — offsets, sizes, decode times from
    * the container's own structure); unknown formats fall back to the
    * fixed-size-slice stub of [[sampleFrames]] with `fallbackFrameBytes`
    * (container = "raw", the documented honest-stub seam). Every
    * `stride`-th frame is emitted with its true index. Same scale
    * contract as the rest of the file: one parser pass per partition,
    * the binary never shuffles, only the 9-column frame row flows
    * downstream. */
  def sampleContainerFrames(media: DataFrame, stride: Int,
      fallbackFrameBytes: Int = 16)(
      implicit spark: SparkSession): Dataset[ContainerFrame] = {
    import spark.implicits._
    require(stride > 0 && fallbackFrameBytes > 0, "positive stride / frame size")
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (container, frames) =
            if (VideoContainers.looksLikeMp4(bytes))
              VideoContainers.parseMp4(bytes) match {
                case Some(trk) => ("mp4", trk.frames)
                case None      => ("raw", Nil)
              }
            else if (VideoContainers.looksLikeMjpeg(bytes))
              ("mjpeg", VideoContainers.scanMjpeg(bytes))
            else ("raw", Nil)
          val resolved =
            if (frames.nonEmpty) frames
            else { // stub tier: consecutive fixed-size slices
              val n = bytes.length / fallbackFrameBytes
              (0 until n).map(f => VideoContainers.Frame(f.toLong,
                f.toLong * fallbackFrameBytes, fallbackFrameBytes.toLong,
                f.toLong, 0, 0))
            }
          resolved.iterator.filter(_.idx % stride == 0).map { fr =>
            val slice = java.util.Arrays.copyOfRange(bytes,
              fr.off.toInt, (fr.off + fr.len).toInt)
            ContainerFrame(id, if (frames.nonEmpty) container else "raw",
              fr.idx, fr.off, fr.len, fr.timeTicks, fr.width, fr.height,
              byteFoldHash(slice))
          }
        }
      }
  }

  /** Demo pipeline over the shared testdata, CONTAINER tier: each
    * document's full 16-byte text chunks become one real baseline-JPEG
    * frame each of an MJPEG stream ([[VideoContainers.mjpegFixture]] —
    * SOF0 width doc_id%16+1, entropy data with a stuffed 0xFF00 and an
    * RST0 the scanner must traverse), then the container-aware sampler
    * takes every 4th frame. The DuckDB oracle recomputes offsets,
    * sizes and the whole-frame byte-fold hash from the fixture's
    * arithmetic layout, so any structural-scan defect (marker lengths,
    * stuffing, restart markers, frame boundaries, SOF capture) breaks
    * the hash match — the q75 construction↔inversion pattern, one
    * tier up from pixels. */
  def documentVideoFrames(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val chunks = (0 until bytes.length / 16).map(f =>
          java.util.Arrays.copyOfRange(bytes, f * 16, f * 16 + 16))
        (id, VideoContainers.mjpegFixture((id % 16 + 1).toInt, chunks))
      }
      .toDF("doc_id", "media")
    sampleContainerFrames(media, stride = 4).toDF()
      .drop("container", "height") // constants of the fixture
  }

  /** Demo pipeline, MP4 tier (q90): each document's full 16-byte text
    * chunks become uniform samples of a real single-chunk MP4
    * ([[VideoContainers.mp4Fixture]] — ftyp/moov/trak/mdia/minf/stbl
    * with stsz/stsc/stco/stts, tkhd dims from doc_id, 3 600 ticks per
    * frame at timescale 90 000), then the container-aware sampler
    * takes every 4th frame. The DuckDB oracle reproduces byte ranges
    * (constant [[VideoContainers.mp4FixtureDataOff]] + 16·idx), decode
    * times and sample hashes arithmetically — so the Spark side must
    * walk the real box tree and expand the real sample tables to
    * match. Complements q89 (MJPEG marker-walk tier) over the SAME
    * frame plumbing. */
  def documentMp4Frames(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val samples = (0 until bytes.length / 16).map(f =>
          java.util.Arrays.copyOfRange(bytes, f * 16, f * 16 + 16))
        (id, VideoContainers.mp4Fixture((id % 16 + 1).toInt,
          (id % 12 + 1).toInt, 90000L, 3600L, samples))
      }
      .toDF("doc_id", "media")
    sampleContainerFrames(media, stride = 4).toDF()
      .drop("container") // constant of the fixture
  }

  /** Decoded-content statistics for one image blob ([[PixelDecode]]
    * formats only). Integer channel sums are the oracle-checkable
    * truth; means are one exact IEEE division of those sums. */
  final case class PixelStats(
      doc_id: Long,
      format: String, // bmp | png
      width: Int,
      height: Int,
      n_px: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** REAL pixel decode (BMP / PNG via [[PixelDecode]]) → per-channel
    * stats; rows whose payload isn't pixel-decodable are dropped
    * (header-only metadata for those still flows via
    * [[extractFeatures]]). Same plumbing contract as the rest of the
    * file: per-partition decoder, binary never shuffles, only the
    * 11-column stats row flows downstream. */
  def decodePixelStats(media: DataFrame)(
      implicit spark: SparkSession): Dataset[PixelStats] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          PixelDecode.decode(bytes).map { img =>
            val n = img.width * img.height
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < n) {
              sr += img.rgb(i * 3) & 0xff
              sg += img.rgb(i * 3 + 1) & 0xff
              sb += img.rgb(i * 3 + 2) & 0xff
              i += 1
            }
            PixelStats(id, img.format, img.width, img.height, n.toLong,
              sr, sg, sb,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        }
      }
  }

  /** Demo pipeline over the shared testdata, CONTENT tier: each doc_id
    * deterministically becomes a small real image — even ids a 24-bit
    * BMP, odd ids a truly-deflated PNG whose rows cycle through all
    * five scanline filters — with pixel channels defined by pure
    * arithmetic in (doc_id, x, y). The decoder recovers the pixels
    * from the actual file bytes; the DuckDB oracle computes the same
    * channel sums from the arithmetic rule directly, so any decode
    * defect (filter math, row order, BGR swap, padding) breaks the
    * hash match. */
  def documentPixelStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id % 12 + 1).toInt
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = (y * w + x) * 3
            rgb(i) = ((id * 3 + x * 5 + y * 7) % 256).toByte
            rgb(i + 1) = ((id * 11 + x * 13 + y * 17) % 256).toByte
            rgb(i + 2) = ((id * 19 + x * 23 + y * 29) % 256).toByte
            x += 1
          }
          y += 1
        }
        val bytes =
          if (id % 2 == 0) PixelDecode.bmpFixture(w, h, rgb)
          else PixelDecode.pngPixelFixture(w, h, rgb)
        (id, bytes)
      }
      .toDF("doc_id", "media")
    decodePixelStats(media).toDF()
  }

  /** Demo pipeline over the shared testdata: wraps each document's
    * UTF-8 text in a deterministic media container by doc_id — PNG
    * (id%3==0), JPEG (id%3==1), raw text (id%3==2, the unknown-format
    * stub path) — then runs the batch extraction. Every branch is
    * oracle-checkable: the fixture byte layout is pure arithmetic over
    * (doc_id, text), mirrored in the DuckDB SQL. */
  def documentMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val media = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val w = (id % 1024 + 1).toInt
        val h = (id % 768 + 1).toInt
        val bytes = (id % 3) match {
          case 0 => ImageHeaders.pngFixture(w, h, payload)
          case 1 => ImageHeaders.jpegFixture(w, h, payload)
          case _ => payload
        }
        (id, bytes)
      }
      .toDF("doc_id", "media")
    extractFeatures(media).toDF()
  }
}
