package graft

import graft.operators.{Multimodal, VideoContainers}
import graft.streaming.StreamingMediaNearDup
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming media ingest path must equal the batch incremental
  * operator's vs-corpus leg — exactly once per pair, zero state. */
class StreamingMediaNearDupSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType)))

  // the q92/q95 MJPEG fixture over the shared testdata text
  private def mediaOf(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(pred)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val chunks = (0 until bytes.length / 16).map(f =>
          java.util.Arrays.copyOfRange(bytes, f * 16, f * 16 + 16))
        (id, VideoContainers.mjpegFixture(8, chunks))
      }
      .toDF("doc_id", "media")

  private def corpusIndex = Multimodal.videoFramePHashes(
      mediaOf(col("doc_id") % 4 =!= 0), stride = 1)
    .select("doc_id", "frame_phash").distinct()

  test("streaming matches equal the batch incremental vs-corpus leg, exactly once") {
    val fresh = mediaOf(col("doc_id") % 4 === 0)
    val idx = corpusIndex.cache()
    val expected = Multimodal.incrementalFrameNearDupPairs(
        Multimodal.videoFramePHashes(fresh, stride = 1), idx, tau = 0.4)
      .filter(col("vs_corpus"))
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce at least one match")
    graft.operators.OperatorCaches.releaseAll()

    val in = Files.createTempDirectory("smnd_in")
    val ckpt = Files.createTempDirectory("smnd_ck")
    def writeBatch(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val tmp = Files.createTempDirectory(s"smnd_$name").toString
      fresh.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, in.resolve(name))
    }
    val mid = 200L
    writeBatch("b1.parquet", col("doc_id") < mid)
    val stream = spark.readStream.schema(schema).parquet(in.toString)
    val q = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(stream, idx, tau = 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("smnd_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      writeBatch("b2.parquet", col("doc_id") >= mid)
      q.processAllAvailable()
      val got = spark.table("smnd_out")
        .as[(Long, Long, Long, Double)].collect()
      assert(got.length == got.toSet.size, "pairs must be emitted exactly once")
      assert(got.toSet == expected)
    } finally {
      q.stop()
      idx.unpersist()
    }
  }

  test("batch parity: the same plan on a static frame equals the incremental op") {
    val fresh = mediaOf(col("doc_id") % 4 === 0)
    val idx = corpusIndex
    val streaming = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, idx, tau = 0.4)
    val batch = Multimodal.incrementalFrameNearDupPairs(
        Multimodal.videoFramePHashes(fresh, stride = 1), idx, tau = 0.4)
      .filter(col("vs_corpus"))
      .select("doc_a", "doc_b", "shared", "jaccard")
    assert(streaming.exceptAll(batch).isEmpty &&
      batch.exceptAll(streaming).isEmpty)
    graft.operators.OperatorCaches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }

  test("mixed-media corpus: index built with mediaFramePHashes pairs audio dups; prebuilt sets ≡ raw rows") {
    // A video-only index op hashes MP3 payloads through the fixed-size
    // fallback while the stream kernel takes the codec walk — the
    // duplicate below would silently never pair. The media-agnostic
    // index op must close that gap (code-review r14 finding).
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 41 + i * 11) % 120 + 1).toByte)
    val corpus = Seq(
      (1L, graft.operators.AudioHeaders.mp3Fixture(
        Seq(chunk(1), chunk(2), chunk(3)))),
      (2L, VideoContainers.mjpegFixture(8,
        Seq(chunk(10), chunk(11), chunk(12))))).toDF("doc_id", "media")
    val fresh = Seq(
      (20L, graft.operators.AudioHeaders.mp3Fixture( // re-chunked MP3 dup of 1
        chunk(9) +: Seq(chunk(1), chunk(2), chunk(3)))),
      (21L, VideoContainers.mjpegFixture(8, // exact MJPEG dup of 2
        Seq(chunk(10), chunk(11), chunk(12))))).toDF("doc_id", "media")
    val idx = Multimodal.mediaFramePHashes(corpus, stride = 1)
    val raw = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, idx, tau = 0.5)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(raw.map(p => (p._1, p._2)) == Set((20L, 1L), (21L, 2L)))
    // the prebuilt (doc_id, fhs) table — what the ingest hot path
    // should pass so no corpus-wide aggregation runs per micro-batch —
    // is detected by schema and gives identical rows
    val prebuilt = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh,
        StreamingMediaNearDup.corpusFrameSets(idx), tau = 0.5)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(prebuilt == raw)
  }

  test("audio payloads flow through the same media-agnostic kernel") {
    // one MP3 near-dup pair, one ADTS doc sharing chunks cross-container
    // (must NOT pair — different frame bytes), one unrelated
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 41 + i * 11) % 120 + 1).toByte)
    val shared = Seq(chunk(1), chunk(2), chunk(3))
    val corpus = Seq(
      (1L, graft.operators.AudioHeaders.mp3Fixture(shared)),
      (3L, graft.operators.AudioHeaders.adtsFixture(shared)))
      .toDF("doc_id", "media")
    val fresh = Seq(
      (10L, graft.operators.AudioHeaders.mp3Fixture(chunk(9) +: shared)),
      (11L, graft.operators.AudioHeaders.mp3Fixture(
        Seq(chunk(70), chunk(71))))).toDF("doc_id", "media")
    val idx = Multimodal.audioFramePHashes(corpus, stride = 1)
      .select("doc_id", "frame_phash").distinct()
    val got = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, idx, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L))) // re-chunked MP3 pairs; ADTS does not
  }
}
