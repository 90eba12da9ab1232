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

  test("pre-exploded postings index: rows ≡ prebuilt sets ≡ raw; zero corpus-side Exchange; real stream parity") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val fresh = mediaOf(col("doc_id") % 4 === 0)
    val idx = corpusIndex.cache()
    val dir = Files.createTempDirectory("smnd_postings").toString
    Multimodal.writeFramePostingsBucketed(idx, "smnd_postings_idx",
      buckets = 4, path = Some(s"$dir/smnd_postings_idx"))
    val postings = spark.table("smnd_postings_idx")
    // stride metadata persisted through the catalog
    assert(postings.schema("fhs").metadata.getLong("graft.stride") == 1L)
    val raw = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, idx, tau = 0.4)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaPostings = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, postings, tau = 0.4)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaPostings == raw && raw.nonEmpty)
    // plan pin (batch form of the identical per-micro-batch plan), AQE
    // off for stable shapes, auto-broadcast off so a broadcast of the
    // tiny test corpus can't bypass the bucketed layout under test
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = StreamingMediaNearDup
        .mediaNearDupAgainstIndex(fresh, postings, tau = 0.4)
        .queryExecution.executedPlan
      def scansIdx(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case sc: FileSourceScanExec => sc }
          .exists(_.metadata.get("Location").exists(_.contains("smnd_postings_idx")))
      // the corpus (right) side of every shuffled join on frame_phash
      // that reads the postings table must read it exchange-free: the
      // bucketed scan's hash partitioning feeds the join directly and
      // only the stream side shuffles — the shape that stops a
      // stream-static join from re-shuffling the corpus per micro-batch
      val corpusSides = plan.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("frame_phash")) => j.right
        case j: ShuffledHashJoinExec
          if j.leftKeys.exists(_.toString.contains("frame_phash")) => j.right
      }.filter(scansIdx)
      assert(corpusSides.nonEmpty, plan.toString.take(3000))
      corpusSides.foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          side.toString.take(3000))
      }
      // and the corpus subtree contains NO aggregation or generator —
      // pre-explosion moved both to the nightly build
      corpusSides.foreach { side =>
        assert(side.collect {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }.isEmpty && side.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }.isEmpty, side.toString.take(3000))
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
    // a REAL micro-batch run against the postings table gives the same
    // pairs exactly once
    val in = Files.createTempDirectory("smnd_p_in")
    val ckpt = Files.createTempDirectory("smnd_p_ck")
    val tmp = Files.createTempDirectory("smnd_p_b").toString
    fresh.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, in.resolve("b1.parquet"))
    val stream = spark.readStream.schema(schema).parquet(in.toString)
    val q = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(stream, postings, tau = 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("smnd_p_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("smnd_p_out")
        .as[(Long, Long, Long, Double)].collect()
      assert(got.length == got.toSet.size)
      assert(got.toSet == raw)
    } finally {
      q.stop()
      idx.unpersist()
    }
  }

  test("nightly-derived cut: postings index built with maxPostings ≡ the batch incremental cut") {
    // fixture where the corpus-only and combined (corpus+batch) posting
    // histograms agree on the keep set — the regime the nightly-derived
    // static cut is priced for (a live batch can only tip a hash over
    // the cut until the next rebuild, the documented staleness):
    // boiler chunk in all 5 corpus docs (cut either way at cut=4),
    // content hashes in ≤2 corpus docs + ≤1 batch doc (combined ≤ 3).
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 43 + i * 13) % 120 + 1).toByte)
    val boiler = chunk(0)
    def vid(chunks: Array[Byte]*) =
      VideoContainers.mjpegFixture(8, boiler +: chunks.toSeq)
    val corpusMedia = Seq(
      (1L, vid(chunk(1), chunk(2))), (2L, vid(chunk(1), chunk(2))),
      (3L, vid(chunk(5), chunk(6))), (4L, vid(chunk(5), chunk(6))),
      (5L, vid(chunk(30), chunk(31)))).toDF("doc_id", "media")
    val batchMedia = Seq(
      (10L, vid(chunk(1), chunk(2))),
      (11L, vid(chunk(40), chunk(41)))).toDF("doc_id", "media")
    val cut = 4
    val idx = Multimodal.videoFramePHashes(corpusMedia, stride = 1)
      .select("doc_id", "frame_phash").distinct()
    val dir = Files.createTempDirectory("smnd_cutidx").toString
    Multimodal.writeFramePostingsBucketed(idx, "smnd_cut_idx",
      buckets = 4, path = Some(s"$dir/smnd_cut_idx"), maxPostings = cut)
    val postings = spark.table("smnd_cut_idx")
    assert(postings.schema("fhs").metadata.getLong("graft.maxPostings") == cut.toLong)
    // the boiler hash must be gone from the index rows AND the carried sets
    assert(postings.groupBy("frame_phash").count()
      .agg(max("count")).head.getLong(0) <= cut.toLong)
    val streaming = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(batchMedia, postings, tau = 0.3)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = Multimodal.incrementalFrameNearDupPairs(
        Multimodal.videoFramePHashes(batchMedia, stride = 1), idx,
        tau = 0.3, maxPostings = cut)
      .filter(col("vs_corpus"))
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streaming == batch && streaming.nonEmpty, s"$streaming vs $batch")
    // the cut actually bit: the boiler-only "pair" (10, 5) shares only
    // the cut hash and must NOT appear, while uncut it would
    val uncut = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(batchMedia,
        StreamingMediaNearDup.corpusFrameSets(idx), tau = 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncut.contains((10L, 5L)) && !streaming.map(p => (p._1, p._2)).contains((10L, 5L)))
    graft.operators.OperatorCaches.releaseAll()
  }

  test("stride and schema contracts are enforced, not sniffed") {
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 41 + i * 11) % 120 + 1).toByte)
    val corpus = Seq((1L, VideoContainers.mjpegFixture(8,
      Seq(chunk(1), chunk(2), chunk(3))))).toDF("doc_id", "media")
    val fresh = Seq((2L, VideoContainers.mjpegFixture(8,
      Seq(chunk(1), chunk(2), chunk(3))))).toDF("doc_id", "media")
    val idx = Multimodal.videoFramePHashes(corpus, stride = 1)
      .select("doc_id", "frame_phash").distinct()
    val dir = Files.createTempDirectory("smnd_stride").toString
    Multimodal.writeFramePostingsBucketed(idx, "smnd_stride_idx",
      buckets = 2, path = Some(s"$dir/smnd_stride_idx"), stride = 2)
    // index built at stride 2, stream walking at stride 1 → refused
    val ex = intercept[IllegalArgumentException] {
      StreamingMediaNearDup.mediaNearDupAgainstIndex(
        fresh, spark.table("smnd_stride_idx"), tau = 0.4)
    }
    assert(ex.getMessage.contains("stride"))
    // a prebuilt-sets table whose fhs is the wrong element type → refused
    val badSets = Seq((1L, Seq("a", "b"))).toDF("doc_id", "fhs")
    val ex2 = intercept[IllegalArgumentException] {
      StreamingMediaNearDup.mediaNearDupAgainstIndex(fresh, badSets, tau = 0.4)
    }
    assert(ex2.getMessage.contains("array<bigint>"))
    // a prebuilt-sets table with a NON-DISTINCT (or unsorted) fhs array
    // → refused at accept time (shared/jaccard would be silently wrong);
    // assumeDistinct=true is the explicit caller-owns-it escape
    val dupSets = Seq((1L, Seq(5L, 5L, 9L)), (2L, Seq(9L, 3L)))
      .toDF("doc_id", "fhs")
    val ex3 = intercept[IllegalArgumentException] {
      StreamingMediaNearDup.mediaNearDupAgainstIndex(fresh, dupSets, tau = 0.4)
    }
    assert(ex3.getMessage.contains("non-distinct"))
    StreamingMediaNearDup.mediaNearDupAgainstIndex(
      fresh, dupSets, tau = 0.4, assumeDistinct = true) // accepted as-is
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
