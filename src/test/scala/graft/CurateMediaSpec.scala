package graft

import graft.app.CurateMedia
import graft.operators.{AudioHeaders, VideoContainers}
import graft.streaming.StreamingMediaNearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The media curation pipeline: exact dedup → guarded frame near-dup →
  * survivor media + both nightly index artifacts, mixed containers
  * flowing through the one media-agnostic walk. */
class CurateMediaSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def chunk(seed: Int): Array[Byte] =
    Array.tabulate(16)(i => ((seed * 41 + i * 11) % 120 + 1).toByte)

  test("curate: exact dup dropped, near-dup loses higher id, mixed artifacts serve both ingest paths") {
    val mj = Seq(chunk(1), chunk(2), chunk(3))
    val mp = Seq(chunk(20), chunk(21), chunk(22))
    val corpus = Seq(
      (1L, VideoContainers.mjpegFixture(8, mj)),
      (2L, VideoContainers.mjpegFixture(8, mj)),          // exact dup of 1
      (3L, VideoContainers.mjpegFixture(8, chunk(9) +: mj)), // near-dup of 1
      (4L, AudioHeaders.mp3Fixture(mp)),
      (5L, AudioHeaders.mp3Fixture(chunk(29) +: mp)),     // near-dup of 4
      (6L, AudioHeaders.adtsFixture(Seq(chunk(50), chunk(51))))
    ).toDF("doc_id", "media")
    val out = java.nio.file.Files.createTempDirectory("curate_media").toString
    val counts = CurateMedia.run(corpus, out, tau = 0.5, buckets = 2,
      indexTable = "cm_spec_idx")
    assert(counts == CurateMedia.MediaStageCounts(6L, 5L, 3L,
      spark.table("cm_spec_idx").count()))
    val survivors = spark.read.parquet(s"$out/media")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 6L)) // min-id canonical per family
    // the slim index covers exactly the survivors
    assert(spark.table("cm_spec_idx").select("doc_id").distinct()
      .as[Long].collect().toSet == survivors)
    // the postings artifact serves the STREAMING path: a re-chunked MP3
    // dup of survivor 4 pairs against it (the mixed-media property —
    // a video-only index build would have missed this), and the dropped
    // near-dup 5 is not in the index
    val postings = spark.table("cm_spec_idx_postings")
    assert(postings.select("doc_id").distinct()
      .as[Long].collect().toSet == survivors)
    val fresh = Seq((40L, AudioHeaders.mp3Fixture(chunk(60) +: mp)))
      .toDF("doc_id", "media")
    val pairs = StreamingMediaNearDup
      .mediaNearDupAgainstIndex(fresh, postings, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((40L, 4L)))
    // and the batch incremental path reads the slim index
    val incr = graft.operators.Multimodal.incrementalFrameNearDupPairs(
      graft.operators.Multimodal.mediaFramePHashes(fresh, stride = 1),
      spark.table("cm_spec_idx"), tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(incr == Set((40L, 4L)))
    graft.operators.OperatorCaches.releaseAll()
  }

  test("auto-derived stop-frame cut is baked into the postings artifact without any CLI cut") {
    // boilerplate regime: 20 intro chunks shared by EVERY one of 30
    // docs (20 hashes × C(30,2) = 8 700 candidates > the 256/doc
    // budget of 7 680), a family chunk shared by groups of 5 (the
    // mid-tier the derived cut lands on: 60 residual candidates), a
    // distinct body per doc. The guard derives cut 5, and the pipeline
    // must bake THAT cut into the postings build — not the CLI's
    // (absent) one. Budget floor lowered so the 10⁶ floor cannot
    // swallow the fixture.
    val intros = (1 to 20).map(i => chunk(700 + i))
    val corpus = (1L to 30L).map { id =>
      (id, VideoContainers.mjpegFixture(8,
        intros ++ Seq(chunk(500 + (id % 6).toInt), chunk(100 + id.toInt))))
    }.toDF("doc_id", "media")
    val out = java.nio.file.Files.createTempDirectory("curate_cut").toString
    CurateMedia.run(corpus, out, tau = 0.9, buckets = 2,
      indexTable = "cm_cut_idx", autoBudgetFloor = 1L)
    val meta = spark.table("cm_cut_idx_postings").schema("fhs").metadata
    assert(meta.contains("graft.maxPostings"),
      "postings artifact must carry the baked cut as column metadata")
    val baked = meta.getLong("graft.maxPostings")
    assert(baked == 5L, s"baked cut $baked (expected the family tier)")
    // stride metadata flows through the serving view too (the view is
    // the swap target of the versioned rebuild — a stream consuming it
    // must still hit the stride-mismatch refusal)
    assert(meta.getLong("graft.stride") == 1L)
    intercept[IllegalArgumentException] {
      StreamingMediaNearDup.mediaNearDupAgainstIndex(
        corpus.limit(1), spark.table("cm_cut_idx_postings"),
        tau = 0.5, stride = 2).collect()
    }
    graft.operators.OperatorCaches.releaseAll()
  }

  test("versioned postings rebuild: atomic view swap, previous version kept, older dropped") {
    val mk = (id: Long) => (id, VideoContainers.mjpegFixture(8,
      Seq(chunk(id.toInt), chunk(300 + id.toInt))))
    val out = java.nio.file.Files.createTempDirectory("curate_ver").toString
    def runWith(ids: Range): Unit =
      CurateMedia.run(ids.map(i => mk(i.toLong)).toDF("doc_id", "media"),
        out, tau = 0.9, buckets = 2, indexTable = "cm_ver_idx")
    runWith(1 to 3)
    assert(spark.catalog.tableExists("cm_ver_idx_postings_v1"))
    assert(spark.catalog.getTable("cm_ver_idx_postings").tableType == "VIEW")
    runWith(1 to 4)
    // v2 serves, v1 kept for in-flight readers
    assert(spark.catalog.tableExists("cm_ver_idx_postings_v2"))
    assert(spark.catalog.tableExists("cm_ver_idx_postings_v1"))
    assert(spark.table("cm_ver_idx_postings").select("doc_id")
      .distinct().count() == 4)
    runWith(1 to 5)
    // v3 serves, v2 kept, v1 dropped — catalog AND files
    assert(spark.catalog.tableExists("cm_ver_idx_postings_v3"))
    assert(spark.catalog.tableExists("cm_ver_idx_postings_v2"))
    assert(!spark.catalog.tableExists("cm_ver_idx_postings_v1"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/frame_postings/v1")))
    assert(spark.table("cm_ver_idx_postings").select("doc_id")
      .distinct().count() == 5)
    graft.operators.OperatorCaches.releaseAll()
  }
}
