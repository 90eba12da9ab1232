package graft

import graft.operators.{AudioHeaders, Multimodal, VideoContainers}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Container parsers must recover codec-true frame units (offsets,
  * sizes, decode times, dimensions) from hand-built byte layouts —
  * and never throw on malformed bytes. */
class VideoContainersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------------------------------------------------------- //
  //  MJPEG                                                            //
  // ---------------------------------------------------------------- //

  private def asciiChunk(seed: Int): Array[Byte] =
    (0 until 16).map(i => (32 + (seed * 7 + i * 3) % 90).toByte).toArray

  test("scanMjpeg: fixture stream — boundaries, per-frame SOF dims, hashes") {
    val chunks = Seq(asciiChunk(1), asciiChunk(2), asciiChunk(3))
    val bytes = VideoContainers.mjpegFixture(width = 5, chunks)
    assert(bytes.length == 3 * 47)
    val frames = VideoContainers.scanMjpeg(bytes)
    assert(frames.map(f => (f.idx, f.off, f.len)) ==
      Seq((0L, 0L, 47L), (1L, 47L, 47L), (2L, 94L, 47L)))
    assert(frames.forall(f => f.width == 5 && f.height == 8))
    // each frame is independently a header-parseable JPEG
    val f1 = java.util.Arrays.copyOfRange(bytes, 47, 94)
    val meta = graft.operators.ImageHeaders.decodeJpeg(f1).get
    assert(meta.width == 5 && meta.height == 8)
  }

  test("scanMjpeg: entropy-data traversal is not fooled by stuffing/RST/fill") {
    // hand-build one frame with extras the fixture doesn't use: fill
    // bytes before EOI and a second stuffed FF just before the RST
    val out = new java.io.ByteArrayOutputStream()
    def w(xs: Int*): Unit = xs.foreach(out.write)
    w(0xff, 0xd8) // SOI
    w(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00)
    w(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00)
    w(0x10, 0xff, 0x00, 0xff, 0x00, 0xff, 0xd3, 0x20) // stuffed, stuffed, RST3
    w(0xff, 0xff, 0xff, 0xd9) // fill bytes then EOI
    val one = out.toByteArray
    val frames = VideoContainers.scanMjpeg(one ++ one)
    assert(frames.map(_.off) == Seq(0L, one.length.toLong))
    assert(frames.forall(f => f.len == one.length.toLong &&
      f.width == 3 && f.height == 2))
  }

  test("scanMjpeg: malformed/truncated tails are dropped, junk rejected") {
    val good = VideoContainers.mjpegFixture(4, Seq(asciiChunk(4)))
    // truncated second frame (no EOI)
    val truncated = good ++ good.dropRight(3)
    assert(VideoContainers.scanMjpeg(truncated).size == 1)
    // trailing junk after a complete frame: frame kept, junk dropped
    assert(VideoContainers.scanMjpeg(good ++ Array[Byte](1, 2, 3)).size == 1)
    // not a JPEG at all / pathological markers: empty, no throw
    assert(VideoContainers.scanMjpeg("plain text".getBytes).isEmpty)
    assert(VideoContainers.scanMjpeg(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc0.toByte, 0x00, 0x01)).isEmpty) // segment len < 2
  }

  // ---------------------------------------------------------------- //
  //  MP4 — hand-built boxes                                           //
  // ---------------------------------------------------------------- //

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
  private def fullBox(typ: String, version: Int, payload: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](version.toByte, 0, 0, 0) ++ payload)

  /** Minimal playable-shape MP4 in the streaming layout (moov before
    * mdat): ftyp, moov/trak/{tkhd, mdia/{mdhd, hdlr, minf/stbl/{stsz,
    * stsc, stco, stts}}}, mdat with the sample bytes. 5 samples of
    * varying sizes in 2 chunks (2 then 3 samples). Chunk offsets are
    * absolute, so moov is assembled twice: once with placeholders to
    * learn its own length, then with the real offsets. */
  private def buildMp4(co64: Boolean = false, mdhdV1: Boolean = false,
      uniformSize: Boolean = false): (Array[Byte], Seq[(Long, Long, Long)]) = {
    val sizes = if (uniformSize) Seq(4L, 4L, 4L, 4L, 4L) else Seq(3L, 5L, 2L, 7L, 4L)
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val payload = Array.tabulate(sizes.sum.toInt)(i => (i + 1).toByte)
    def moov(c1: Long, c2: Long): Array[Byte] = {
      val tkhd = fullBox("tkhd", 0,
        new Array[Byte](72) ++ be32(320L << 16) ++ be32(240L << 16))
      val mdhd =
        if (mdhdV1) fullBox("mdhd", 1,
          be64(0) ++ be64(0) ++ be32(90000) ++ be64(0) ++ Array[Byte](0, 0, 0, 0))
        else fullBox("mdhd", 0,
          be32(0) ++ be32(0) ++ be32(90000) ++ be32(0) ++ Array[Byte](0, 0, 0, 0))
      val hdlr = fullBox("hdlr", 0,
        be32(0) ++ "vide".getBytes ++ new Array[Byte](12))
      val stsz =
        if (uniformSize) fullBox("stsz", 0, be32(4) ++ be32(5))
        else fullBox("stsz", 0, be32(0) ++ be32(5) ++ sizes.flatMap(be32).toArray)
      val stsc = fullBox("stsc", 0,
        be32(2) ++ be32(1) ++ be32(2) ++ be32(1) ++ be32(2) ++ be32(3) ++ be32(1))
      val stco =
        if (co64) fullBox("co64", 0, be32(2) ++ be64(c1) ++ be64(c2))
        else fullBox("stco", 0, be32(2) ++ be32(c1) ++ be32(c2))
      val stts = fullBox("stts", 0,
        be32(2) ++ be32(3) ++ be32(10) ++ be32(2) ++ be32(15))
      box("moov", box("trak", tkhd ++ box("mdia",
        mdhd ++ hdlr ++ box("minf", box("stbl", stsz ++ stsc ++ stco ++ stts)))))
    }
    val mdatDataOff = ftyp.length + moov(0, 0).length + 8L // fixed-width offsets
    // chunk 1 = samples 0,1; chunk 2 = samples 2,3,4 (contiguous in mdat)
    val chunk1Off = mdatDataOff
    val chunk2Off = mdatDataOff + sizes(0) + sizes(1)
    val expected = Seq(
      (chunk1Off, sizes(0), 0L),
      (chunk1Off + sizes(0), sizes(1), 10L),
      (chunk2Off, sizes(2), 20L),
      (chunk2Off + sizes(2), sizes(3), 30L),
      (chunk2Off + sizes(2) + sizes(3), sizes(4), 45L)) // stts run 2: delta 15
    (ftyp ++ moov(chunk1Off, chunk2Off) ++ box("mdat", payload), expected)
  }

  test("parseMp4: sample table expansion — offsets, sizes, decode times, dims") {
    val (bytes, expected) = buildMp4()
    val trk = VideoContainers.parseMp4(bytes).get
    assert(trk.timescale == 90000L)
    assert(trk.frames.map(f => (f.off, f.len, f.timeTicks)) == expected)
    assert(trk.frames.map(_.idx) == (0L to 4L))
    assert(trk.frames.forall(f => f.width == 320 && f.height == 240))
  }

  test("parseMp4: co64 offsets, v1 mdhd, uniform stsz variants") {
    val (b1, e1) = buildMp4(co64 = true)
    assert(VideoContainers.parseMp4(b1).get.frames.map(f => (f.off, f.len, f.timeTicks)) == e1)
    val (b2, _) = buildMp4(mdhdV1 = true)
    assert(VideoContainers.parseMp4(b2).get.timescale == 90000L)
    val (b3, e3) = buildMp4(uniformSize = true)
    assert(VideoContainers.parseMp4(b3).get.frames.map(f => (f.off, f.len, f.timeTicks)) == e3)
  }

  test("parseMp4: malformed bytes never throw; out-of-file samples dropped") {
    assert(VideoContainers.parseMp4("not an mp4 file at all".getBytes).isEmpty)
    // moov-first layout: chopping mid-mdat keeps the sample tables but
    // leaves the tail samples' byte ranges beyond EOF → dropped, no throw
    val (full, expected) = buildMp4()
    val cut = (expected(3)._1 + 2).toInt // inside sample 3
    val trk = VideoContainers.parseMp4(full.take(cut)).get
    assert(trk.frames.map(f => (f.off, f.len, f.timeTicks)) == expected.take(3))
  }

  test("mp4Fixture: parser inverts the library fixture; data offset constant in n") {
    val samples = (0 until 5).map(i => Array.tabulate[Byte](16)(j => (i * 16 + j).toByte))
    val bytes = VideoContainers.mp4Fixture(7, 3, 90000L, 3600L, samples)
    val trk = VideoContainers.parseMp4(bytes).get
    assert(trk.timescale == 90000L)
    assert(trk.frames.map(f => (f.idx, f.len, f.timeTicks, f.width, f.height)) ==
      (0 until 5).map(i => (i.toLong, 16L, 3600L * i, 7, 3)))
    // offsets: the constant fixture data offset + 16·idx, and the
    // parsed slices are exactly the input samples
    assert(trk.frames.map(_.off) ==
      (0 until 5).map(i => VideoContainers.mp4FixtureDataOff + 16L * i))
    trk.frames.zip(samples).foreach { case (f, s) =>
      assert(java.util.Arrays.copyOfRange(bytes, f.off.toInt,
        (f.off + f.len).toInt).toSeq == s.toSeq)
    }
    // moov size independent of n (the q90 oracle's premise)
    val one = VideoContainers.mp4Fixture(7, 3, 90000L, 3600L, samples.take(1))
    assert(VideoContainers.parseMp4(one).get.frames.head.off ==
      VideoContainers.mp4FixtureDataOff)
  }

  // ---------------------------------------------------------------- //
  //  Spark plumbing                                                   //
  // ---------------------------------------------------------------- //

  test("sampleContainerFrames: dispatches mp4/mjpeg/raw by content") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val (mp4, mp4Expected) = buildMp4()
    val mjpeg = VideoContainers.mjpegFixture(6, Seq(asciiChunk(7), asciiChunk(8)))
    val raw = "0123456789abcdef0123456789abcdef".getBytes // 2 fallback frames
    val media = Seq((1L, mp4), (2L, mjpeg), (3L, raw)).toDF("doc_id", "media")
    val got = Multimodal.sampleContainerFrames(media, stride = 1)
      .collect().groupBy(_.doc_id)
    assert(got(1L).forall(_.container == "mp4"))
    assert(got(1L).map(f => (f.byte_off, f.n_bytes, f.time_ticks)).toSeq
      .sortBy(_._1) == mp4Expected)
    assert(got(2L).forall(f => f.container == "mjpeg" && f.width == 6))
    assert(got(2L).map(_.byte_off).sorted.toSeq == Seq(0L, 47L))
    assert(got(3L).forall(f => f.container == "raw" && f.n_bytes == 16L))
    // stride sampling keeps true indices
    val strided = Multimodal.sampleContainerFrames(media, stride = 2)
      .filter($"doc_id" === 1L).collect().map(_.frame_idx).sorted.toSeq
    assert(strided == Seq(0L, 2L, 4L))
  }

  test("documentVideoFrames matches the fixture arithmetic (q89 shape)") {
    val out = Multimodal.documentVideoFrames(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq == Seq("doc_id", "frame_idx", "byte_off",
      "n_bytes", "time_ticks", "width", "frame_hash"))
    val bad = out.filter(col("byte_off") =!= col("frame_idx") * 47 ||
      col("n_bytes") =!= 47 || col("width") =!= pmod(col("doc_id"), lit(16)) + 1)
    assert(bad.isEmpty)
    assert(out.count() > 0)
  }

  test("dHash64: brightness-shifted re-encode keeps the perceptual hash, byte hash differs") {
    // gradient SIGNS survive a uniform brightness shift — the property
    // that lets frame-level dedup catch re-encodes; the byte-fold hash
    // (exact identity) breaks on the very first shifted byte
    val w = 18; val h = 16
    def img(shift: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        rgb((y * w + x) * 3 + c) =
          (((x * 11 + y * 7 + c * 3) % 120) + shift).toByte
      graft.operators.PixelDecode.bmpFixture(w, h, rgb)
    }
    val base = img(0)
    val brighter = img(60)
    assert(Multimodal.perceptualFrameHash(base) ==
      Multimodal.perceptualFrameHash(brighter))
    assert(Multimodal.byteFoldHash(base) != Multimodal.byteFoldHash(brighter))
    // non-decodable payloads take the byte-fold tier
    val rawBytes = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.perceptualFrameHash(rawBytes) ==
      Multimodal.byteFoldHash(rawBytes))
  }

  test("videoNearDupPairs: re-muxed duplicate caught despite shifted byte offsets") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 31 + i * 7) % 120 + 1).toByte)
    val shared = Seq(chunk(1), chunk(2), chunk(3))
    // B carries an extra leading frame: every shared frame sits at a
    // DIFFERENT byte offset than in A — whole-file or offset-keyed
    // hashing misses this; per-frame hashing does not
    val vidA = VideoContainers.mjpegFixture(8, shared)
    val vidB = VideoContainers.mjpegFixture(8, chunk(9) +: shared)
    val vidC = VideoContainers.mjpegFixture(8, Seq(chunk(4), chunk(5), chunk(6)))
    val media = Seq((1L, vidA), (2L, vidB), (3L, vidC)).toDF("doc_id", "media")
    val frames = Multimodal.videoFramePHashes(media, stride = 1)
    val pairs = Multimodal.videoNearDupPairs(frames, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // A~B (jaccard 3/4); C unrelated
  }

  test("videoNearDupPairs: maxPostings drops boilerplate frames, jaccard stays a lower bound") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 37 + i * 5) % 120 + 1).toByte)
    val boiler = chunk(0) // an intro frame every video shares
    val media = Seq(
      (1L, VideoContainers.mjpegFixture(8, Seq(boiler, chunk(1), chunk(2)))),
      (2L, VideoContainers.mjpegFixture(8, Seq(boiler, chunk(1), chunk(2)))),
      (3L, VideoContainers.mjpegFixture(8, Seq(boiler, chunk(7), chunk(8)))),
      (4L, VideoContainers.mjpegFixture(8, Seq(boiler, chunk(5), chunk(6))))
    ).toDF("doc_id", "media")
    val frames = Multimodal.videoFramePHashes(media, stride = 1)
    // the boilerplate hash appears in all 4 videos -> dropped at
    // maxPostings=3; true dups still pair (2 of 3 frames shared), and
    // the boiler-only overlaps (1 of 3) never reach tau
    val pairs = Multimodal.videoNearDupPairs(frames, tau = 0.5, maxPostings = 3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // set sizes keep the dropped hash: jaccard 2/(3+3-2), not 2/(2+2-2)
    assert(pairs.head._3 == 0.5)
  }

  test("videoNearDupPairs: maxCandidatePairs auto-derives the stop-frame cut") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 37 + i * 5) % 120 + 1).toByte)
    val boiler = chunk(0) // shared by ALL videos -> n_h = 12
    // 6 exact-duplicate pairs (2k+1, 2k+2 carry identical frames) +
    // the boilerplate frame across all 12: boiler alone contributes
    // 12·11/2 = 66 candidates, the 12 dup hashes 1 each
    val media = (0 until 6).flatMap { k =>
      val fr = Seq(boiler, chunk(k + 1), chunk(k + 50))
      Seq((2L * k + 1, VideoContainers.mjpegFixture(8, fr)),
          (2L * k + 2, VideoContainers.mjpegFixture(8, fr)))
    }.toDF("doc_id", "media")
    val frames = Multimodal.videoFramePHashes(media, stride = 1).cache()
    val expected = Multimodal
      .videoNearDupPairs(frames, tau = 0.5, maxPostings = 2)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(expected.map(p => (p._1, p._2)) ==
      (0 until 6).map(k => (2L * k + 1, 2L * k + 2)).toSet)
    // budget 30 < 78 total candidates -> the guard must cut the
    // boilerplate hash (n_h=12) but keep the dup hashes (n_h=2):
    // residual volume = 12, largest fitting cut p = 2
    val guarded = Multimodal
      .videoNearDupPairs(frames, tau = 0.5, maxCandidatePairs = 30L)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(guarded == expected) // auto cut ≡ the explicit stop-frame cut
    // within budget -> no cut: boiler-inflated jaccard pairs everything
    val unguarded = Multimodal
      .videoNearDupPairs(frames, tau = 0.5, maxCandidatePairs = 1000L)
      .count()
    assert(unguarded ==
      Multimodal.videoNearDupPairs(frames, tau = 0.5).count())
    // a budget below even the n_h=2 mass refuses, naming the cause
    val ex = intercept[IllegalStateException] {
      Multimodal.videoNearDupPairs(frames, tau = 0.5,
        maxCandidatePairs = 3L).count()
    }
    assert(ex.getMessage.contains("genuine pairwise duplication"))
    frames.unpersist()
  }

  test("frameNearDupPairsAuto: guard always on at the 256/doc (floor 1e6) budget") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 37 + i * 5) % 120 + 1).toByte)
    val boiler = chunk(0)
    val media = (0 until 6).flatMap { k =>
      val fr = Seq(boiler, chunk(k + 1), chunk(k + 50))
      Seq((2L * k + 1, VideoContainers.mjpegFixture(8, fr)),
          (2L * k + 2, VideoContainers.mjpegFixture(8, fr)))
    }.toDF("doc_id", "media")
    val frames = Multimodal.videoFramePHashes(media, stride = 1).cache()
    // capture the dispatch line: the production entry must price the
    // budget from the doc count (12 docs -> floor 1e6 wins) and hand
    // it to the guard — no caller opt-in required
    val errBuf = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    val auto =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
        Multimodal.frameNearDupPairsAuto(frames, tau = 0.5)
          .select("doc_a", "doc_b", "shared", "jaccard")
          .as[(Long, Long, Long, Double)].collect().toSet
      } finally System.setErr(oldErr)
    val log = errBuf.toString("UTF-8")
    assert(log.contains(
      "videoNearDupPairs: autoBudget: nDocs=12 -> maxCandidatePairs=1000000"))
    assert(log.contains("videoNearDupPairs: postingsPairBound=")
      && log.contains("<= budget=1000000 -> ok"))
    // 78 candidates fit the 1e6 floor -> no cut -> parity with the
    // raw operator at this scale
    val raw = Multimodal.videoNearDupPairs(frames, tau = 0.5)
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(auto == raw)
    frames.unpersist()
  }

  test("incrementalFrameNearDupPairs: increment ≡ full re-run restricted to new docs, incl. the cut") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 43 + i * 13) % 120 + 1).toByte)
    val boiler = chunk(0)
    def vid(chunks: Array[Byte]*) =
      VideoContainers.mjpegFixture(8, boiler +: chunks.toSeq)
    // corpus: 3 videos, one duplicate pair (1,2); new batch: 10 dups
    // 1's frames (vs_corpus), 11/12 duplicate each other (new-new),
    // 13 unrelated
    val corpusMedia = Seq(
      (1L, vid(chunk(1), chunk(2))), (2L, vid(chunk(1), chunk(2))),
      (3L, vid(chunk(5), chunk(6)))).toDF("doc_id", "media")
    val newMedia = Seq(
      (10L, vid(chunk(1), chunk(2))),
      (11L, vid(chunk(7), chunk(8))), (12L, vid(chunk(7), chunk(8))),
      (13L, vid(chunk(20), chunk(21)))).toDF("doc_id", "media")
    val corpusSets = Multimodal.videoFramePHashes(corpusMedia, stride = 1)
      .select("doc_id", "frame_phash").distinct()
    val newFrames = Multimodal.videoFramePHashes(newMedia, stride = 1)
    val allFrames = Multimodal.videoFramePHashes(
      corpusMedia.unionByName(newMedia), stride = 1)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, sh, j) => (math.min(a, b), math.max(a, b), sh, j) }
      .toSet
    for (cut <- Seq(0, 4)) { // unguarded, and with the boiler cut
      val incr = Multimodal.incrementalFrameNearDupPairs(
        newFrames, corpusSets, tau = 0.5, maxPostings = cut)
      val full = Multimodal.videoNearDupPairs(allFrames, tau = 0.5,
        maxPostings = cut)
        .filter(col("doc_a") >= 10L || col("doc_b") >= 10L)
      assert(norm(incr) == norm(full), s"cut=$cut")
      assert(norm(incr).nonEmpty)
    }
    // the vs_corpus flag discriminates correctly
    val flags = Multimodal.incrementalFrameNearDupPairs(
      newFrames, corpusSets, tau = 0.5)
      .select("doc_a", "doc_b", "vs_corpus")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(flags.filter(_._3).map(_._1).forall(_ >= 10L)) // doc_a is new
    assert(flags.exists(f => f._3) && flags.exists(f => !f._3))
  }

  test("writeFrameIndexBucketed: corpus side of the postings join never shuffles; rows ≡ in-memory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 43 + i * 13) % 120 + 1).toByte)
    def vid(chunks: Array[Byte]*) =
      VideoContainers.mjpegFixture(8, chunk(0) +: chunks.toSeq)
    val corpusMedia = Seq(
      (1L, vid(chunk(1), chunk(2))), (2L, vid(chunk(1), chunk(2))),
      (3L, vid(chunk(5), chunk(6)))).toDF("doc_id", "media")
    val newMedia = Seq(
      (10L, vid(chunk(1), chunk(2))),
      (11L, vid(chunk(7), chunk(8))), (12L, vid(chunk(7), chunk(8))),
      (13L, vid(chunk(20), chunk(21)))).toDF("doc_id", "media")
    val corpusSets = Multimodal.videoFramePHashes(corpusMedia, stride = 1)
      .select("doc_id", "frame_phash").distinct()
    val newFrames = Multimodal.videoFramePHashes(newMedia, stride = 1)
    val dir = java.nio.file.Files.createTempDirectory("media_fidx").toString
    Multimodal.writeFrameIndexBucketed(corpusSets, "media_frame_idx",
      buckets = 4, path = Some(s"$dir/media_frame_idx"))
    // plan pin with AQE off (stable shapes) and auto-broadcast off —
    // a broadcast of the tiny test batch would bypass the bucketed
    // layout this test exists to prove
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = Multimodal.incrementalFrameNearDupPairs(
        newFrames, spark.table("media_frame_idx"), tau = 0.5)
      val plan = res.queryExecution.executedPlan
      def scansIdx(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case sc: FileSourceScanExec => sc }
          .exists(_.metadata.get("Location").exists(_.contains("media_frame_idx")))
      // every shuffled join whose (right = corpus) subtree reads the
      // bucketed table must read it exchange-free: the scan's bucket
      // partitioning feeds the join directly, only the batch side
      // shuffles
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
      // row identity with the in-memory corpus-sets path, incl. a cut
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_a", "doc_b", "shared", "jaccard", "vs_corpus")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      for (cut <- Seq(0, 4)) {
        val persisted = norm(Multimodal.incrementalFrameNearDupPairs(
          newFrames, spark.table("media_frame_idx"), tau = 0.5,
          maxPostings = cut))
        val inMem = norm(Multimodal.incrementalFrameNearDupPairs(
          newFrames, corpusSets, tau = 0.5, maxPostings = cut))
        assert(persisted == inMem && persisted.nonEmpty, s"cut=$cut")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("writeFrameIndexBucketed append: re-ingesting an already-indexed doc adds no duplicate rows") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 43 + i * 13) % 120 + 1).toByte)
    def vid(chunks: Array[Byte]*) =
      VideoContainers.mjpegFixture(8, chunk(0) +: chunks.toSeq)
    val day1 = Seq(
      (1L, vid(chunk(1), chunk(2))),
      (2L, vid(chunk(3), chunk(4)))).toDF("doc_id", "media")
    val day2 = Seq(
      (2L, vid(chunk(3), chunk(4))), // re-ingested — must be dropped
      (3L, vid(chunk(5), chunk(6)))).toDF("doc_id", "media")
    val dir = java.nio.file.Files.createTempDirectory("media_fidx_app").toString
    val tbl = "media_frame_idx_append"
    Multimodal.writeFrameIndexBucketed(
      Multimodal.videoFramePHashes(day1, stride = 1), tbl,
      buckets = 2, path = Some(s"$dir/$tbl"))
    val n1 = spark.table(tbl).count()
    Multimodal.writeFrameIndexBucketed(
      Multimodal.videoFramePHashes(day2, stride = 1), tbl,
      buckets = 2, path = Some(s"$dir/$tbl"), mode = "append")
    val after = spark.table(tbl)
    // doc 2's rows exist exactly once; doc 3's arrived
    assert(after.groupBy("doc_id", "frame_phash").count()
      .agg(max("count")).head.getLong(0) == 1L)
    assert(after.filter(col("doc_id") === 3L).count() > 0)
    assert(after.filter(col("doc_id") === 2L).count() ==
      spark.table(tbl).filter(col("doc_id") === 2L).distinct().count())
    assert(after.count() > n1)
    // re-appending a doc whose PAYLOAD changed must fail loudly —
    // append cannot retract the stale rows, and silently dropping the
    // new ones would leave the incremental join scoring old content
    val day3 = Seq(
      (3L, vid(chunk(5), chunk(99))), // content changed vs day2's doc 3
      (4L, vid(chunk(7), chunk(8)))).toDF("doc_id", "media")
    val ex = intercept[IllegalArgumentException] {
      Multimodal.writeFrameIndexBucketed(
        Multimodal.videoFramePHashes(day3, stride = 1), tbl,
        buckets = 2, path = Some(s"$dir/$tbl"), mode = "append")
    }
    assert(ex.getMessage.contains("DIFFERENT frame set") &&
      ex.getMessage.contains("3"))
    // the refused write left the index untouched
    assert(spark.table(tbl).count() == after.count())
  }

  test("audioFramePHashes feeds videoNearDupPairs: re-chunked audio dup caught, cross-container not") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    def chunk(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 41 + i * 11) % 120 + 1).toByte)
    val shared = Seq(chunk(1), chunk(2), chunk(3))
    // B prepends a frame: every shared MP3 frame shifts to a different
    // byte offset — per-frame hashing still pairs A~B. C carries the
    // SAME chunks as A but as ADTS: different frame bytes, no pair
    // (the documented cross-container contract). D is unrelated MP3.
    val media = Seq(
      (1L, AudioHeaders.mp3Fixture(shared)),
      (2L, AudioHeaders.mp3Fixture(chunk(9) +: shared)),
      (3L, AudioHeaders.adtsFixture(shared)),
      (4L, AudioHeaders.mp3Fixture(Seq(chunk(4), chunk(5), chunk(6))))
    ).toDF("doc_id", "media")
    val frames = Multimodal.audioFramePHashes(media, stride = 1)
    val pairs = Multimodal.videoNearDupPairs(frames, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // jaccard 3/4; C,D unrelated
    // frame units are codec-true: MP3 frames are 288 bytes apart
    val offs = Multimodal.sampleAudioFrames(media.filter($"doc_id" === 1L),
      stride = 1).select("byte_off").as[Long].collect().sorted
    assert(offs.toSeq == Seq(0L, 288L, 576L))
  }
}
