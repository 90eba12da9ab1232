package graft

import graft.operators.{ImageHeaders, Multimodal}
import graft.operators.ImageHeaders.ImageMeta
import org.scalatest.funsuite.AnyFunSuite

/** Hand-crafted container headers pin the byte-level parsing (offsets,
  * endianness, marker walk) independently of the fixture builders. */
class ImageHeadersSpec extends AnyFunSuite {

  test("PNG: hand-written signature + IHDR, big-endian dims") {
    val b = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R', // IHDR chunk header
      0, 0, 0x02, 0x80, // width 640
      0, 0, 0x01, 0xe0, // height 480
      8, 2, 0, 0, 0, 0xde, 0xad, 0xbe, 0xef // depth.. + CRC (ignored)
    ).map(_.toByte)
    assert(ImageHeaders.decode(b).contains(ImageMeta("png", 640, 480)))
  }

  test("PNG fixture round-trips and large dims use full u32") {
    val b = ImageHeaders.pngFixture(70000, 3, Array[Byte](1, 2, 3))
    assert(ImageHeaders.decode(b).contains(ImageMeta("png", 70000, 3)))
    assert(b.length == 33 + 3)
  }

  test("JPEG: marker walk skips APP0/comment segments before SOF0") {
    val app0 = Array[Int](0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0,
      1, 2, 0, 0, 1, 0, 1, 0, 0) // 16-byte APP0 segment
    val com = Array[Int](0xff, 0xfe, 0x00, 0x04, 'h', 'i') // comment
    val sof = Array[Int](0xff, 0xc2, 0x00, 0x0b, 8, // SOF2 (progressive)
      0x01, 0x00, // height 256
      0x00, 0x64, // width 100
      1, 1, 0x11, 0)
    val b = (Array(0xff, 0xd8) ++ app0 ++ com ++ sof).map(_.toByte)
    assert(ImageHeaders.decode(b).contains(ImageMeta("jpeg", 100, 256)))
  }

  test("JPEG: 0xFF fill bytes before a marker are skipped (B.1.1.2)") {
    // padded stream: SOI, then 4 fill bytes before the SOF0 marker
    val sof = Array[Int](0xc0, 0x00, 0x0b, 8,
      0x01, 0x00, // height 256
      0x00, 0x32, // width 50
      1, 1, 0x11, 0)
    val b = (Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff, 0xff) ++ sof)
      .map(_.toByte)
    assert(ImageHeaders.decode(b).contains(ImageMeta("jpeg", 50, 256)))
    // fill bytes between segments too: APP0, pad, SOF
    val app0 = Array[Int](0xff, 0xe0, 0x00, 0x04, 0, 0)
    val b2 = (Array(0xff, 0xd8) ++ app0 ++ Array(0xff, 0xff, 0xff) ++ sof)
      .map(_.toByte)
    assert(ImageHeaders.decode(b2).contains(ImageMeta("jpeg", 50, 256)))
    // stream ENDING in fill bytes: the skip advances past the outer
    // bounds guard — must return None, not read out of bounds
    val fillTail = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(ImageHeaders.decodeJpeg(fillTail).isEmpty)
  }

  test("WAV: near-MaxValue chunk length must not wrap the offset negative") {
    import graft.operators.AudioHeaders
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes); b.write(Array[Byte](36, 0, 0, 0))
    b.write("WAVE".getBytes)
    b.write("JUNK".getBytes)
    b.write(Array(0xee, 0xff, 0xff, 0x7f).map(_.toByte)) // len 0x7FFFFFEE
    b.write(new Array[Byte](20))
    assert(AudioHeaders.decodeWav(b.toByteArray).isEmpty) // and no throw
  }

  test("JPEG fixture round-trips; SOS before SOF gives None") {
    val b = ImageHeaders.jpegFixture(1024, 768, "payload".getBytes)
    assert(ImageHeaders.decode(b).contains(ImageMeta("jpeg", 1024, 768)))
    val scanFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 1, 2, 3).map(_.toByte)
    assert(ImageHeaders.decodeJpeg(scanFirst).isEmpty)
  }

  test("GIF: little-endian logical screen descriptor") {
    val b = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x10, 0x01, 0x08, 0x00, 0, 0, 0).map(_.toByte))
    assert(ImageHeaders.decode(b).contains(ImageMeta("gif", 272, 8)))
    val b87 = ("GIF87a".getBytes("US-ASCII") ++
      Array[Int](2, 0, 3, 0, 0, 0, 0).map(_.toByte))
    assert(ImageHeaders.decode(b87).contains(ImageMeta("gif", 2, 3)))
  }

  test("truncation and garbage never throw, return None") {
    val png = ImageHeaders.pngFixture(10, 10, Array.emptyByteArray)
    assert(ImageHeaders.decode(png.take(20)).isEmpty)
    assert(ImageHeaders.decode(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.decode("plain text, not an image".getBytes).isEmpty)
    // JPEG cut inside a segment length
    val jpg = ImageHeaders.jpegFixture(5, 5, Array.emptyByteArray)
    assert(ImageHeaders.decode(jpg.take(6)).isEmpty)
  }

  test("WAV: fixture round-trips; chunk walk skips LIST; garbage is None") {
    import graft.operators.AudioHeaders
    val b = AudioHeaders.wavFixture(channels = 2, sampleRateHz = 16000,
      bitsPerSample = 16, nFrames = 8000)
    val m = AudioHeaders.decodeWav(b).get
    assert(m.channels == 2 && m.sampleRateHz == 16000 && m.bitsPerSample == 16)
    assert(m.nFrames == 8000 && m.durationMs == 500)
    // hand-build: RIFF/WAVE + a LIST chunk before fmt/data
    val base = AudioHeaders.wavFixture(1, 8000, 8, 100)
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val withList = base.slice(0, 12) ++ list ++ base.drop(12)
    // fix RIFF size irrelevant to parser; chunk walk must skip LIST
    val m2 = AudioHeaders.decodeWav(withList).get
    assert(m2.sampleRateHz == 8000 && m2.nFrames == 100)
    assert(AudioHeaders.decodeWav("notawavfile".getBytes).isEmpty)
    assert(AudioHeaders.decodeWav(base.slice(0, 20)).isEmpty)
  }

  test("decodeFeatures: real dims for containers, stub for unknown") {
    val png = Multimodal.decodeFeatures(1L, ImageHeaders.pngFixture(11, 7, "x".getBytes))
    assert(png.format == "png" && png.width == 11 && png.height == 7)
    val raw = Multimodal.decodeFeatures(2L, "hello".getBytes)
    val h = "hello".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(raw.format == "unknown" && raw.content_hash == h &&
      raw.width == (h % 640).toInt && raw.height == (h % 480).toInt)
  }

  test("MP3 frame walk: header-derived lengths, truncated tail dropped, garbage stops the walk") {
    import graft.operators.AudioHeaders
    def chunk(seed: Int) = Array.tabulate(16)(i => ((seed * 13 + i) % 100 + 1).toByte)
    val b = AudioHeaders.mp3Fixture(Seq(chunk(1), chunk(2), chunk(3)))
    val frames = AudioHeaders.scanMpegFrames(b)
    assert(frames.map(f => (f.idx, f.off, f.len)) ==
      Seq((0L, 0L, 288L), (1L, 288L, 288L), (2L, 576L, 288L)))
    assert(frames.forall(f => f.samples == 1152 && f.sampleRateHz == 48000))
    // truncated tail: the last frame's declared 288 bytes overrun the
    // buffer -> it is DROPPED, the complete frames still parse
    val truncated = AudioHeaders.scanMpegFrames(b.slice(0, 288 * 2 + 100))
    assert(truncated.map(_.idx) == Seq(0L, 1L))
    // a non-sync byte after a valid frame stops the walk cleanly
    val garbageTail = b.slice(0, 288) ++ "xx".getBytes
    assert(AudioHeaders.scanMpegFrames(garbageTail).size == 1)
    // free-bitrate (idx 0) and reserved-layer headers are refused
    val free = b.clone(); free(2) = 0x04.toByte // brIdx 0
    assert(AudioHeaders.scanMpegFrames(free).isEmpty)
    assert(AudioHeaders.scanMpegFrames("not audio".getBytes).isEmpty)
    // a Layer-I header uses the x4 slot-length arithmetic:
    // (12*bitrate/rate + pad)*4 at 448 kbps / 44.1 kHz = 484
    val l1 = Array(0xff, 0xff, 0xe0, 0x00).map(_.toByte) ++ new Array[Byte](480)
    val fl1 = AudioHeaders.scanMpegFrames(l1)
    assert(fl1.size == 1 && fl1.head.len == 484L - 480 + 480 &&
      fl1.head.samples == 384)
  }

  test("ADTS frame walk: 13-bit length field, truncated tail dropped") {
    import graft.operators.AudioHeaders
    def chunk(seed: Int) = Array.tabulate(16)(i => ((seed * 17 + i) % 100 + 1).toByte)
    val b = AudioHeaders.adtsFixture(Seq(chunk(1), chunk(2)))
    val frames = AudioHeaders.scanAdtsFrames(b)
    assert(frames.map(f => (f.idx, f.off, f.len)) ==
      Seq((0L, 0L, 23L), (1L, 23L, 23L)))
    assert(frames.forall(f => f.samples == 1024 && f.sampleRateHz == 48000))
    // truncated tail dropped
    assert(AudioHeaders.scanAdtsFrames(b.slice(0, 30)).map(_.idx) == Seq(0L))
    // a declared length < header size is malformed -> stop
    val badLen = b.clone(); badLen(4) = 0; badLen(5) = (3 << 5).toByte // flen 3
    assert(AudioHeaders.scanAdtsFrames(badLen).isEmpty)
    // MP3 bytes are not ADTS (layer bits != 00) and vice versa
    val mp3 = AudioHeaders.mp3Fixture(Seq(chunk(3)))
    assert(!AudioHeaders.looksLikeAdts(mp3) && AudioHeaders.looksLikeMpegAudio(mp3))
    assert(AudioHeaders.looksLikeAdts(b) && !AudioHeaders.looksLikeMpegAudio(b))
  }

  test("sampleAudioFrames: container dispatch + raw fallback (Spark plumbing)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    import graft.operators.{AudioHeaders, Multimodal}
    def chunk(seed: Int) = Array.tabulate(16)(i => ((seed * 19 + i) % 100 + 1).toByte)
    val media = Seq(
      (1L, AudioHeaders.mp3Fixture(Seq(chunk(1), chunk(2)))),
      (2L, AudioHeaders.adtsFixture(Seq(chunk(1), chunk(2), chunk(3)))),
      (3L, "0123456789abcdef0123456789abcdef".getBytes)
    ).toDF("doc_id", "media")
    val got = Multimodal.sampleAudioFrames(media, stride = 1)
      .collect().groupBy(_.doc_id)
    assert(got(1L).forall(_.container == "mp3") && got(1L).size == 2)
    assert(got(2L).forall(_.container == "adts") && got(2L).size == 3)
    assert(got(3L).forall(f => f.container == "raw" && f.n_bytes == 16L))
    // identical chunks at DIFFERENT codec framings hash differently
    // (frame bytes include the header), but the same chunk in the same
    // codec hashes identically across videos -- the dedup feed contract
    val mp3b = Seq((9L, AudioHeaders.mp3Fixture(Seq(chunk(1)))))
      .toDF("doc_id", "media")
    val h9 = Multimodal.sampleAudioFrames(mp3b, 1).collect().head.frame_hash
    assert(h9 == got(1L).minBy(_.frame_idx).frame_hash)
  }
}
