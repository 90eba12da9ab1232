package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM video container parsing — codec-true frame boundaries
  * straight from the bytes, no media library needed (none ship in this
  * build env). Replaces the fixed-size-slice stub tier of
  * [[Multimodal.sampleFrames]] for payloads that ARE real containers;
  * everything here is public-spec byte layout:
  *
  *  - '''MJPEG''' (concatenated JPEG frames, the motion-JPEG stream
  *    form): a structural marker walk per frame — SOI, marker segments
  *    by their u16 lengths, SOS, then entropy-coded data, where 0xFF
  *    is either a stuffed literal (0xFF00), a restart marker
  *    (0xFFD0–D7), or fill before the next true marker
  *    (ISO/IEC 10918-1 §B.1.1.2, §B.1.1.5, §F.1.2.3) — to EOI. A naive
  *    SOI/EOI grep breaks on none of these in well-formed baseline
  *    streams, but the walk also recovers each frame's SOF dimensions
  *    and rejects malformed tails instead of emitting garbage frames.
  *  - '''MP4''' (ISO/IEC 14496-12): the box tree down to the sample
  *    table — `moov/trak/mdia/minf/stbl`, with `stsz` (sample sizes),
  *    `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets) and
  *    `stts` (decode deltas) — expanded to per-sample (frame) byte
  *    offset + size + decode time, exactly the lookup a demuxer does.
  *    No codec payload is interpreted; the frame units and timestamps
  *    are the container's own truth.
  *
  * Decoding the frames' pixels stays out of scope (the honest-stub
  * boundary [[Multimodal]] documents); what is no longer a stub is the
  * frame UNIT: offsets, sizes and times come from real container
  * structure, so a swap-in pixel codec receives exactly the byte
  * ranges a real demuxer would hand it.
  */
object VideoContainers {

  /** One frame (MP4: sample) of a container: byte range + decode time
    * in the container's ticks (MJPEG has no embedded timing — ticks =
    * frame index) + SOF dimensions where the container carries them
    * (MJPEG per-frame SOF; MP4 tkhd track dims; 0 when absent). */
  final case class Frame(idx: Long, off: Long, len: Long,
      timeTicks: Long, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)

  /** bytes[4..8) == "ftyp" — the ISO-BMFF brand box leads the file. */
  def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Leading SOI — a JPEG frame starts here, so an MJPEG stream does. */
  def looksLikeMjpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  // ------------------------------------------------------------------ //
  //  MJPEG                                                              //
  // ------------------------------------------------------------------ //

  /** Structural frame scan of a concatenated-JPEG stream. Returns the
    * complete frames parsed from the head of the stream; scanning
    * stops (dropping the malformed/truncated remainder — the same
    * truncated-tail contract as the fixed-size stub) at the first
    * byte position that is neither a new SOI nor end-of-stream, or
    * inside a frame that cannot be completed. Never throws on
    * arbitrary bytes. */
  def scanMjpeg(bytes: Array[Byte]): Seq[Frame] = {
    val out = ArrayBuffer.empty[Frame]
    var p = 0
    var ok = true
    while (ok && p + 3 < bytes.length &&
        u8(bytes, p) == 0xff && u8(bytes, p + 1) == 0xd8) {
      scanOneJpeg(bytes, p) match {
        case Some((end, w, h)) =>
          out += Frame(out.length.toLong, p.toLong, (end - p).toLong,
            out.length.toLong, w, h)
          p = end
        case None => ok = false
      }
    }
    out.toSeq
  }

  /** One frame from SOI at `start` to just past its EOI: segment walk
    * (u16 lengths), SOF capture, then per-scan entropy traversal.
    * None on any structural violation. */
  private def scanOneJpeg(bytes: Array[Byte], start: Int): Option[(Int, Int, Int)] = {
    var i = start + 2 // past SOI
    var w = 0
    var h = 0
    while (i + 1 < bytes.length) {
      if (u8(bytes, i) != 0xff) return None
      // fill bytes before a marker (§B.1.1.2)
      while (i + 1 < bytes.length && u8(bytes, i + 1) == 0xff) i += 1
      if (i + 1 >= bytes.length) return None
      val m = u8(bytes, i + 1)
      m match {
        case 0xd9 => return Some((i + 2, w, h)) // EOI — frame complete
        case 0x01 => i += 2 // TEM, standalone
        case r if r >= 0xd0 && r <= 0xd7 => i += 2 // stray RSTn
        case 0xda => // SOS: header, then entropy-coded data
          if (i + 3 >= bytes.length) return None
          val len = u16be(bytes, i + 2)
          if (len < 2 || i + 2 + len > bytes.length) return None
          i += 2 + len
          // entropy data: 0xFF00 = stuffed literal, 0xFFD0-D7 = RST,
          // 0xFF followed by 0xFF = fill; any other 0xFFxx ends the
          // scan and is handled by the outer segment loop (§F.1.2.3)
          var inScan = true
          while (inScan) {
            if (i >= bytes.length) return None
            if (u8(bytes, i) != 0xff) i += 1
            else if (i + 1 >= bytes.length) return None
            else u8(bytes, i + 1) match {
              case 0x00 => i += 2 // stuffed 0xFF literal
              case r if r >= 0xd0 && r <= 0xd7 => i += 2 // restart marker
              case 0xff => i += 1 // fill byte
              case _ => inScan = false // true marker: back to segments
            }
          }
        case sof if sof >= 0xc0 && sof <= 0xc3 => // SOF0..SOF3
          if (i + 8 >= bytes.length) return None
          val len = u16be(bytes, i + 2)
          if (len < 2 || i + 2 + len > bytes.length) return None
          h = u16be(bytes, i + 5)
          w = u16be(bytes, i + 7)
          i += 2 + len
        case _ => // any other marker segment with a u16 length
          if (i + 3 >= bytes.length) return None
          val len = u16be(bytes, i + 2)
          if (len < 2 || i + 2 + len > bytes.length) return None
          i += 2 + len
      }
    }
    None // ran out of bytes before EOI
  }

  /** Deterministic MJPEG fixture: each 16-byte payload chunk becomes
    * one complete baseline frame — SOI, SOF0 (1 component, given
    * width, height 8), minimal SOS, then entropy data that exercises
    * the scanner's §F.1.2.3 cases for real: a stuffed 0xFF00, 8
    * payload bytes, an RST0 marker, the remaining 8 bytes — and EOI.
    * 47 bytes per frame; byte layout is mirrored arithmetically in the
    * q89 DuckDB oracle, so keep it stable. Payload chunks must be
    * 0xFF-free (UTF-8 text is, by construction of the encoding). */
  def mjpegFixture(width: Int, chunks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(chunks.size * 47)
    chunks.foreach { c =>
      require(c.length == 16, "16-byte chunks")
      out.write(Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08).map(_.toByte), 0, 7)
      out.write(0x00); out.write(0x08) // height 8
      out.write((width >>> 8) & 0xff); out.write(width & 0xff)
      out.write(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte), 0, 4)
      out.write(Array(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00)
        .map(_.toByte), 0, 10)
      out.write(0xff); out.write(0x00) // stuffed literal
      out.write(c, 0, 8)
      out.write(0xff); out.write(0xd0) // RST0 inside entropy data
      out.write(c, 8, 8)
      out.write(0xff); out.write(0xd9)
    }
    out.toByteArray
  }

  /** Deterministic single-track MP4 fixture in the streaming layout
    * (moov before mdat): uniform 16-byte samples in ONE chunk, v0 full
    * boxes, one stsc run and one stts run (constant `delta` ticks per
    * sample). Because `stsz` is uniform and every table has exactly
    * one entry, the moov box size is INDEPENDENT of the sample count —
    * so the mdat data offset is the constant [[mp4FixtureDataOff]] and
    * the q90 DuckDB oracle can reproduce every frame's byte range and
    * decode time arithmetically. (The hand-built multi-chunk /
    * multi-run / co64 / v1 layouts live in VideoContainersSpec — this
    * fixture is the gate-query shape, the spec is the adversarial
    * one.) */
  def mp4Fixture(width: Int, height: Int, timescale: Long, delta: Long,
      samples: Seq[Array[Byte]]): Array[Byte] = {
    require(samples.forall(_.length == 16), "uniform 16-byte samples")
    def be32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    def fullBox(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](0, 0, 0, 0) ++ payload)
    val n = samples.size.toLong
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    def moov(chunkOff: Long): Array[Byte] = {
      val tkhd = fullBox("tkhd",
        new Array[Byte](72) ++ be32(width.toLong << 16) ++ be32(height.toLong << 16))
      val mdhd = fullBox("mdhd",
        be32(0) ++ be32(0) ++ be32(timescale) ++ be32(0) ++ Array[Byte](0, 0, 0, 0))
      val hdlr = fullBox("hdlr", be32(0) ++ "vide".getBytes ++ new Array[Byte](12))
      val stsz = fullBox("stsz", be32(16) ++ be32(n))
      val stsc = fullBox("stsc", be32(1) ++ be32(1) ++ be32(math.max(n, 1)) ++ be32(1))
      val stco = fullBox("stco", be32(1) ++ be32(chunkOff))
      val stts = fullBox("stts", be32(1) ++ be32(n) ++ be32(delta))
      box("moov", box("trak", tkhd ++ box("mdia",
        mdhd ++ hdlr ++ box("minf", box("stbl", stsz ++ stsc ++ stco ++ stts)))))
    }
    val dataOff = ftyp.length + moov(0).length + 8 // fixed-width fields
    ftyp ++ moov(dataOff) ++ box("mdat", samples.flatten.toArray)
  }

  /** The constant mdat data offset of [[mp4Fixture]] files — encoder-
    * side arithmetic (moov size does not depend on the sample count),
    * mirrored as a literal into the q90 oracle. */
  val mp4FixtureDataOff: Long = {
    val one = mp4Fixture(1, 8, 90000L, 3600L, Seq(new Array[Byte](16)))
    (one.length - 16).toLong
  }

  // ------------------------------------------------------------------ //
  //  MP4 (ISO-BMFF)                                                     //
  // ------------------------------------------------------------------ //

  /** A parsed track: media timescale (ticks/second) + per-sample
    * frames with container-true offsets, sizes and decode times. */
  final case class Mp4Track(timescale: Long, frames: Seq[Frame])

  private final case class Box(typ: String, payloadOff: Int, payloadEnd: Int)

  /** Children of the byte range [from, until): each box is
    * [u32 size]["4cc"] (+ u64 largesize when size==1; size==0 extends
    * to the end of the range). Malformed sizes end the walk. */
  private def boxes(b: Array[Byte], from: Int, until: Int): Seq[Box] = {
    val out = ArrayBuffer.empty[Box]
    var p = from
    var ok = true
    while (ok && p + 8 <= until) {
      val size32 = u32be(b, p)
      val typ = new String(b, p + 4, 4, "US-ASCII")
      val (payloadOff, size) =
        if (size32 == 1L && p + 16 <= until) (p + 16, u64be(b, p + 8))
        else if (size32 == 0L) (p + 8, (until - p).toLong)
        else (p + 8, size32)
      val end = p.toLong + size
      if (size < 8 || end > until) ok = false
      else {
        out += Box(typ, payloadOff, end.toInt)
        p = end.toInt
      }
    }
    out.toSeq
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.payloadOff, parent.payloadEnd).find(_.typ == typ)

  /** Parse the first video (`hdlr` = "vide", else first complete)
    * track's sample table. None when the file has no usable
    * `moov/trak/mdia/minf/stbl` chain. Offsets are absolute file
    * offsets as `stco`/`co64` declare them; samples whose byte range
    * falls outside the file are dropped (truncated-download
    * contract). */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Track] = {
    if (!looksLikeMp4(bytes)) return None
    val top = boxes(bytes, 0, bytes.length)
    val moov = top.find(_.typ == "moov").getOrElse(return None)
    val traks = boxes(bytes, moov.payloadOff, moov.payloadEnd).filter(_.typ == "trak")
    val parsed = traks.flatMap(t => parseTrak(bytes, t))
    parsed.find(_._1).orElse(parsed.headOption).map(_._2)
  }

  /** (isVideoHandler, track) for one trak box, None if incomplete. */
  private def parseTrak(b: Array[Byte], trak: Box): Option[(Boolean, Mp4Track)] = {
    val mdia = child(b, trak, "mdia").getOrElse(return None)
    val isVide = child(b, mdia, "hdlr").exists { h =>
      h.payloadOff + 12 <= h.payloadEnd &&
        new String(b, h.payloadOff + 8, 4, "US-ASCII") == "vide"
    }
    // tkhd width/height: fixed-point 16.16 at the end of the box
    // (v0: payload offset 76; v1: 88)
    val (w, h) = child(b, trak, "tkhd").flatMap { t =>
      val base = t.payloadOff + (if (u8(b, t.payloadOff) == 1) 88 else 76)
      if (base + 8 <= t.payloadEnd)
        Some(((u32be(b, base) >> 16).toInt, (u32be(b, base + 4) >> 16).toInt))
      else None
    }.getOrElse((0, 0))
    val timescale = child(b, mdia, "mdhd").flatMap { m =>
      val off = t0(b, m, ifV0 = 12, ifV1 = 20)
      if (off + 4 <= m.payloadEnd) Some(u32be(b, off)) else None
    }.getOrElse(return None)
    val stbl = child(b, mdia, "minf").flatMap(child(b, _, "stbl")).getOrElse(return None)

    // stsz: uniform size or per-sample table
    val stsz = child(b, stbl, "stsz").getOrElse(return None)
    val szBase = stsz.payloadOff + 4 // FullBox version+flags
    if (szBase + 8 > stsz.payloadEnd) return None
    val uniform = u32be(b, szBase)
    val nSamples = u32be(b, szBase + 4).toInt
    if (nSamples < 0) return None
    val sizes: Int => Long =
      if (uniform != 0L) _ => uniform
      else {
        if (szBase + 8 + 4L * nSamples > stsz.payloadEnd) return None
        i => u32be(b, szBase + 8 + 4 * i)
      }

    // stco / co64 chunk offsets
    val (coBox, coWidth) = child(b, stbl, "stco").map((_, 4))
      .orElse(child(b, stbl, "co64").map((_, 8))).getOrElse(return None)
    val coBase = coBox.payloadOff + 4
    if (coBase + 4 > coBox.payloadEnd) return None
    val nChunks = u32be(b, coBase).toInt
    if (nChunks < 0 || coBase + 4 + coWidth.toLong * nChunks > coBox.payloadEnd)
      return None
    val chunkOff: Int => Long =
      if (coWidth == 4) i => u32be(b, coBase + 4 + 4 * i)
      else i => u64be(b, coBase + 4 + 8 * i)

    // stsc runs: (first_chunk, samples_per_chunk, sdi)
    val stsc = child(b, stbl, "stsc").getOrElse(return None)
    val scBase = stsc.payloadOff + 4
    if (scBase + 4 > stsc.payloadEnd) return None
    val nRuns = u32be(b, scBase).toInt
    if (nRuns <= 0 || scBase + 4 + 12L * nRuns > stsc.payloadEnd) return None
    val runs = (0 until nRuns).map(i =>
      (u32be(b, scBase + 4 + 12 * i), u32be(b, scBase + 8 + 12 * i)))

    // stts deltas → cumulative decode times
    val stts = child(b, stbl, "stts").getOrElse(return None)
    val stBase = stts.payloadOff + 4
    if (stBase + 4 > stts.payloadEnd) return None
    val nTts = u32be(b, stBase).toInt
    if (nTts < 0 || stBase + 4 + 8L * nTts > stts.payloadEnd) return None
    val times = new Array[Long](nSamples)
    var t = 0L; var si = 0; var e = 0
    while (e < nTts && si < nSamples) {
      val cnt = u32be(b, stBase + 4 + 8 * e)
      val delta = u32be(b, stBase + 8 + 8 * e)
      var c = 0L
      while (c < cnt && si < nSamples) {
        times(si) = t; t += delta; si += 1; c += 1
      }
      e += 1
    }
    while (si < nSamples) { times(si) = t; si += 1 } // short stts: hold last time

    // expand sample→chunk and accumulate in-chunk offsets
    val frames = ArrayBuffer.empty[Frame]
    var sample = 0
    var chunk = 1 // 1-based per spec
    while (sample < nSamples && chunk <= nChunks) {
      // samples/chunk = the last run whose first_chunk <= this chunk
      val spc = runs.takeWhile(_._1 <= chunk).lastOption.map(_._2)
        .getOrElse(runs.head._2)
      var off = chunkOff(chunk - 1)
      var k = 0L
      while (k < spc && sample < nSamples) {
        val len = sizes(sample)
        if (off >= 0 && len > 0 && off + len <= b.length)
          frames += Frame(sample.toLong, off, len, times(sample), w, h)
        off += len; sample += 1; k += 1
      }
      chunk += 1
    }
    Some((isVide, Mp4Track(timescale, frames.toSeq)))
  }

  /** FullBox field offset by version byte. */
  private def t0(b: Array[Byte], box: Box, ifV0: Int, ifV1: Int): Int =
    box.payloadOff + (if (u8(b, box.payloadOff) == 1) ifV1 else ifV0)
}
