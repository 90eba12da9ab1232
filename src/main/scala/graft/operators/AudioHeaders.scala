package graft.operators

/** Pure-JVM audio container-header parsing — the audio leg of the
  * multimodal triad (images: [[ImageHeaders]], video frames:
  * [[Multimodal.sampleFrames]]). No audio library ships in this build
  * environment; the RIFF/WAVE header layout is a public spec and ~30
  * lines of byte reading.
  *
  * WAV (RIFF): "RIFF" <size> "WAVE", then chunks; the "fmt " chunk
  * carries audioFormat(u16le) channels(u16le) sampleRate(u32le)
  * byteRate(u32le) blockAlign(u16le) bitsPerSample(u16le); the "data"
  * chunk length gives the sample count. Multi-chunk files (LIST, fact,
  * …) are walked chunk-by-chunk like the JPEG marker walk.
  */
object AudioHeaders {

  final case class AudioMeta(
      format: String,
      channels: Int,
      sampleRateHz: Int,
      bitsPerSample: Int,
      nFrames: Long) { // sample frames = data bytes / block align
    def durationMs: Long =
      if (sampleRateHz <= 0) 0L else nFrames * 1000L / sampleRateHz
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Walk RIFF chunks to the fmt + data pair; None on anything
    * malformed or truncated — never throws on arbitrary bytes. */
  def decodeWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var channels = -1
    var rate = -1L
    var bits = -1
    var blockAlign = -1
    var dataLen = -1L
    var i = 12
    while (i + 8 <= b.length && (dataLen < 0 || channels < 0)) {
      val id = tag(b, i)
      val len = u32le(b, i + 4)
      // len >= 16: a malformed fmt chunk declaring fewer bytes would
      // otherwise read into the following chunk and return garbage
      if (id == "fmt " && len >= 16 && i + 8 + 16 <= b.length) {
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12)
        blockAlign = u16le(b, i + 20)
        bits = u16le(b, i + 22)
      } else if (id == "data") {
        dataLen = math.min(len, (b.length - i - 8).toLong)
      }
      // advance AFTER validating the length: a near-Int.MaxValue len
      // would wrap `i` negative and index out of bounds on the next
      // iteration. A len beyond the buffer ends the walk (the chunk we
      // just handled — possibly a truncated trailing data chunk — was
      // already recorded above).
      if (len > b.length) i = b.length
      else i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 ||
        blockAlign <= 0 || dataLen < 0)
      None
    else
      Some(AudioMeta("wav", channels, rate.toInt, bits, dataLen / blockAlign))
  }

  /** One codec-true audio frame: byte range from the frame header's
    * own length arithmetic (the MJPEG marker-walk discipline, audio
    * form), plus the decode units the header declares. */
  final case class AudioFrame(idx: Long, off: Long, len: Long,
      samples: Int, sampleRateHz: Int)

  // MPEG audio frame headers (ISO/IEC 11172-3 / 13818-3): public
  // bitrate/samplerate tables, indexed [version][layer][idx]
  private val BitrateV1 = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))     // L3
  private val BitrateV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),    // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),         // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))         // L3
  private val SampleRateByVersion = Map( // version-ID bits -> rates
    3 -> Array(44100, 48000, 32000), // V1
    2 -> Array(22050, 24000, 16000), // V2
    0 -> Array(11025, 12000, 8000))  // V2.5

  /** Parse one MPEG audio frame header at `i`; None when the 4 bytes
    * are not a valid (sync'd, non-reserved, non-free) header. Returns
    * (frameLen, samplesPerFrame, sampleRateHz). */
  private def mpegHeaderAt(b: Array[Byte], i: Int): Option[(Int, Int, Int)] = {
    if (i + 4 > b.length) return None
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None
    val version = (b(i + 1) >> 3) & 0x3 // 3=V1 2=V2 0=V2.5 1=reserved
    val layerBits = (b(i + 1) >> 1) & 0x3 // 3=L1 2=L2 1=L3 0=reserved
    if (version == 1 || layerBits == 0) return None
    val layer = 4 - layerBits // 1..3
    val brIdx = (b(i + 2) >> 4) & 0xf
    val srIdx = (b(i + 2) >> 2) & 0x3
    val padding = (b(i + 2) >> 1) & 0x1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val bitrate = (if (version == 3) BitrateV1 else BitrateV2)(layer - 1)(brIdx) * 1000
    val rate = SampleRateByVersion(version)(srIdx)
    val (flen, samples) = layer match {
      case 1 => ((12 * bitrate / rate + padding) * 4, 384)
      case 2 => (144 * bitrate / rate + padding, 1152)
      case _ =>
        if (version == 3) (144 * bitrate / rate + padding, 1152)
        else (72 * bitrate / rate + padding, 576) // V2/V2.5 Layer III
    }
    Some((flen, samples, rate))
  }

  /** Walk consecutive MPEG audio (MP3) frames from offset 0: 11-bit
    * syncword, header-derived frame lengths — codec-true frame units
    * for the frame-hash dedup pipeline ([[graft.operators.Multimodal
    * .audioFramePHashes]]), the audio analog of the MJPEG marker walk.
    * Stops at the first invalid header (garbage tail) and DROPS a
    * truncated final frame (its declared length overruns the buffer) —
    * the decoder contract, spec-pinned. */
  def scanMpegFrames(b: Array[Byte]): Seq[AudioFrame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrame]
    var i = 0
    var idx = 0L
    var ok = true
    while (ok && i + 4 <= b.length) {
      mpegHeaderAt(b, i) match {
        case Some((flen, samples, rate)) if flen >= 4 && i + flen <= b.length =>
          out += AudioFrame(idx, i.toLong, flen.toLong, samples, rate)
          idx += 1
          i += flen
        case _ => ok = false
      }
    }
    out.toSeq
  }

  private val AdtsSampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Walk consecutive ADTS (AAC) frames from offset 0: 12-bit syncword
    * with layer bits 00, 13-bit frame length spanning header bytes
    * 3–5, 1024 samples per raw data block (ISO/IEC 14496-3 §1.A.3).
    * Same truncated-tail contract as [[scanMpegFrames]]. */
  def scanAdtsFrames(b: Array[Byte]): Seq[AudioFrame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrame]
    var i = 0
    var idx = 0L
    var ok = true
    while (ok && i + 7 <= b.length) {
      val sync = (b(i) & 0xff) == 0xff && (b(i + 1) & 0xf6) == 0xf0
      if (!sync) ok = false
      else {
        val srIdx = (b(i + 2) >> 2) & 0xf
        val flen = ((b(i + 3) & 0x03) << 11) |
          ((b(i + 4) & 0xff) << 3) | ((b(i + 5) & 0xff) >> 5)
        val rdb = b(i + 6) & 0x03 // raw data blocks − 1
        if (srIdx >= AdtsSampleRates.length || flen < 7 || i + flen > b.length)
          ok = false
        else {
          out += AudioFrame(idx, i.toLong, flen.toLong,
            1024 * (rdb + 1), AdtsSampleRates(srIdx))
          idx += 1
          i += flen
        }
      }
    }
    out.toSeq
  }

  def looksLikeMpegAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0 &&
      ((b(1) >> 1) & 0x3) != 0 // layer != reserved -> MP3, not ADTS

  def looksLikeAdts(b: Array[Byte]): Boolean =
    b.length >= 7 && (b(0) & 0xff) == 0xff && (b(1) & 0xf6) == 0xf0

  /** Deterministic MP3 fixture: one V1 Layer-III frame per 16-byte
    * payload chunk at 96 kbps / 48 kHz — a configuration whose frame
    * length is EXACTLY 288 bytes (144·96000/48000, no padding), so an
    * external engine reproduces every offset and byte arithmetically:
    * frame = [FF FB 74 00] ++ chunk ++ 268 zero bytes. */
  def mp3Fixture(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(chunks.size * 288)
    chunks.foreach { c =>
      require(c.length == 16, "16-byte chunks")
      out.write(Array(0xff, 0xfb, 0x74, 0x00).map(_.toByte))
      out.write(c)
      out.write(new Array[Byte](268), 0, 268)
    }
    out.toByteArray
  }

  /** Deterministic ADTS fixture: one AAC-LC frame per 16-byte payload
    * chunk at 48 kHz stereo — header declares frame length 23 (7-byte
    * header + 16-byte payload, no padding needed), so every offset is
    * 23·idx. Header bytes: FF F1 (sync, MPEG-4, layer 00, no CRC),
    * 4C (profile AAC-LC=01, srIdx=3, channel cfg hi bit 0),
    * 80 (channel cfg 2), length bits spread over bytes 3–5, FC. */
  def adtsFixture(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val flen = 23
    val out = new java.io.ByteArrayOutputStream(chunks.size * flen)
    chunks.foreach { c =>
      require(c.length == 16, "16-byte chunks")
      val h = new Array[Byte](7)
      h(0) = 0xff.toByte
      h(1) = 0xf1.toByte
      h(2) = ((1 << 6) | (3 << 2) | 0).toByte // profile LC, srIdx 3
      h(3) = ((2 << 6) | ((flen >> 11) & 0x03)).toByte // ch cfg 2
      h(4) = ((flen >> 3) & 0xff).toByte
      h(5) = (((flen & 0x07) << 5) | 0x1f).toByte
      h(6) = 0xfc.toByte // buffer fullness lo + rdb=0
      out.write(h)
      out.write(c)
    }
    out.toByteArray
  }

  /** Deterministic header-valid WAV fixture (PCM, silence payload):
    * enough for header parsing; the byte layout is pure arithmetic so
    * an external engine can mirror it. */
  def wavFixture(channels: Int, sampleRateHz: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nFrames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRateHz.toLong)
    w32(sampleRateHz.toLong * blockAlign); w16(blockAlign); w16(bitsPerSample)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    out.write(new Array[Byte](dataLen), 0, dataLen)
    out.toByteArray
  }
}
