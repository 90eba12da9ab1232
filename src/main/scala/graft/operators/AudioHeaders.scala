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
