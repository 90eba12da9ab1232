package graft.operators

/** Pure-JVM media container-header parsing — dimensions straight from
  * the bytes, no image library needed (none ship in this build env).
  *
  * Formats covered (all public specs):
  *  - PNG: 8-byte signature then the IHDR chunk (width/height as
  *    big-endian u32 at offsets 16/20 — PNG spec §5.2, §11.2.2);
  *  - JPEG: marker walk from SOI to the first SOFn frame header
  *    (precision u8, height u16, width u16 — ISO/IEC 10918-1 §B.2.2);
  *  - GIF: "GIF87a"/"GIF89a" then the logical screen descriptor
  *    (width/height as LITTLE-endian u16 at offsets 6/8 — GIF89a §18).
  *
  * Replaces the round-1 `decodeStub` fake dimensions for real image
  * payloads; unknown formats still fall through to the stub (see
  * [[Multimodal]]). Full pixel decode remains out of scope — a real
  * decoder slots into the same `mapPartitions` seam.
  */
object ImageHeaders {

  final case class ImageMeta(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val Ihdr: Array[Byte] = "IHDR".getBytes("US-ASCII")
  private val Gif87 = "GIF87a".getBytes("US-ASCII")
  private val Gif89 = "GIF89a".getBytes("US-ASCII")

  /** Try all known container signatures; None = unknown format. */
  def decode(bytes: Array[Byte]): Option[ImageMeta] =
    decodePng(bytes).orElse(decodeJpeg(bytes)).orElse(decodeGif(bytes))

  def decodePng(b: Array[Byte]): Option[ImageMeta] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b.slice(12, 16).sameElements(Ihdr))
      Some(ImageMeta("png", u32be(b, 16).toInt, u32be(b, 20).toInt))
    else None

  /** Walk SOI → markers → first SOF0–SOF3 frame header. Gives up (None)
    * on malformed streams, scan-before-frame, or truncation — never
    * throws on arbitrary bytes. */
  def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      // JPEG permits any number of 0xFF fill bytes before a marker
      // (ISO/IEC 10918-1 §B.1.1.2) — skip to the last 0xFF so the next
      // byte is the marker code, not another fill byte. The skip
      // advances i, so the outer bounds guard must be re-checked: a
      // stream ending in fill bytes would otherwise reach the default
      // branch with too few bytes left for its u16be length read.
      while (i + 3 < b.length && u8(b, i + 1) == 0xff) i += 1
      if (i + 3 >= b.length) return None
      u8(b, i + 1) match {
        case 0xd8 | 0x01 => i += 2 // standalone: SOI again / TEM
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // RSTn
        case m if m >= 0xc0 && m <= 0xc3 => // SOF0..SOF3
          return if (i + 9 <= b.length)
            Some(ImageMeta("jpeg", u16be(b, i + 7), u16be(b, i + 5)))
          else None
        case 0xd9 | 0xda => return None // EOI / SOS before any frame header
        case _ =>
          val len = u16be(b, i + 2)
          if (len < 2) return None
          i += 2 + len
      }
    }
    None
  }

  def decodeGif(b: Array[Byte]): Option[ImageMeta] =
    if (b.length >= 10 &&
        (b.startsWith(Gif87) || b.startsWith(Gif89)))
      Some(ImageMeta("gif", u16le(b, 6), u16le(b, 8)))
    else None

  // ------------------------------------------------------------------ //
  // Deterministic fixtures: header-valid containers with an arbitrary
  // payload appended (CRC/entropy data is zeroed/absent — enough for
  // header parsing, which never validates checksums). Used by the q28
  // gate query and the specs; byte layout is mirrored arithmetically in
  // the DuckDB oracle, so keep it stable.

  /** 33-byte PNG header (sig + IHDR + zero CRC) + payload. w,h < 2^16
    * by gate construction but encoded full-width u32. */
  def pngFixture(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + payload.length)
    out.write(PngSig, 0, PngSig.length)
    out.write(Array[Byte](0, 0, 0, 13), 0, 4) // IHDR data length
    out.write(Ihdr, 0, 4)
    writeU32be(out, width)
    writeU32be(out, height)
    // bit depth 8, truecolor, deflate, no filter, no interlace
    out.write(Array[Byte](8, 2, 0, 0, 0), 0, 5)
    out.write(Array[Byte](0, 0, 0, 0), 0, 4) // CRC placeholder
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** 15-byte JPEG header (SOI + SOF0, 1 component) + payload. */
  def jpegFixture(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(15 + payload.length)
    out.write(Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08).map(_.toByte), 0, 7)
    writeU16be(out, height)
    writeU16be(out, width)
    out.write(Array[Byte](0x01, 0x01, 0x11, 0x00), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def writeU32be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeU16be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
}
