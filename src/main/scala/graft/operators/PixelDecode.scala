package graft.operators

/** Pure-JVM PIXEL decoding for the two formats it can be done without
  * an image library: BMP (uncompressed 24-bit — plain byte layout) and
  * PNG (8-bit truecolor — zlib via `java.util.zip.Inflater`, which
  * ships in the JDK, plus the five scanline filters of PNG spec §9).
  * This upgrades the multimodal path from header metadata
  * ([[ImageHeaders]]) to actual content for these formats; everything
  * else still falls through to the documented stub in [[Multimodal]].
  *
  * Decoders return None on anything malformed, truncated, or outside
  * the supported subset (PNG: bit depth 8, color type 2 RGB,
  * non-interlaced; BMP: 24 bpp, BI_RGB) — never throw on arbitrary
  * bytes, same contract as the header parsers.
  *
  * The fixture encoders on the bottom half produce REAL files (valid
  * CRCs, real deflate stream, per-row filter variety) so the decode
  * path is exercised end-to-end; an external viewer opens them.
  */
object PixelDecode {

  /** Row-major RGB triplets, (y*width + x)*3 indexing. */
  final case class PixelImage(
      format: String, width: Int, height: Int, rgb: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Try the pixel-decodable formats; None = not decodable here. */
  def decode(bytes: Array[Byte]): Option[PixelImage] =
    decodePng(bytes).orElse(decodeBmp(bytes))

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER or later, BI_RGB).
    * Handles bottom-up (positive height — the common case) and
    * top-down (negative height) row order; rows padded to 4 bytes.
    * Pixels are stored BGR; returned RGB. */
  def decodeBmp(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = i32le(b, 10)
    val dibSize = i32le(b, 14)
    val w = i32le(b, 18)
    val hRaw = i32le(b, 22)
    val bpp = u16le(b, 28)
    val comp = i32le(b, 30)
    if (dibSize < 40 || bpp != 24 || comp != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    val rowBytes = (w * 3 + 3) & ~3
    if (off < 54 || off.toLong + rowBytes.toLong * h > b.length) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = off + srcRow * rowBytes
      val dst = y * w * 3
      var x = 0
      while (x < w) {
        rgb(dst + x * 3) = b(src + x * 3 + 2)     // R  (stored B,G,R)
        rgb(dst + x * 3 + 1) = b(src + x * 3 + 1) // G
        rgb(dst + x * 3 + 2) = b(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(PixelImage("bmp", w, h, rgb))
  }

  /** PNG spec §9 Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** 8-bit truecolor (color type 2) non-interlaced PNG: chunk walk
    * collecting IDAT, one `Inflater` pass, then the five per-row
    * filters reversed in place. CRCs are not validated (decode is
    * content recovery, not integrity audit — same stance as the
    * header parsers). */
  def decodePng(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 45 || !b.startsWith(PngSig)) return None
    var i = 8
    var w = 0; var h = 0; var bitDepth = -1; var colorType = -1
    var interlace = -1
    var sawIhdr = false; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 12 <= b.length && !sawEnd) {
      val len = u32be(b, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return None
      val l = len.toInt
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (l != 13 || sawIhdr) return None
          sawIhdr = true
          w = u32be(b, i + 8).toInt
          h = u32be(b, i + 12).toInt
          bitDepth = u8(b, i + 16); colorType = u8(b, i + 17)
          interlace = u8(b, i + 20)
        case "IDAT" => idat.write(b, i + 8, l)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + l
    }
    if (!sawIhdr || !sawEnd || w <= 0 || h <= 0 ||
        w > (1 << 15) || h > (1 << 15) ||
        bitDepth != 8 || colorType != 2 || interlace != 0) return None
    val stride = w * 3
    // Never-throw on adversarial bytes: the declared dimensions alone can
    // demand up to (3*32768+1)*32768 ≈ 3.2 GB (Int-overflowing), so size
    // the raw buffer in Long and bound it by what the collected IDAT bytes
    // could plausibly inflate to (deflate expands at most ~1032x).
    val rawLen = (stride + 1).toLong * h
    if (rawLen > Int.MaxValue.toLong ||
        rawLen > idat.size.toLong * 1032L + 64L) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val rgb = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = u8(raw, y * (stride + 1))
      if (f > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var k = 0
      while (k < stride) {
        val rv = u8(raw, src + k)
        val left = if (k >= 3) u8(rgb, dst + k - 3) else 0
        val up = if (y > 0) u8(rgb, dst - stride + k) else 0
        val ul = if (y > 0 && k >= 3) u8(rgb, dst - stride + k - 3) else 0
        val v = f match {
          case 0 => rv
          case 1 => rv + left
          case 2 => rv + up
          case 3 => rv + ((left + up) >> 1)
          case 4 => rv + paeth(left, up, ul)
        }
        rgb(dst + k) = (v & 0xff).toByte
        k += 1
      }
      y += 1
    }
    Some(PixelImage("png", w, h, rgb))
  }

  // ------------------------------------------------------------------ //
  // Real-file fixture encoders (inverse of the decoders above).

  /** Standard 54-byte-header 24-bit bottom-up BMP of row-major RGB. */
  def bmpFixture(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    val rowBytes = (width * 3 + 3) & ~3
    val dataLen = rowBytes * height
    val out = new Array[Byte](54 + dataLen)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      w16(i, v & 0xffff); w16(i + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54 + dataLen); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataLen)
    var y = 0
    while (y < height) {
      val dst = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val src = (y * width + x) * 3
        out(dst + x * 3) = rgb(src + 2)     // B
        out(dst + x * 3 + 1) = rgb(src + 1) // G
        out(dst + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real 8-bit RGB PNG (valid CRCs, real deflate): row `y` uses
    * filter `y % 5`, so one multi-row image exercises None, Sub, Up,
    * Average AND Paeth on decode. */
  def pngPixelFixture(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var k = 0
      while (k < stride) {
        val cur = u8(rgb, y * stride + k)
        val left = if (k >= 3) u8(rgb, y * stride + k - 3) else 0
        val up = if (y > 0) u8(rgb, (y - 1) * stride + k) else 0
        val ul = if (y > 0 && k >= 3) u8(rgb, (y - 1) * stride + k - 3) else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + k) = (enc & 0xff).toByte
        k += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream(64 + zBuf.size())
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = (3 to 0 by -1).foreach(s =>
        out.write(((v >>> (8 * s)) & 0xff).toInt))
      w32(data.length.toLong)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def be32(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = ((v >>> 24) & 0xff).toByte; a(i + 1) = ((v >>> 16) & 0xff).toByte
      a(i + 2) = ((v >>> 8) & 0xff).toByte; a(i + 3) = (v & 0xff).toByte
    }
    be32(ihdr, 0, width); be32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", zBuf.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}
