package graft

import graft.operators.PixelDecode
import org.scalatest.funsuite.AnyFunSuite

/** Pixel decoders must exactly invert the fixture encoders (which emit
  * real files: valid CRCs, real deflate, all five PNG filters), and
  * return None — never throw — on malformed bytes. */
class PixelDecodeSpec extends AnyFunSuite {

  private def testRgb(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
  }

  test("BMP round-trip: odd width (row padding), BGR order, bottom-up") {
    val rgb = testRgb(5, 4, 1)
    val img = PixelDecode.decodeBmp(PixelDecode.bmpFixture(5, 4, rgb)).get
    assert(img.format == "bmp" && img.width == 5 && img.height == 4)
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  test("PNG round-trip: rows exercise None/Sub/Up/Average/Paeth filters") {
    val rgb = testRgb(3, 7, 2) // 7 rows → every filter type at least once
    val bytes = PixelDecode.pngPixelFixture(3, 7, rgb)
    val img = PixelDecode.decodePng(bytes).get
    assert(img.format == "png" && img.width == 3 && img.height == 7)
    assert(img.rgb.toSeq == rgb.toSeq)
    // the fixture is also a header-valid PNG for the metadata tier
    val meta = graft.operators.ImageHeaders.decodePng(bytes).get
    assert(meta.width == 3 && meta.height == 7)
  }

  test("PNG 1x1 and single-row edge shapes round-trip") {
    for ((w, h, s) <- Seq((1, 1, 3), (8, 1, 4), (1, 6, 5))) {
      val rgb = testRgb(w, h, s)
      val img = PixelDecode.decodePng(PixelDecode.pngPixelFixture(w, h, rgb)).get
      assert(img.rgb.toSeq == rgb.toSeq, s"${w}x$h")
    }
  }

  test("decode dispatch picks the right format") {
    val rgb = testRgb(2, 2, 6)
    assert(PixelDecode.decode(PixelDecode.bmpFixture(2, 2, rgb)).get.format == "bmp")
    assert(PixelDecode.decode(PixelDecode.pngPixelFixture(2, 2, rgb)).get.format == "png")
    assert(PixelDecode.decode("not an image".getBytes).isEmpty)
    assert(PixelDecode.decode(Array.empty[Byte]).isEmpty)
  }

  test("fuzz: random and mutated-valid bytes never throw") {
    val rnd = new scala.util.Random(11)
    // pure random garbage at several sizes
    for (_ <- 1 to 200; len <- Seq(0, 1, 8, 54, 200)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      PixelDecode.decode(b) // must not throw; result irrelevant
    }
    // random single-byte mutations of VALID files — the nastier corpus
    val rgb = testRgb(6, 5, 12)
    val valid = Seq(PixelDecode.bmpFixture(6, 5, rgb),
      PixelDecode.pngPixelFixture(6, 5, rgb))
    for (v <- valid; _ <- 1 to 300) {
      val m = v.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      PixelDecode.decode(m)
      // truncations too
      PixelDecode.decode(m.take(rnd.nextInt(m.length)))
    }
  }

  test("malformed inputs return None, never throw") {
    val rgb = testRgb(4, 3, 7)
    val png = PixelDecode.pngPixelFixture(4, 3, rgb)
    // truncated IDAT (cut mid-file)
    assert(PixelDecode.decodePng(png.take(png.length - 20)).isEmpty)
    // corrupt the deflate stream body
    val corrupt = png.clone()
    corrupt(45) = (corrupt(45) ^ 0x55).toByte
    assert(PixelDecode.decodePng(corrupt).toSeq.forall(_.rgb.length == 36))
    // header-only fixture from ImageHeaders (zero CRC, no IDAT/IEND)
    assert(PixelDecode.decodePng(
      graft.operators.ImageHeaders.pngFixture(3, 3, Array.empty)).isEmpty)
    // BMP with unsupported bpp
    val bmp = PixelDecode.bmpFixture(4, 3, rgb).clone()
    bmp(28) = 16
    assert(PixelDecode.decodeBmp(bmp).isEmpty)
    // BMP truncated below its declared pixel data
    assert(PixelDecode.decodeBmp(PixelDecode.bmpFixture(4, 3, rgb).take(50)).isEmpty)
  }

  test("adversarial PNG dimensions: tiny file, huge claimed size → None") {
    def claimDims(w: Int, h: Int): Array[Byte] = {
      // valid 1x1 fixture, IHDR width/height patched (CRCs unchecked
      // by contract, so the claim reaches the allocation guard)
      val png = PixelDecode.pngPixelFixture(1, 1, Array[Byte](1, 2, 3)).clone()
      def be32(i: Int, v: Int): Unit = {
        png(i) = ((v >>> 24) & 0xff).toByte; png(i + 1) = ((v >>> 16) & 0xff).toByte
        png(i + 2) = ((v >>> 8) & 0xff).toByte; png(i + 3) = (v & 0xff).toByte
      }
      be32(16, w); be32(20, h) // IHDR data starts at offset 16
      png
    }
    // (3*32768+1)*32768 overflows Int — must not NegativeArraySizeException
    assert(PixelDecode.decodePng(claimDims(32768, 32768)).isEmpty)
    // no overflow, but ~1 GB claimed from a ~60-byte file — the IDAT
    // inflation bound (deflate ≤ ~1032x) rejects before allocating
    assert(PixelDecode.decodePng(claimDims(32768, 10000)).isEmpty)
    assert(PixelDecode.decodePng(claimDims(100, 32768)).isEmpty)
    // a consistent claim still decodes
    assert(PixelDecode.decodePng(claimDims(1, 1)).nonEmpty)
  }
}
