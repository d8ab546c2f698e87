package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RawPng ↔ javax.imageio cross-validation: each codec must decode
  * the other's output pixel-identically, so the fast path can never
  * silently drift from the spec-compliant reference implementation. */
class RawPngSpec extends AnyFunSuite {

  private def rng(seed: Long, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  private def imageIoEncode(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < px.length) {
      raster.setSample(i % w, i / w, 0, px(i) & 0xFF); i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def imageIoDecode(png: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = img.getRaster.getSample(i % w, i / w, 0); i += 1
    }
    (w, h, out)
  }

  test("RawPng round-trips its own output") {
    val codec = new RawPng()
    for ((w, h) <- Seq((1, 1), (7, 1), (300, 1), (13, 17), (64, 64))) {
      val px = rng(w * 31 + h, w * h)
      val (dw, dh, got) = codec.decode(codec.encode(px, w, h))
      assert((dw, dh) == (w, h))
      assert(got.sameElements(px.map(_ & 0xFF)), s"${w}x$h")
    }
  }

  test("javax.imageio decodes RawPng output pixel-identically") {
    val codec = new RawPng()
    val px = rng(42, 300)
    val (w, h, got) = imageIoDecode(codec.encode(px, 300, 1))
    assert((w, h) == (300, 1))
    assert(got.sameElements(px.map(_ & 0xFF)))
  }

  test("RawPng decodes javax.imageio output incl. filtered scanlines") {
    val codec = new RawPng()
    // multi-row gradient-ish image: ImageIO's adaptive filtering emits
    // non-zero filter types here, exercising Sub/Up/Average/Paeth
    val w = 61; val h = 47
    val px = Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 3).toByte)
    val viaImageIo = imageIoEncode(px, w, h)
    val (dw, dh, got) = codec.decode(viaImageIo)
    assert((dw, dh) == (w, h))
    assert(got.sameElements(px.map(_ & 0xFF)))
    // and a noise image (different filter choices)
    val noisy = rng(7, w * h)
    val (_, _, got2) = codec.decode(imageIoEncode(noisy, w, h))
    assert(got2.sameElements(noisy.map(_ & 0xFF)))
  }

  test("RawPng rejects malformed input") {
    val codec = new RawPng()
    intercept[IllegalArgumentException](codec.decode("nope".getBytes))
    intercept[IllegalArgumentException](codec.encode(Array[Byte](1), 0, 1))
  }
}
