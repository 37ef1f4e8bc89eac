package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Ground-truth tests for the real `javax.imageio` codec path: decoded
  * values must match ImageIO's own read of the same bytes, and the
  * non-image fallback must stay on the deterministic stub. */
class ImageCodecSpec extends AnyFunSuite {

  test("solid-gray PNG decodes to exact dimensions and brightness") {
    for ((w, h, g) <- Seq((1, 1, 0), (8, 31, 255), (24, 9, 128),
        (17, 17, 37))) {
      val png = Multimodal.syntheticPng(w, h, g)
      val Some((dw, dh, bright)) = Multimodal.decodeImage(png)
      assert((dw, dh) == (w, h))
      assert(bright == g.toDouble, s"w=$w h=$h g=$g got $bright")
    }
  }

  test("gradient PNG brightness matches an independent pixel-sum replay") {
    val w = 13; val h = 7
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 19) % 256; val g = (y * 43) % 256
      val b = (x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      expected += r + g + b
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((dw, dh, bright)) = Multimodal.decodeImage(out.toByteArray)
    assert((dw, dh) == (w, h))
    assert(bright == expected.toDouble / (3.0 * w * h))
  }

  test("JPEG decodes with exact dimensions and near-fill brightness") {
    val img = new java.awt.image.BufferedImage(20, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20)
      img.setRGB(x, y, (200 << 16) | (200 << 8) | 200)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val Some((dw, dh, bright)) = Multimodal.decodeImage(out.toByteArray)
    assert((dw, dh) == (20, 12))
    // JPEG is lossy: dimensions are exact, the solid fill only near
    assert(math.abs(bright - 200.0) < 3.0, s"got $bright")
  }

  test("non-image bytes fall back to the stub; media_type routes") {
    val text = "not an image at all, just prose bytes".getBytes("UTF-8")
    assert(Multimodal.decodeImage(text).isEmpty)
    val viaDecode = Multimodal.decode(
      Multimodal.MediaRow(7L, "image", text))
    assert(viaDecode == Multimodal.decodeStub(
      Multimodal.MediaRow(7L, "image", text)))
    // a real PNG under a non-image media_type stays on the stub — the
    // envelope type, not the bytes, routes the codec
    val png = Multimodal.syntheticPng(4, 4, 9)
    val audio = Multimodal.decode(Multimodal.MediaRow(8L, "audio", png))
    assert(audio == Multimodal.decodeStub(
      Multimodal.MediaRow(8L, "audio", png)))
  }
}
