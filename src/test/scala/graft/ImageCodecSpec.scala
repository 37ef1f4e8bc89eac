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

  test("bilinear resize: exact target dims; solid fill survives exactly; " +
      "gradient brightness stays in range") {
    val png = Multimodal.syntheticPng(24, 16, 77)
    val Some(small) = Multimodal.resizeImage(png, 8, 8)
    val Some((w, h, bright)) = Multimodal.decodeImage(small)
    assert((w, h) == (8, 8))
    assert(bright == 77.0)
    // upscale too
    val Some(big) = Multimodal.resizeImage(png, 40, 40)
    val Some((bw, bh, bb)) = Multimodal.decodeImage(big)
    assert((bw, bh) == (40, 40) && bb == 77.0)
    // non-image input refuses
    assert(Multimodal.resizeImage("text".getBytes, 8, 8).isEmpty)
  }

  test("WAV round trip: constant-fill PCM decodes to exact frame count, " +
      "rate, channels, sum of squares") {
    val wav = Multimodal.syntheticWav(nFrames = 250, sampleRateHz = 8000,
      value = 300)
    val Some((frames, rate, ch, sumSq)) = Multimodal.decodeWav(wav)
    assert(frames == 250L && rate == 8000 && ch == 1)
    assert(sumSq == 250L * 300 * 300)
    // negative fill squares positive; zero-fill sums to zero
    val neg = Multimodal.syntheticWav(100, 12000, -1024)
    assert(Multimodal.decodeWav(neg).get._4 == 100L * 1024 * 1024)
    assert(Multimodal.decodeWav(
      Multimodal.syntheticWav(100, 12000, 0)).get._4 == 0L)
    // non-WAV bytes refuse; decode() routes audio through the real path
    assert(Multimodal.decodeWav("RIFFnope".getBytes).isEmpty)
    val f = Multimodal.decode(Multimodal.MediaRow(5L, "audio", wav))
    assert(f.width == 8000 && f.height == 1 && f.n_frames == 250
      && f.brightness == 300.0)
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

  test("dHash is content-level: re-encodings collide, bytes do not") {
    // predicted constants: solid → no adjacent difference → 0; 9×8
    // horizontal gradient → strictly increasing columns → all 64 bits
    assert(Multimodal.dHash64(Multimodal.syntheticPng(9, 8, 77))
      .contains(0L))
    assert(Multimodal.dHash64(Multimodal.syntheticPng(32, 16, 200))
      .contains(0L))
    val grad = Multimodal.syntheticGradientPng(9, 8)
    assert(Multimodal.dHash64(grad).contains(-1L))
    // SAME pixels, DIFFERENT container: decode the gradient and
    // re-encode as BMP — payload bytes (and so md5/q84 block hashes)
    // differ, the perceptual hash does not
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(grad))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val bmp = out.toByteArray
    assert(!java.util.Arrays.equals(grad, bmp))
    assert(Multimodal.dHash64(bmp) == Multimodal.dHash64(grad))
    // undecodable payloads return None, never throw
    assert(Multimodal.dHash64("not pixels".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash64(null).isEmpty)
  }
}
