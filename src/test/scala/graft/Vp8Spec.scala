package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.images.{Vp8, Vp8l}
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM VP8 keyframe decoder against the reference C
  * implementation: every fixture .webp was encoded by libwebp
  * (tools/make_vp8_fixtures.py); its .yuv is libwebp's own
  * WebPDecodeYUV of that exact file (the RFC 6386 bitstream-defined
  * output — no colorspace conversion in the comparison) and its
  * .golden the WebPDecodeRGBA (pinning fancy upsampling + the
  * fixed-point YUV→RGB chain on top). A decoder bug anywhere — bool
  * decoder drift, a wrong normative table byte, transform rounding,
  * predictor edge rules, loop filter taps — shows up as a pixel
  * mismatch against the C library, not against ourselves. */
class Vp8Spec extends AnyFunSuite {

  private val fixtures = Seq(
    "flat_16x16", "onecolor_1x1", "grad_64x48_q75", "grad_64x48_q10",
    "grad_64x48_q95", "noise_33x17_q50", "edge_17x13_q75",
    "stripes_80x60_q75", "photo_120x80_q75", "photo_120x80_q25",
    "composite_256x96_q50",
    // q=0: uv_dc quantizer index exceeds 117, the chroma-DC clamp point —
    // clamping the dequant VALUE instead of the index decodes wrong chroma
    "photo_48x32_q0")

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/vp8/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  for (name <- fixtures) {
    test(s"$name: YUV planes byte-identical to libwebp WebPDecodeYUV") {
      val gold = resource(name + ".yuv")
      val bb = java.nio.ByteBuffer.wrap(gold)
      val (w, h) = (bb.getInt(), bb.getInt())
      val d = Vp8.decode(resource(name + ".webp"))
      assert(d.width === w && d.height === h)
      val uvLen = d.uvWidth * d.uvHeight
      assert(d.y === java.util.Arrays.copyOfRange(gold, 8, 8 + w * h))
      assert(d.u === java.util.Arrays.copyOfRange(gold, 8 + w * h,
        8 + w * h + uvLen))
      assert(d.v === java.util.Arrays.copyOfRange(gold, 8 + w * h + uvLen,
        8 + w * h + 2 * uvLen))
    }

    test(s"$name: ARGB byte-identical to libwebp WebPDecodeRGBA") {
      val gold = resource(name + ".golden")
      val bb = java.nio.ByteBuffer.wrap(gold)
      val (w, h) = (bb.getInt(), bb.getInt())
      val argb = Vp8.toArgb(Vp8.decode(resource(name + ".webp")))
      var i = 0
      while (i < w * h) {
        val px = argb(i)
        val o = 8 + 4 * i
        assert(((px >> 16) & 0xff) === (gold(o) & 0xff), s"R at $i")
        assert(((px >> 8) & 0xff) === (gold(o + 1) & 0xff), s"G at $i")
        assert((px & 0xff) === (gold(o + 2) & 0xff), s"B at $i")
        assert(((px >> 24) & 0xff) === 255, s"A at $i")
        i += 1
      }
    }
  }

  test("ImageIO integration: the registered SPI claims and decodes lossy") {
    val img = ImageIO.read(
      new ByteArrayInputStream(resource("photo_120x80_q75.webp")))
    assert(img != null && img.getWidth === 120 && img.getHeight === 80)
  }

  test("lossless container is NOT decoded by Vp8 (and vice versa)") {
    val lossless = {
      val in = getClass.getResourceAsStream("/graft/webp/gradient_64x48.webp")
      try in.readAllBytes() finally in.close()
    }
    assert(Vp8.vp8Chunk(lossless).isEmpty)
    assert(Vp8l.isLossless(lossless))
    val lossy = resource("grad_64x48_q75.webp")
    assert(Vp8.isVp8(lossy) && !Vp8l.isLossless(lossy))
  }

  test("truncated and corrupt VP8 degrades to an exception or bounded " +
      "garbage — never a hang (R16 contract)") {
    val whole = resource("photo_120x80_q75.webp")
    // truncations at every eighth of the payload
    for (k <- 1 until 8) {
      val cut = java.util.Arrays.copyOf(whole, whole.length * k / 8)
      try {
        val d = Vp8.decode(cut)
        assert(d.y.length === d.width * d.height) // decoded to garbage: fine
      } catch {
        case _: IllegalArgumentException => () // rejected: fine
        case e: Exception => fail(s"truncation $k leaked ${e.getClass}")
      }
    }
    // single-byte corruption sweep over the header region
    for (pos <- 20 until math.min(whole.length, 120)) {
      val bad = whole.clone()
      bad(pos) = (bad(pos) ^ 0x55).toByte
      try { Vp8.decode(bad); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Exception => fail(s"corrupt byte $pos leaked ${e.getClass}")
      }
    }
  }

  test("inter frames and bad start codes are rejected") {
    val whole = resource("flat_16x16.webp")
    val chunkOff = {
      // locate the VP8 chunk payload inside the container
      var off = 12
      while (new String(whole, off, 4, "US-ASCII") != "VP8 ") off += 1
      off + 8
    }
    val inter = whole.clone()
    inter(chunkOff) = (inter(chunkOff) | 1).toByte // frame_type = inter
    intercept[IllegalArgumentException] { Vp8.decode(inter) }
    val badStart = whole.clone()
    badStart(chunkOff + 3) = 0
    intercept[IllegalArgumentException] { Vp8.decode(badStart) }
  }

  test("crafted near-2^32 chunk size terminates the VP8 RIFF walk") {
    val b = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(b, 0)
    "WEBP".getBytes.copyToArray(b, 8)
    "JUNK".getBytes.copyToArray(b, 12)
    b(16) = 0xf8.toByte; b(17) = 0xff.toByte
    b(18) = 0xff.toByte; b(19) = 0xff.toByte
    assert(Vp8.vp8Chunk(b).isEmpty)
  }
}
