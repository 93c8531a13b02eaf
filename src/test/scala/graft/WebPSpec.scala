package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.images.Vp8l
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM VP8L decoder against the reference C implementation:
  * every fixture .webp was encoded by libwebp (tools/make_webp_fixtures
  * .py) and its .golden is libwebp's OWN RGBA decode of that exact file
  * (4B BE width, 4B BE height, then RGBA bytes). A decoder bug of any
  * kind — huffman desync, wrong transform order, off-by-one in the
  * distance map — shows up as a pixel mismatch against the C library,
  * not against ourselves. */
class WebPSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/webp/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def golden(name: String): (Int, Int, Array[Byte]) = {
    val b = resource(name + ".golden")
    val bb = java.nio.ByteBuffer.wrap(b)
    val w = bb.getInt()
    val h = bb.getInt()
    (w, h, java.util.Arrays.copyOfRange(b, 8, b.length))
  }

  /** Fixture inventory and the VP8L feature each one forces. */
  private val fixtures = Seq(
    "gradient_64x48"       -> "smooth gradient: predictor transform",
    "noise_33x17"          -> "random noise, odd dims: literal-heavy coding",
    "palette2_31x9"        -> "2 colors: color-indexing, 8 px/byte bundling",
    "palette4_40x40"       -> "4 colors: color-indexing, 4 px/byte bundling",
    "palette13_25x25"      -> "13 colors: color-indexing, 2 px/byte bundling",
    "palette200_50x20"     -> "200 colors: unbundled palette",
    "alpha_gradient_48x48" -> "full alpha channel",
    "alpha_holes_20x20"    -> "fully-transparent pixels",
    "stripes_80x60"        -> "repeating stripes: LZ77 backrefs + distance map",
    "composite_256x96"     -> "heterogeneous regions: meta-huffman groups",
    "onecolor_1x1"         -> "1x1: degenerate single-symbol codes",
    "onecolor_7x3"         -> "uniform color: single-symbol + backref",
    "photo_120x80"         -> "photo-like: predictor + cross-color")

  for ((name, why) <- fixtures)
    test(s"$name decodes bit-identically to libwebp ($why)") {
      val dec = Vp8l.decode(resource(name + ".webp"))
      val (gw, gh, grgba) = golden(name)
      assert(dec.width === gw)
      assert(dec.height === gh)
      val got = new Array[Byte](gw * gh * 4)
      var i = 0
      while (i < dec.argb.length) {
        val p = dec.argb(i)
        got(4 * i) = ((p >>> 16) & 0xff).toByte     // R
        got(4 * i + 1) = ((p >>> 8) & 0xff).toByte  // G
        got(4 * i + 2) = (p & 0xff).toByte          // B
        got(4 * i + 3) = ((p >>> 24) & 0xff).toByte // A
        i += 1
      }
      val bad = got.zip(grgba).indexWhere { case (a, b) => a != b }
      assert(bad === -1,
        s"first mismatching RGBA byte at $bad (pixel ${bad / 4}: " +
          s"x=${bad / 4 % gw} y=${bad / 4 / gw})")
    }

  test("ImageIO.read picks up the SPI: lossless webp decodes end-to-end") {
    val img = ImageIO.read(new ByteArrayInputStream(resource("gradient_64x48.webp")))
    assert(img != null, "ImageIO returned null — SPI not registered?")
    assert(img.getWidth === 64 && img.getHeight === 48)
    val (_, _, grgba) = golden("gradient_64x48")
    // spot-check a pixel through the full ImageIO path
    val p = img.getRGB(10, 7)
    val o = (7 * 64 + 10) * 4
    assert(((p >> 16) & 0xff) === (grgba(o) & 0xff))
    assert(((p >> 8) & 0xff) === (grgba(o + 1) & 0xff))
    assert((p & 0xff) === (grgba(o + 2) & 0xff))
  }

  test("lossy VP8 decodes through ImageIO, matching libwebp's RGBA") {
    // lossy_gradient.webp is byte-identical to the vp8 fixture
    // grad_64x48_q75.webp, whose .golden is libwebp's own decode
    val bytes = resource("lossy_gradient.webp")
    assert(!Vp8l.isLossless(bytes))
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "lossy VP8 must decode natively now")
    val in = getClass.getResourceAsStream("/graft/vp8/grad_64x48_q75.golden")
    val gold = try in.readAllBytes() finally in.close()
    val bb = java.nio.ByteBuffer.wrap(gold)
    val (w, h) = (bb.getInt(), bb.getInt())
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = 8 + (y * w + x) * 4
      assert(((p >> 16) & 0xff) === (gold(o) & 0xff), s"R($x,$y)")
      assert(((p >> 8) & 0xff) === (gold(o + 1) & 0xff), s"G($x,$y)")
      assert((p & 0xff) === (gold(o + 2) & 0xff), s"B($x,$y)")
    }
  }

  test("garbage and truncated containers are rejected, not crashed on") {
    assert(Vp8l.vp8lChunk("not a webp at all".getBytes).isEmpty)
    intercept[IllegalArgumentException] {
      Vp8l.decode("RIFF????WEBP".getBytes)
    }
    // valid container, truncated VP8L payload
    val whole = resource("gradient_64x48.webp")
    val cut = java.util.Arrays.copyOf(whole, whole.length - 40)
    intercept[IllegalArgumentException] { Vp8l.decode(cut) }
  }

  test("crafted near-2^32 chunk size terminates the RIFF walk (no hang)") {
    // RIFF/WEBP header + one chunk whose le32 size is 0xFFFFFFF8: a
    // truncating Int walk would step 0 or negative and spin forever
    val b = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(b, 0)
    "WEBP".getBytes.copyToArray(b, 8)
    "JUNK".getBytes.copyToArray(b, 12)
    b(16) = 0xf8.toByte; b(17) = 0xff.toByte; b(18) = 0xff.toByte; b(19) = 0xff.toByte
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val f = done.submit(new java.util.concurrent.Callable[Option[Array[Byte]]] {
        def call(): Option[Array[Byte]] = Vp8l.vp8lChunk(b)
      })
      assert(f.get(5, java.util.concurrent.TimeUnit.SECONDS).isEmpty)
    } finally done.shutdownNow()
    // zero-size chunk repeated would also stall without the strict-increase
    // guard; a zero-size JUNK chunk followed by nothing must return None
    val z = new Array[Byte](20)
    "RIFF".getBytes.copyToArray(z, 0)
    "WEBP".getBytes.copyToArray(z, 8)
    "JUNK".getBytes.copyToArray(z, 12)
    assert(Vp8l.vp8lChunk(z).isEmpty)
  }

  test("oversubscribed huffman table rides the error channel, not garbage pixels") {
    // Take a valid VP8L stream and corrupt an interior byte of the
    // entropy-code region; with Kraft validation the decode must throw
    // (or still decode if the byte lands outside the tables) — it must
    // never loop or crash with an internal error type. Sweep a window.
    val whole = resource("gradient_64x48.webp")
    var threw = 0
    for (i <- 30 until math.min(90, whole.length)) {
      val c = whole.clone()
      c(i) = (c(i) ^ 0x5a).toByte
      try { Vp8l.decode(c); () }
      catch {
        case _: IllegalArgumentException => threw += 1
        case _: ArrayIndexOutOfBoundsException =>
          fail(s"corrupt byte $i: AIOOBE escaped instead of IllegalArgumentException")
      }
    }
    assert(threw > 0, "no corruption in the swept window was rejected — validation inert?")
  }
}
