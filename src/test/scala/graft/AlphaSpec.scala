package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.images.{Alpha, Vp8, Vp8l, WebPContainer}
import org.scalatest.funsuite.AnyFunSuite

/** Lossy-with-alpha (ALPH chunk) and animation-first-frame decoding
  * against libwebp goldens (tools/make_alpha_fixtures.py): the encoded
  * stills pin the lossless-method alpha stream, the hand-assembled raw
  * containers pin every unfilter kernel (libwebp itself decoded the same
  * crafted bytes to produce the golden, so the assembly is C-validated),
  * and the animations pin the ANMF first-frame walk — the behavior the
  * reference inherits from PIL (appV2.py:167). */
class AlphaSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/alpha/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def decodeViaImageIO(bytes: Array[Byte]) =
    ImageIO.read(new ByteArrayInputStream(bytes))

  private def assertMatchesGolden(name: String): Unit = {
    val gold = resource(name + ".golden")
    val bb = java.nio.ByteBuffer.wrap(gold)
    val (w, h) = (bb.getInt(), bb.getInt())
    val img = decodeViaImageIO(resource(name + ".webp"))
    assert(img != null, s"$name: ImageIO returned null")
    assert(img.getWidth === w && img.getHeight === h)
    var i = 0
    while (i < w * h) {
      val px = img.getRGB(i % w, i / w)
      val o = 8 + 4 * i
      assert(((px >> 16) & 0xff) === (gold(o) & 0xff), s"$name R at $i")
      assert(((px >> 8) & 0xff) === (gold(o + 1) & 0xff), s"$name G at $i")
      assert((px & 0xff) === (gold(o + 2) & 0xff), s"$name B at $i")
      assert(((px >> 24) & 0xff) === (gold(o + 3) & 0xff), s"$name A at $i")
      i += 1
    }
  }

  private val stills = Seq(
    "agrad_64x48_q75", "amask_33x17_q50", "anoise_17x13_q75",
    "aradial_120x80_q75", // libwebp-encoded: ALPH method=1 (lossless) + raw
    "araw_none_64x48", "araw_horiz_64x48", "araw_vert_64x48",
    "araw_grad_64x48", "araw_grad_33x17", // method=0, every filter
    "meta_exif_64x48", // VP8X still with EXIF metadata around the VP8
    // pre-processing==1 (alpha_quality<100): decodes as-is — libwebp
    // only smooths under an explicit alpha_dithering_strength option,
    // which the reference's PIL path never sets
    "apre1_raw_grad_64x48", "apre1_vp8l_64x48")

  for (name <- stills)
    test(s"$name: RGBA byte-identical to libwebp WebPDecodeRGBA") {
      assertMatchesGolden(name)
    }

  test("pre==1 decodes byte-identically to the same payload with pre==0") {
    // apre1_vp8l_64x48 is agrad_64x48_q75's exact ALPH+VP8 payload with
    // only the pre-processing bits flipped to 1 — reference parity says
    // the planes must match (libwebp produced equal goldens for both)
    val a0 = decodeViaImageIO(resource("agrad_64x48_q75.webp"))
    val a1 = decodeViaImageIO(resource("apre1_vp8l_64x48.webp"))
    for (y <- 0 until 48; x <- 0 until 64)
      assert(a0.getRGB(x, y) === a1.getRGB(x, y), s"pixel ($x,$y)")
  }

  test("clip_64x48: every ANMF frame decodes byte-identically to its libwebp golden") {
    val frames = WebPContainer.frames(resource("clip_64x48.webp"))
    assert(frames.length === 6)
    for (i <- frames.indices) {
      val gold = resource(s"clip_64x48_f$i.golden")
      val bb = java.nio.ByteBuffer.wrap(gold)
      val (w, h) = (bb.getInt(), bb.getInt())
      val d = WebPContainer.decodeFrame(frames(i))
      assert(d.width === w && d.height === h, s"frame $i dims")
      var p = 0
      while (p < w * h) {
        val argb = d.argb(p)
        val o = 8 + 4 * p
        assert(((argb >> 16) & 0xff) === (gold(o) & 0xff), s"f$i R at $p")
        assert(((argb >> 8) & 0xff) === (gold(o + 1) & 0xff), s"f$i G at $p")
        assert((argb & 0xff) === (gold(o + 2) & 0xff), s"f$i B at $p")
        assert(((argb >>> 24) & 0xff) === (gold(o + 3) & 0xff), s"f$i A at $p")
        p += 1
      }
    }
  }

  test("blend-flag semantics: a later alpha frame is standalone only with do-not-blend") {
    def decodeToGolden(f: WebPContainer.Frame, goldenName: String): Unit = {
      val gold = resource(goldenName)
      val bb = java.nio.ByteBuffer.wrap(gold)
      val (w, h) = (bb.getInt(), bb.getInt())
      val d = WebPContainer.decodeFrame(f)
      assert(d.width === w && d.height === h)
      var p = 0
      while (p < w * h) {
        val argb = d.argb(p)
        val o = 8 + 4 * p
        assert(((argb >> 16) & 0xff) === (gold(o) & 0xff), s"$goldenName R at $p")
        assert(((argb >> 8) & 0xff) === (gold(o + 1) & 0xff), s"$goldenName G at $p")
        assert((argb & 0xff) === (gold(o + 2) & 0xff), s"$goldenName B at $p")
        assert(((argb >>> 24) & 0xff) === (gold(o + 3) & 0xff), s"$goldenName A at $p")
        p += 1
      }
    }
    // do-not-blend second frame: BOTH frames standalone, each C-golden
    val nb = WebPContainer.frames(resource("anim_alpha2_noblend_64x48.webp"))
    assert(nb.length === 2)
    decodeToGolden(nb(0), "anim_alpha2_noblend_64x48_f0.golden")
    decodeToGolden(nb(1), "anim_alpha2_noblend_64x48_f1.golden")
    // alpha-BLENDING second frame: composites over the prior canvas, so
    // a standalone decode would be silently WRONG pixels — frames() must
    // drop it, never emit it
    val bl = WebPContainer.frames(resource("anim_alpha2_blend_64x48.webp"))
    assert(bl.length === 1, "an alpha-blending later frame is not standalone")
    decodeToGolden(bl.head, "anim_alpha2_noblend_64x48_f0.golden")
  }

  test("frames() on stills yields exactly the one frame firstFrame sees") {
    def sameBytes(a: Option[Array[Byte]], b: Option[Array[Byte]]): Boolean =
      (a, b) match {
        case (Some(x), Some(y)) => java.util.Arrays.equals(x, y)
        case (None, None)       => true
        case _                  => false
      }
    for (name <- Seq("agrad_64x48_q75", "araw_grad_33x17", "meta_exif_64x48")) {
      val b = resource(name + ".webp")
      val fs = WebPContainer.frames(b)
      assert(fs.length === 1, name)
      val ff = WebPContainer.firstFrame(b).get
      assert(sameBytes(ff.vp8, fs.head.vp8) && sameBytes(ff.vp8l, fs.head.vp8l) &&
        sameBytes(ff.alph, fs.head.alph), name)
    }
  }

  for (name <- Seq("anim_vp8_64x48", "anim_vp8l_40x30", "anim_alpha_64x48",
      "clip_64x48"))
    test(s"$name: first frame equals libwebp's decode of the frame still") {
      assertMatchesGolden(name)
    }

  test("container walk: still-with-alpha yields VP8+ALPH, not VP8L") {
    val f = WebPContainer.firstFrame(resource("agrad_64x48_q75.webp")).get
    assert(f.vp8.isDefined && f.vp8l.isEmpty && f.alph.isDefined)
  }

  test("container walk: animation resolves to its first frame's chunks") {
    val f = WebPContainer.firstFrame(resource("anim_alpha_64x48.webp")).get
    assert(f.vp8.isDefined && f.alph.isDefined)
    val l = WebPContainer.firstFrame(resource("anim_vp8l_40x30.webp")).get
    assert(l.vp8l.isDefined && l.vp8.isEmpty)
  }

  test("partial first frame (not full-canvas) is rejected, not decoded") {
    val bytes = resource("anim_vp8_64x48.webp").clone()
    // ANMF frame header: widthMinusOne is 6 bytes into the payload; find
    // the chunk and shrink the declared frame width
    var off = 12
    var anmfPayload = -1
    while (anmfPayload < 0) {
      val cc = new String(bytes, off, 4, "US-ASCII")
      val size = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
        ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
      if (cc == "ANMF") anmfPayload = off + 8
      else off += 8 + size + (size & 1)
    }
    bytes(anmfPayload + 6) = 31 // width-1: 63 -> 31 (half canvas)
    assert(WebPContainer.firstFrame(bytes).isEmpty)
    intercept[Exception] {
      val img = decodeViaImageIO(bytes)
      if (img == null) throw new IllegalArgumentException("rejected")
    }
  }

  test("ALPH pre-processing 1 decodes as-is; 2 and 3 are rejected (ALPHInit parity)") {
    // pre==1 is informational to a default-options decoder (see Alpha's
    // class doc); pre 2/3 are reserved values libwebp rejects
    val raw = Array.tabulate[Byte](1 + 4)(i => if (i == 0) 0x10 else 1)
    assert(Alpha.decode(raw, 2, 2).toSeq === Seq[Byte](1, 1, 1, 1))
    for (pre <- 2 to 3) {
      val bad = raw.clone(); bad(0) = (pre << 4).toByte
      intercept[IllegalArgumentException] { Alpha.decode(bad, 2, 2) }
    }
  }

  test("ALPH non-zero reserved bits are rejected (libwebp ALPHInit parity)") {
    val payload = Array.tabulate[Byte](1 + 4)(i => if (i == 0) 0x40 else 1)
    intercept[IllegalArgumentException] { Alpha.decode(payload, 2, 2) }
  }

  test("ALPH raw payload shorter than the plane is rejected") {
    intercept[IllegalArgumentException] {
      Alpha.decode(Array[Byte](0, 1, 2), 2, 2)
    }
  }

  test("alpha plane: lossless-method stream decodes the exact encoder input") {
    // agrad's alpha is an exact x-gradient; ALPH method=1 is lossless, so
    // the decoded plane must reproduce it bit-for-bit
    val bytes = resource("agrad_64x48_q75.webp")
    val f = WebPContainer.firstFrame(bytes).get
    val planes = Vp8.decodePayload(f.vp8.get)
    val a = Alpha.decode(f.alph.get, planes.width, planes.height)
    var y = 0
    while (y < 48) {
      var x = 0
      while (x < 64) {
        assert((a(y * 64 + x) & 0xff) === x * 255 / 63, s"alpha at ($x,$y)")
        x += 1
      }
      y += 1
    }
  }

  test("mutation sweep: corrupted alpha/anim containers never hang the decoder") {
    // the 100 TB posture: crawled bytes are untrusted; every mutation must
    // decode, throw, or return null within the budget — a hang or runaway
    // allocation would stall an executor, not just fail a row (R16)
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      for (name <- Seq("agrad_64x48_q75", "araw_grad_64x48", "anim_alpha_64x48")) {
        val base = resource(name + ".webp")
        var off = 12 // keep the RIFF/WEBP magic; mutate everything after
        while (off < base.length) {
          val mutated = base.clone()
          mutated(off) = (mutated(off) ^ 0xa5).toByte
          val f = exec.submit(new java.util.concurrent.Callable[AnyRef] {
            def call(): AnyRef =
              try decodeViaImageIO(mutated) catch { case _: Throwable => null }
          })
          try f.get(10, java.util.concurrent.TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              fail(s"$name: mutation at byte $off hung the decoder")
          }
          off += 7
        }
        // truncations at every stride too (short reads mid-chunk)
        var cut = 13
        while (cut < base.length) {
          val t = java.util.Arrays.copyOf(base, cut)
          val f = exec.submit(new java.util.concurrent.Callable[AnyRef] {
            def call(): AnyRef =
              try decodeViaImageIO(t) catch { case _: Throwable => null }
          })
          try f.get(10, java.util.concurrent.TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              fail(s"$name: truncation at $cut hung the decoder")
          }
          cut += 11
        }
      }
    } finally exec.shutdownNow()
  }

  test("property: unfilter inverts every forward filter on random planes") {
    // forward filters per libwebp dsp/filters.c (what encoders write);
    // Alpha.decode(method=0) must reconstruct the original plane exactly
    def forward(a: Array[Byte], w: Int, h: Int, f: Int): Array[Byte] = {
      if (f == 0) return a.clone()
      val out = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        def v(j: Int) = a(j) & 0xff
        val pred = f match {
          case 1 => if (x > 0) v(i - 1) else if (y > 0) v(i - w) else 0
          case 2 => if (y > 0) v(i - w) else if (x > 0) v(i - 1) else 0
          case _ =>
            if (y == 0) { if (x > 0) v(i - 1) else 0 }
            else if (x == 0) v(i - w)
            else math.max(0, math.min(255, v(i - 1) + v(i - w) - v(i - w - 1)))
        }
        out(i) = ((v(i) - pred) & 0xff).toByte
      }
      out
    }
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 24) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val plane = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      for (f <- 0 to 3) {
        val payload = Array[Byte]((f << 2).toByte) ++ forward(plane, w, h, f)
        val got = Alpha.decode(payload, w, h)
        assert(got === plane, s"trial $trial ${w}x$h filter $f")
      }
    }
  }

  test("Vp8l.decodePayload: bare chunk decodes like the wrapped file") {
    val file = {
      val in = getClass.getResourceAsStream("/graft/webp/gradient_64x48.webp")
      try in.readAllBytes() finally in.close()
    }
    val viaFile = Vp8l.decode(file)
    val viaPayload = Vp8l.decodePayload(Vp8l.vp8lChunk(file).get)
    assert(viaPayload.width === viaFile.width)
    assert(viaPayload.argb === viaFile.argb)
  }
}
