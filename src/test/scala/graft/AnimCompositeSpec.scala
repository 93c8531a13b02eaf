package graft

import graft.images.WebPContainer
import org.scalatest.funsuite.AnyFunSuite

/** ANMF canvas compositing (WebPContainer.compositedFrames) against the
  * clip2 fixture (tools/make_alpha_fixtures.py): 8 frames on a 64x48
  * canvas exercising partial rects, alpha blending, no-blend overwrite,
  * dispose-to-background, and lossless/lossy/lossy+ALPH payloads. The
  * goldens are per-frame composited canvases: per-frame pixel decode is
  * libwebp-C-validated (each frame golden-decoded as a still by the
  * generator), the canvas arithmetic is libwebp demux/anim_decode.c
  * reimplemented INDEPENDENTLY in the Python generator and here in
  * Scala — byte equality pins the integer blend math from both sides
  * (no libwebpdemux ships in this environment, so WebPAnimDecoder
  * itself cannot be invoked; scaladoc on compositedFrames documents
  * the residual risk). */
class AnimCompositeSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/alpha/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val clip2 = resource("clip2_64x48.webp")

  test("clip2: all 8 frames composite byte-identically to the goldens") {
    val frames = WebPContainer.compositedFrames(clip2)
    assert(frames.length === 8)
    for (i <- frames.indices) {
      val gold = resource(s"clip2_64x48_f$i.composited")
      val bb = java.nio.ByteBuffer.wrap(gold)
      val (w, h) = (bb.getInt(), bb.getInt())
      val d = frames(i)
      assert(d.width === w && d.height === h, s"frame $i dims")
      var p = 0
      while (p < w * h) {
        val px = d.argb(p)
        val o = 8 + 4 * p
        assert(((px >> 16) & 0xff) === (gold(o) & 0xff), s"f$i R at $p")
        assert(((px >> 8) & 0xff) === (gold(o + 1) & 0xff), s"f$i G at $p")
        assert((px & 0xff) === (gold(o + 2) & 0xff), s"f$i B at $p")
        assert(((px >>> 24) & 0xff) === (gold(o + 3) & 0xff), s"f$i A at $p")
        p += 1
      }
    }
  }

  test("the standalone-frames walk drops what compositing now recovers") {
    // frames() keeps only frames whose standalone decode equals the
    // composited view (full-canvas + no-blend-or-opaque); clip2 was
    // built so most frames need canvas state — compositedFrames decodes
    // every one of them
    val standalone = WebPContainer.frames(clip2)
    val composited = WebPContainer.compositedFrames(clip2)
    assert(composited.length === 8)
    assert(standalone.length < composited.length)
  }

  test("anim_alpha2_blend: the alpha-blending second frame composites " +
      "instead of being dropped") {
    val b = resource("anim_alpha2_blend_64x48.webp")
    assert(WebPContainer.frames(b).length === 1) // correct-by-refusal before
    val comp = WebPContainer.compositedFrames(b)
    assert(comp.length === 2)
    assert(comp(1).width === 64 && comp(1).height === 48)
    // its no-blend twin shares frame payloads; frame 1 composited over
    // an opaque frame 0 must differ from frame 1 decoded standalone
    // wherever frame 1 has partial alpha (blending mixes in frame 0)
    val nb = resource("anim_alpha2_noblend_64x48.webp")
    val standalone1 = WebPContainer.decodeFrame(WebPContainer.frames(nb)(1))
    assert(!java.util.Arrays.equals(comp(1).argb, standalone1.argb),
      "blending against the canvas must differ from standalone decode")
  }

  test("in-compositor sampling: sampleEvery=k returns exactly the k-th " +
      "snapshots of the full walk (state still advances through skipped " +
      "frames)") {
    val full = WebPContainer.compositedFrames(clip2)
    val sampled = WebPContainer.compositedFrames(clip2, sampleEvery = 4)
    assert(sampled.length === 2)
    for ((j, f) <- Seq(0 -> 0, 1 -> 4)) {
      assert(sampled(j).width === full(f).width)
      assert(java.util.Arrays.equals(sampled(j).argb, full(f).argb),
        s"sampled($j) must equal full($f) — dispose/blend state drifted")
    }
    intercept[IllegalArgumentException] {
      WebPContainer.compositedFrames(clip2, sampleEvery = 0)
    }
  }

  test("total-output budget is separate from the per-frame canvas bound " +
      "and caller-tunable (ADVICE r11 #3)") {
    // clip2 is 8 frames of 64x48 = 24,576 total px. A budget below that
    // fires mid-walk (bomb channel); the tight-but-sufficient budget
    // decodes all 8 — the cumulative cap no longer rejects animations
    // merely for being long.
    val ex = intercept[IllegalArgumentException] {
      WebPContainer.compositedFrames(clip2, maxTotalPixels = 64L * 48 * 3)
    }
    assert(ex.getMessage.contains("decompression bomb"))
    assert(WebPContainer.compositedFrames(clip2,
      maxTotalPixels = 64L * 48 * 8).length === 8)
  }

  test("stills pass through compositedFrames as their single decode") {
    val still = resource("agrad_64x48_q75.webp")
    val comp = WebPContainer.compositedFrames(still)
    assert(comp.length === 1)
    assert(comp.head.width === 64 && comp.head.height === 48)
    assert(WebPContainer.compositedFrames("not a webp".getBytes).isEmpty)
  }

  test("blend arithmetic invariants (libwebp BlendPixelNonPremult)") {
    // drive the private kernel through a 2-frame crafted composite is
    // overkill; assert the observable invariants on clip2 instead:
    // frame 1 blends onto opaque frame 0 -> alpha stays 255 everywhere
    // in the blended rect (src_a + 255*(255-src_a)/255 == 255 exactly)
    val frames = WebPContainer.compositedFrames(clip2)
    val f1 = frames(1)
    for (y <- 8 until 32; x <- 16 until 48) {
      val a = f1.argb(y * 64 + x) >>> 24
      assert(a === 255, s"blend over opaque must stay opaque at ($x,$y)")
    }
    // frame 2 is NO-blend with alpha=128: the rect carries exactly 128
    val f2 = frames(2)
    for (y <- 24 until 40; x <- 0 until 40) {
      val a = f2.argb(y * 64 + x) >>> 24
      assert(a === 128, s"no-blend must overwrite alpha at ($x,$y)")
    }
    // frame 3 disposes to background: in frame 4's view, f3's rect is
    // transparent black outside f4's own rect
    val f4 = frames(4)
    for (y <- 0 until 20; x <- 32 until 56
         if !(x >= 8 && x < 24 && y >= 4 && y < 20)) {
      assert(f4.argb(y * 64 + x) === 0,
        s"disposed rect must be transparent black at ($x,$y)")
    }
  }
}
