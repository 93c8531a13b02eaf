package graft

import graft.images.{Vp8l, WebPContainer}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial sweep over the VP8L lossless decoder (VERDICT r9
  * §next-6), the same treatment the VP8 token/bool decoder got in round
  * 9 (Vp8FuzzSpec): byte flips across ENTIRE committed fixtures,
  * truncations at every layer (huffman groups, backrefs, the transform
  * stack, color-cache), and a sweep over the composited-animation walk —
  * every mutation must decode to bounded garbage or throw
  * IllegalArgumentException within a watchdog budget. Never a hang, an
  * unbounded allocation, or a leaked internal exception (the R16
  * contract, appV2.py:165-185: corrupt crawled bytes cost one error
  * row, not an executor).
  *
  * Fixture coverage is the full committed VP8L surface: palettes at
  * every bit-packing width (2/4/13/200 colors), color-cache + LZ77
  * backref content (composite, photo), in-stream alpha, subtract-green/
  * predictor transforms (gradient, stripes), 1x1 and odd dims. */
class Vp8lFuzzSpec extends AnyFunSuite {

  private def resource(dir: String, name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$dir/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** One decode under a watchdog on a fresh daemon thread (see
    * Vp8FuzzSpec.probe: a genuinely stuck loop cannot be interrupted, so
    * a shared executor would poison the sweep behind the first hang). */
  private def probe(label: String)(body: => Unit): Option[String] = {
    @volatile var result: Option[String] = Some(s"$label HUNG")
    val t = new Thread(() => {
      result =
        try { body; None }
        catch {
          case _: IllegalArgumentException => None // error channel: fine
          case e: Throwable => Some(s"$label leaked ${e.getClass.getName}")
        }
    })
    t.setDaemon(true)
    t.start()
    t.join(15000)
    result
  }

  private def assertBounded(d: Vp8l.Decoded): Unit = {
    assert(d.width > 0 && d.height > 0, "dims must stay positive")
    assert(d.argb.length == d.width * d.height,
      "pixel buffer inconsistent with declared dims")
  }

  // the 13 committed VP8L fixtures; (name, flip stride) — coarser
  // strides on the two big byte-heavy payloads keep the sweep inside
  // the CI wall budget while still crossing every structural region
  private val fixtures = Seq(
    "onecolor_1x1" -> 1, "onecolor_7x3" -> 1, "palette2_31x9" -> 1,
    "stripes_80x60" -> 1, "palette4_40x40" -> 1,
    "palette200_50x20" -> 1, "palette13_25x25" -> 1,
    "gradient_64x48" -> 1, "alpha_holes_20x20" -> 2,
    "alpha_gradient_48x48" -> 2, "noise_33x17" -> 3,
    "photo_120x80" -> 11, "composite_256x96" -> 13)

  test("byte-flip sweep over all 13 VP8L fixtures: decode, reject, or " +
      "bounded garbage — never hang/leak") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, stride) <- fixtures) {
      val whole = resource("webp", name + ".webp")
      var pos = 12 // keep RIFF/WEBP magic; mutate everything after
      while (pos < whole.length) {
        val bad = whole.clone()
        bad(pos) = (bad(pos) ^ 0xa5).toByte
        probe(s"$name flip@$pos") {
          assertBounded(Vp8l.decode(bad))
        }.foreach(failures += _)
        pos += stride
      }
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("truncations at every layer: huffman groups, backrefs, " +
      "transforms, color-cache") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, stride) <- fixtures) {
      val whole = resource("webp", name + ".webp")
      // dense cuts in the header region, strided through the payload
      val cuts = (12 to math.min(40, whole.length)) ++
        (12 until whole.length by math.max(4, stride * 2))
      for (cut <- cuts.distinct.sorted) {
        val t = java.util.Arrays.copyOf(whole, cut)
        probe(s"$name truncate@$cut") {
          assertBounded(Vp8l.decode(t))
        }.foreach(failures += _)
      }
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("second-byte bit soup in the VP8L header: dims/alpha/version " +
      "fields never buy an allocation or a hang") {
    // the 5 bytes after the 0x2f signature carry 14+14-bit dims, the
    // alpha hint and the 3-bit version: exhaust the second byte and the
    // version byte against a real payload
    val whole = resource("webp", "gradient_64x48.webp")
    var off = 12
    while (new String(whole, off, 4, "US-ASCII") != "VP8L") off += 1
    val p = off + 8
    assert((whole(p) & 0xff) == 0x2f)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for (b <- 0 to 255; at <- Seq(p + 1, p + 4)) {
      val bad = whole.clone()
      bad(at) = b.toByte
      probe(s"hdr byte@$at=$b") {
        assertBounded(Vp8l.decode(bad))
      }.foreach(failures += _)
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("composited-animation walk under fuzz: clip2 byte flips degrade " +
      "to rejection or bounded canvases, never a hang") {
    // compositedFrames is stateful across frames — a hostile frame must
    // fail the decode (error channel), not corrupt the walk into a
    // hang or an oversized canvas
    val whole = resource("alpha", "clip2_64x48.webp")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 12
    while (pos < whole.length) {
      val bad = whole.clone()
      bad(pos) = (bad(pos) ^ 0xa5).toByte
      probe(s"clip2 flip@$pos") {
        WebPContainer.compositedFrames(bad).foreach { d =>
          assert(d.argb.length == d.width * d.height)
          assert(d.width.toLong * d.height <= 178956970L)
        }
      }.foreach(failures += _)
      pos += 7
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }
}
