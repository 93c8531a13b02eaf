package graft

import graft.images.{Vp8, Vp8l, WebPContainer}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial sweep over the lossy VP8 token/bool decoder (VERDICT r8
  * §next-5), the same treatment the alpha unfilters and the container got
  * in round 8: truncated partitions, header dims inconsistent with the
  * payload, and byte flips across ENTIRE committed fixtures — every
  * mutation must decode to bounded garbage or throw
  * IllegalArgumentException within a watchdog budget. Never a hang, an
  * unbounded allocation, or a leaked internal exception (the R16
  * contract, appV2.py:165-185: corrupt crawled bytes cost one error row,
  * not an executor). */
class Vp8FuzzSpec extends AnyFunSuite {

  private def resource(dir: String, name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$dir/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** Run one decode under the watchdog; returns the failure description
    * or None if the mutation behaved (decoded bounded or threw IAE).
    * One fresh DAEMON thread per probe, joined with a timeout: a real
    * infinite loop in the decoder (the exact bug this fuzz hunts) cannot
    * be interrupted, so a shared executor would be poisoned by the first
    * hang and every later probe would falsely time out behind it — here
    * the stuck thread is abandoned (daemon: dies with the JVM) and the
    * sweep keeps going, reporting exactly the offending position. */
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

  /** The boundedness contract: every plane sized exactly to the DECLARED
    * header dims (what Vp8Spec pins against golden decodes too). */
  private def assertBounded(d: Vp8.Planes): Unit = {
    assert(d.y.length == d.width * d.height, "y plane inconsistent with dims")
    assert(d.u.length == d.uvWidth * d.uvHeight &&
      d.v.length == d.uvWidth * d.uvHeight, "uv planes inconsistent with dims")
  }

  private def vp8ChunkOffset(whole: Array[Byte]): Int = {
    var off = 12
    while (new String(whole, off, 4, "US-ASCII") != "VP8 ") off += 1
    off + 8
  }

  test("byte-flip sweep over whole lossy fixtures: decode, reject, or bounded garbage — never hang/leak") {
    locally {
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      for (name <- Seq("flat_16x16", "grad_64x48_q75", "photo_120x80_q75")) {
        val whole = resource("vp8", name + ".webp")
        var pos = 12 // keep RIFF/WEBP magic; mutate everything after
        while (pos < whole.length) {
          val bad = whole.clone()
          bad(pos) = (bad(pos) ^ 0xa5).toByte
          probe(s"$name flip@$pos") {
            assertBounded(Vp8.decode(bad))
          }.foreach(failures += _)
          pos += 3
        }
      }
      assert(failures.isEmpty, failures.take(10).mkString("\n"))
    }
  }

  test("partition truncations: every cut point of the two-partition layout behaves") {
    locally {
      val whole = resource("vp8", "photo_120x80_q75.webp")
      val chunkOff = vp8ChunkOffset(whole)
      val tag = (whole(chunkOff) & 0xff) | ((whole(chunkOff + 1) & 0xff) << 8) |
        ((whole(chunkOff + 2) & 0xff) << 16)
      val part1End = chunkOff + 10 + (tag >>> 5)
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      // dense cuts around the header/partition boundaries, sparse elsewhere
      val cuts = (chunkOff to chunkOff + 12) ++
        (part1End - 2 to part1End + 2) ++
        (chunkOff until whole.length by 16)
      for (cut <- cuts.distinct.sorted if cut >= 0 && cut < whole.length) {
        val t = java.util.Arrays.copyOf(whole, cut)
        probe(s"truncate@$cut") {
          assertBounded(Vp8.decode(t))
        }.foreach(failures += _)
      }
      assert(failures.isEmpty, failures.take(10).mkString("\n"))
    }
  }

  test("header dims inconsistent with the payload: bounded or rejected, incl. the bomb guard") {
    locally {
      val whole = resource("vp8", "grad_64x48_q75.webp")
      val o = vp8ChunkOffset(whole)
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      // shrink, stretch, and cross dims against the real 64x48 payload
      for ((w, h) <- Seq((1, 1), (1, 48), (64, 1), (16383, 1), (1, 16383),
          (640, 480), (4095, 4095))) {
        val bad = whole.clone()
        bad(o + 6) = (w & 0xff).toByte; bad(o + 7) = ((w >> 8) & 0x3f).toByte
        bad(o + 8) = (h & 0xff).toByte; bad(o + 9) = ((h >> 8) & 0x3f).toByte
        probe(s"dims ${w}x$h") {
          val d = Vp8.decode(bad)
          assert(d.width == w && d.height == h, "dims come from the header")
          assertBounded(d)
        }.foreach(failures += _)
      }
      assert(failures.isEmpty, failures.mkString("\n"))
      // 16383x16383 from a 3.5 KB file: the PIL-parity decompression-bomb
      // guard must reject BEFORE allocating ~768 MB of planes
      val bomb = whole.clone()
      bomb(o + 6) = 0xff.toByte; bomb(o + 7) = 0x3f.toByte
      bomb(o + 8) = 0xff.toByte; bomb(o + 9) = 0x3f.toByte
      val e = intercept[IllegalArgumentException] { Vp8.decode(bomb) }
      assert(e.getMessage.contains("decompression bomb"))
    }
  }

  test("VP8L dims bomb: hostile lossless header rejected before allocation") {
    val lossless = resource("webp", "gradient_64x48.webp")
    // locate the VP8L chunk and saturate the 14+14-bit dims field
    var off = 12
    while (new String(lossless, off, 4, "US-ASCII") != "VP8L") off += 1
    val p = off + 8
    assert((lossless(p) & 0xff) == 0x2f)
    val bomb = lossless.clone()
    bomb(p + 1) = 0xff.toByte; bomb(p + 2) = 0xff.toByte
    bomb(p + 3) = 0xff.toByte; bomb(p + 4) = 0xff.toByte
    val e = intercept[IllegalArgumentException] {
      Vp8l.decode(bomb)
    }
    assert(e.getMessage.contains("decompression bomb"), e.getMessage)
  }

  test("first-partition length field fuzz: part1Len never escapes the chunk") {
    locally {
      val whole = resource("vp8", "flat_16x16.webp")
      val o = vp8ChunkOffset(whole)
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      // the 19-bit first-partition size lives in tag bits 5..23: sweep
      // byte patterns that push it to 0, tiny, exact, huge
      for (b0 <- Seq(0x00, 0x20, 0x40, 0x80, 0xe0); b1 <- Seq(0x00, 0x7f, 0xff);
           b2 <- Seq(0x00, 0x7f, 0xff)) {
        val bad = whole.clone()
        // keep frame_type=keyframe (bit0=0) and version bits sane
        bad(o) = (b0 & 0xfe).toByte
        bad(o + 1) = b1.toByte
        bad(o + 2) = b2.toByte
        probe(s"tag $b0/$b1/$b2") {
          assertBounded(Vp8.decode(bad))
        }.foreach(failures += _)
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }

  test("anim containers with fuzzed ANMF frames degrade per-frame, not per-file") {
    // frames() must skip/reject hostile frames without abandoning the
    // walk or hanging — the multimodal fan-out feeds it crawled bytes
    locally {
      val whole = resource("alpha", "clip_64x48.webp")
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      var pos = 12
      while (pos < whole.length) {
        val bad = whole.clone()
        bad(pos) = (bad(pos) ^ 0xa5).toByte
        probe(s"clip flip@$pos") {
          WebPContainer.frames(bad).foreach { f =>
            val d = WebPContainer.decodeFrame(f)
            assert(d.argb.length == d.width * d.height)
          }
        }.foreach(failures += _)
        pos += 5
      }
      assert(failures.isEmpty, failures.take(10).mkString("\n"))
    }
  }
}
