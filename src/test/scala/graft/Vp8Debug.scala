package graft

import java.nio.file.{Files, Paths}

/** Dev harness: decode every committed VP8 fixture and diff the YUV
  * planes against libwebp's own WebPDecodeYUV goldens. Run via
  * `sbt "Test/runMain graft.Vp8Debug"`. */
object Vp8Debug {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/graft/vp8")
    val names = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".webp")).map(p =>
        p.substring(p.lastIndexOf('/') + 1, p.length - 5)).sorted
    for (name <- names) {
      val bytes = Files.readAllBytes(dir.resolve(name + ".webp"))
      val gold = Files.readAllBytes(dir.resolve(name + ".yuv"))
      val bb = java.nio.ByteBuffer.wrap(gold)
      val w = bb.getInt(); val h = bb.getInt()
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      try {
        val t0 = System.nanoTime()
        val d = graft.images.Vp8.decode(bytes)
        val ms = (System.nanoTime() - t0) / 1e6
        assert(d.width == w && d.height == h, s"dims ${d.width}x${d.height}")
        def diff(plane: Array[Byte], goldOff: Int, pw: Int, ph: Int,
                 label: String): String = {
          var bad = 0
          var first = ""
          var maxd = 0
          var i = 0
          while (i < pw * ph) {
            val a = plane(i) & 0xff
            val b = gold(goldOff + i) & 0xff
            if (a != b) {
              if (bad == 0) first = s"(${i % pw},${i / pw}) got=$a want=$b"
              bad += 1
              if (math.abs(a - b) > maxd) maxd = math.abs(a - b)
            }
            i += 1
          }
          if (bad == 0) "" else s" $label:$bad/${pw * ph} maxd=$maxd first=$first"
        }
        val r = diff(d.y, 8, w, h, "Y") +
          diff(d.u, 8 + w * h, uvW, uvH, "U") +
          diff(d.v, 8 + w * h + uvW * uvH, uvW, uvH, "V")
        println(f"$name%-22s ${if (r.isEmpty) f"OK ($ms%.1f ms)" else "FAIL" + r}")
      } catch {
        case e: Exception =>
          println(f"$name%-22s EXC ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}

/** Per-MB diff map for one fixture: `Test/runMain graft.Vp8DebugMap <name>` */
object Vp8DebugMap {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = Paths.get("src/test/resources/graft/vp8")
    val bytes = Files.readAllBytes(dir.resolve(name + ".webp"))
    val gold = Files.readAllBytes(dir.resolve(name + ".yuv"))
    val bb = java.nio.ByteBuffer.wrap(gold)
    val w = bb.getInt(); val h = bb.getInt()
    val d = graft.images.Vp8.decode(bytes)
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    println(s"$name ${w}x$h mb ${mbW}x$mbH  (Y-plane diff count per MB)")
    for (my <- 0 until mbH) {
      val row = (0 until mbW).map { mx =>
        var bad = 0
        for (yy <- my * 16 until math.min(h, my * 16 + 16);
             xx <- mx * 16 until math.min(w, mx * 16 + 16))
          if (d.y(yy * w + xx) != gold(8 + yy * w + xx)) bad += 1
        f"$bad%4d"
      }.mkString
      println(row)
    }
    // per-pixel diff sign map for the first two MB rows/cols
    for (yy <- 0 until math.min(h, 20)) {
      val line = (0 until math.min(w, 64)).map { xx =>
        val a = d.y(yy * w + xx) & 0xff; val b = gold(8 + yy * w + xx) & 0xff
        if (a == b) '.' else if (math.abs(a - b) <= 2) 'o' else 'X'
      }.mkString
      println(f"$yy%3d $line")
    }
  }
}

/** Header/mode dump: `Test/runMain graft.Vp8DebugHdr <name>` */
object Vp8DebugHdr {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/graft/vp8")
    val bytes = Files.readAllBytes(dir.resolve(args(0) + ".webp"))
    graft.images.Vp8.debugHeader(bytes)
  }
}
