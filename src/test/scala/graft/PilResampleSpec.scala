package graft

import graft.images.PilResample
import org.scalatest.funsuite.AnyFunSuite

/** Provable invariants of the PIL-algorithm resampler (no Pillow in
  * this container to golden against — see PilResample's scaladoc; these
  * pin the properties that distinguish the algorithm from the Java2D
  * fixed-4x4 bicubic it replaced). */
class PilResampleSpec extends AnyFunSuite {

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  test("flat field is exact at any ratio (coefficients normalize to 1)") {
    for ((inS, outS) <- Seq((448, 448), (448, 64), (17, 448), (1000, 7))) {
      val in = Array.fill(inS * inS)(gray(131))
      val out = PilResample.resizeRgb(in, inS, inS, outS, outS)
      assert(out.forall(_ == gray(131)), s"$inS -> $outS")
    }
  }

  test("same-size resize is the identity (cubic kernel is interpolating)") {
    val rng = new scala.util.Random(7)
    val in = Array.fill(64 * 48)((rng.nextInt(256) << 16) |
      (rng.nextInt(256) << 8) | rng.nextInt(256))
    assert(PilResample.resizeRgb(in, 64, 48, 64, 48) === in)
  }

  test("ANTIALIASING: 1-px checkerboard downscales to near-mid gray, not aliased extremes") {
    // the property Java2D's fixed-4x4 bicubic lacks: at 7x downscale its
    // kernel sees ~1 of every 7 columns of the pattern and emits
    // near-black or near-white depending on phase; a scaled-support
    // kernel averages the pattern (mean 127.5)
    val inS = 448
    val in = Array.tabulate(inS * inS) { i =>
      val x = i % inS; val y = i / inS
      if (((x + y) & 1) == 0) gray(0) else gray(255)
    }
    val out = PilResample.resizeRgb(in, inS, inS, 64, 64)
    out.foreach { p =>
      val v = p & 0xff
      assert(math.abs(v - 127.5) < 24.0, s"aliased value $v")
    }
  }

  test("separability: wide support engages on downscale (edge smearing)") {
    // a single white column in black, 448 -> 64 (7x): PIL's support
    // widens to 14 source px, so the column's energy spreads over ~2-3
    // output columns at ~1/7 intensity; a non-antialiased kernel either
    // drops it entirely (sampled past it) or keeps it near-full-strength
    val inS = 448
    val in = Array.tabulate(inS * inS)(i => if (i % inS == 224) gray(255) else gray(0))
    val out = PilResample.resizeRgb(in, inS, inS, 64, 64)
    val row = out.slice(0, 64).map(_ & 0xff)
    val total = row.map(_.toLong).sum
    assert(row.max > 0, "the column must survive")
    assert(row.max < 128, s"no antialiasing: peak ${row.max} is near full strength")
    // energy ~ 255/7 ≈ 36 spread across the row (fixed-point rounding slack)
    assert(math.abs(total - 255 / 7) <= 8, s"row energy $total")
  }

  test("edge clamping: windows clip at the borders without darkening (PIL xmin/xmax)") {
    // gradient image: border outputs must stay within the input range —
    // an unnormalized clipped window would scale border pixels down
    val inS = 100
    val in = Array.tabulate(inS * inS)(i => gray((i % inS) * 255 / (inS - 1)))
    val out = PilResample.resizeRgb(in, inS, inS, 30, 30)
    // left border ≈ 0-ish, right border ≈ 255-ish, strictly monotone rows
    val row = out.slice(0, 30).map(_ & 0xff)
    assert(row.head < 16 && row.last > 239, s"border handling: ${row.head}..${row.last}")
    assert(row.zip(row.tail).forall { case (a, b) => a <= b }, "monotone gradient")
  }

  test("downscale then upscale of smooth content round-trips closely") {
    val inS = 64
    val in = Array.tabulate(inS * inS) { i =>
      val x = i % inS; val y = i / inS
      gray((127.5 + 100 * math.sin(x / 9.0) * math.cos(y / 11.0)).toInt)
    }
    val mid = PilResample.resizeRgb(in, inS, inS, 32, 32)
    val back = PilResample.resizeRgb(mid, 32, 32, inS, inS)
    val maxErr = in.zip(back).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr < 40, s"smooth round-trip error $maxErr")
  }
}
