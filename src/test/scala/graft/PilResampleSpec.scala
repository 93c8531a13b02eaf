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

  // ---- round-10 hardening: the strongest sandbox-feasible pins short
  // of Pillow itself (which neither the container nor the driver
  // tooling ships — PilResample scaladoc).

  /** Independent high-precision reference: the same scaled-support Keys
    * windows derived FROM SCRATCH here (not via PilResample.coeffs) in
    * Double with no fixed-point, two separable passes with a
    * round-and-clamp at the pass boundary exactly where the int path
    * quantizes — so any constant-, window- or rounding-level bug in the
    * fixed-point path shows up as a divergence beyond the ±1 quantum. */
  private def refResize(in: Array[Int], inW: Int, inH: Int,
                        outW: Int, outH: Int): Array[Int] = {
    def keys(x0: Double): Double = {
      val a = -0.5; val x = math.abs(x0)
      if (x < 1) ((a + 2) * x - (a + 3)) * x * x + 1
      else if (x < 2) (((x - 5) * x + 8) * x - 4) * a
      else 0.0
    }
    def windows(inSize: Int, outSize: Int): Array[(Int, Array[Double])] = {
      val scale = inSize.toDouble / outSize
      val fs = math.max(scale, 1.0)
      val support = 2.0 * fs
      Array.tabulate(outSize) { xx =>
        val center = (xx + 0.5) * scale
        val xmin = math.max(0, (center - support + 0.5).toInt)
        val xmax = math.min(inSize, (center + support + 0.5).toInt)
        val w = Array.tabulate(xmax - xmin)(x =>
          keys((x + xmin - center + 0.5) / fs))
        val s = w.sum
        (xmin, if (s != 0) w.map(_ / s) else w)
      }
    }
    def clampRound(v: Double): Int =
      math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    def pass(src: Array[Int], srcW: Int, srcH: Int, outSize: Int,
             horizontal: Boolean): Array[Int] = {
      val win = windows(if (horizontal) srcW else srcH, outSize)
      val (ow, oh) = if (horizontal) (outSize, srcH) else (srcW, outSize)
      val out = new Array[Int](ow * oh)
      for (o <- 0 until outSize; fixed <- 0 until (if (horizontal) srcH else srcW)) {
        val (mn, w) = win(o)
        var r = 0.0; var g = 0.0; var b = 0.0
        for (t <- w.indices) {
          val p = if (horizontal) src(fixed * srcW + mn + t)
                  else src((mn + t) * srcW + fixed)
          r += ((p >> 16) & 0xff) * w(t); g += ((p >> 8) & 0xff) * w(t)
          b += (p & 0xff) * w(t)
        }
        val idx = if (horizontal) fixed * ow + o else o * ow + fixed
        out(idx) = (clampRound(r) << 16) | (clampRound(g) << 8) | clampRound(b)
      }
      out
    }
    val h = if (outW == inW) in else pass(in, inW, inH, outW, horizontal = true)
    if (outH == inH) h else pass(h, outW, inH, outH, horizontal = false)
  }

  test("fixed-point path is within ±1 of the independent Double " +
      "reference on random images, every ratio class") {
    val rng = new scala.util.Random(20260815)
    for (((iw, ih), (ow, oh)) <- Seq(
        ((97, 61), (448, 448)),   // upscale both axes
        ((448, 448), (64, 37)),   // downscale both axes
        ((333, 217), (100, 300)), // mixed: down one axis, up the other
        ((448, 300), (448, 64)),  // one axis identity
        ((31, 29), (7, 5)))) {    // tiny, heavy clipping at borders
      val in = Array.fill(iw * ih)((rng.nextInt(256) << 16) |
        (rng.nextInt(256) << 8) | rng.nextInt(256))
      val got = PilResample.resizeRgb(in, iw, ih, ow, oh)
      val want = refResize(in, iw, ih, ow, oh)
      var worst = 0
      for (i <- got.indices; shift <- Seq(16, 8, 0)) {
        val d = math.abs(((got(i) >> shift) & 0xff) - ((want(i) >> shift) & 0xff))
        if (d > worst) worst = d
        assert(d <= 1,
          s"${iw}x$ih->${ow}x$oh px $i shift $shift: got ${(got(i) >> shift) & 0xff} want ${(want(i) >> shift) & 0xff}")
      }
      info(s"${iw}x$ih -> ${ow}x$oh worst channel delta $worst")
    }
  }

  test("every coefficient row sums to 1<<PRECISION_BITS within the " +
      "per-tap rounding budget (Pillow's normalization invariant)") {
    // float coefficients are normalized to sum exactly 1; each is then
    // rounded symmetrically to 22-bit fixed point, so a row of n taps
    // can drift at most n/2 units (plus 1 for the float normalization's
    // own epsilon) from 1 << 22 — anything beyond that means a
    // normalization or rounding bug that would tint flat fields
    val one = 1 << 22
    for ((inS, outS) <- Seq((448, 64), (64, 448), (1000, 7), (7, 1000),
        (448, 447), (13, 11), (2, 1), (1, 2))) {
      val (_, xmaxs, kk, ksize) = PilResample.coeffs(inS, outS)
      for (o <- 0 until outS) {
        val n = xmaxs(o)
        var s = 0L
        for (t <- 0 until n) s += kk(o * ksize + t)
        assert(math.abs(s - one) <= n / 2 + 1,
          s"$inS->$outS row $o: coeff sum $s vs $one over $n taps")
      }
    }
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
