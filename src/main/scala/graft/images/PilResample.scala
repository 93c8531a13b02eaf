package graft.images

/** Pillow's `ImagingResample` for 8-bit RGB, reimplemented from the
  * library's public algorithm (Pillow src/libImaging/Resample.c): a
  * SEPARABLE two-pass convolution — horizontal, then vertical — whose
  * filter support SCALES with the downscale ratio (this is the
  * antialiasing PIL always applies), using the same fixed-point
  * arithmetic (PRECISION_BITS = 32−8−2 integer coefficients, symmetric
  * rounding, the clip8 epilogue) so outputs are byte-comparable to
  * PIL's.
  *
  * Why it exists (r9 parity review): the reference preprocess resizes
  * with `image.resize(target, Image.BICUBIC)` (appV2.py:41). Java2D's
  * VALUE_INTERPOLATION_BICUBIC samples a FIXED 4×4 neighborhood
  * regardless of ratio — on a typical 4000×3000 → 448×448 downscale it
  * aliases (samples ~1 of every 9 source pixels), a systematic tensor
  * divergence from PIL, not float noise. Here the BICUBIC kernel
  * (Keys cubic, a = −0.5, base support 2.0) widens to
  * support × (in/out), exactly like PIL.
  *
  * Validation status: this container has no PIL to golden against
  * (README.md:10-12 — driver tooling has no Pillow either); the
  * algorithm, constants, rounding and pass order follow the published
  * implementation, and PilResampleSpec pins the provable invariants
  * (flat-field exactness, integer-grid identity, separability,
  * antialiased downscale of a 1-px checkerboard, PIL's xmin/xmax edge
  * clamping). Byte-equality goldens are one `PIL.Image.resize` run away
  * when an environment provides Pillow. */
object PilResample {

  // 8-bit pixel path: coefficients are int32 with this many fraction bits
  private val PrecisionBits = 32 - 8 - 2

  /** Keys bicubic, a = −0.5 (Pillow's BICUBIC filter), base support 2. */
  private def bicubicFilter(x0: Double): Double = {
    val a = -0.5
    val x = math.abs(x0)
    if (x < 1.0) ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    else if (x < 2.0) (((x - 5.0) * x + 8.0) * x - 4.0) * a
    else 0.0
  }
  private val SupportBase = 2.0

  /** Per-output-pixel convolution windows for one axis: PIL's
    * precompute_coeffs + normalize_coeffs_8bpc. Returns (xmin per out
    * pixel, tap count per out pixel, fixed-point coeffs laid out
    * out×ksize, ksize). */
  private[graft] def coeffs(inSize: Int, outSize: Int)
      : (Array[Int], Array[Int], Array[Int], Int) = {
    val scale = inSize.toDouble / outSize
    val filterscale = math.max(scale, 1.0)
    val support = SupportBase * filterscale
    val ksize = math.ceil(support).toInt * 2 + 1
    val xmins = new Array[Int](outSize)
    val xmaxs = new Array[Int](outSize)
    val kk = new Array[Int](outSize * ksize)
    val prekk = new Array[Double](ksize)
    val ss = 1.0 / filterscale
    var xx = 0
    while (xx < outSize) {
      val center = (xx + 0.5) * scale
      var xmin = (center - support + 0.5).toInt
      if (xmin < 0) xmin = 0
      var xmax = (center + support + 0.5).toInt
      if (xmax > inSize) xmax = inSize
      xmax -= xmin
      var ww = 0.0
      var x = 0
      while (x < xmax) {
        val w = bicubicFilter((x + xmin - center + 0.5) * ss)
        prekk(x) = w
        ww += w
        x += 1
      }
      x = 0
      while (x < xmax) {
        val k = if (ww != 0.0) prekk(x) / ww else prekk(x)
        // PIL's symmetric fixed-point rounding
        kk(xx * ksize + x) =
          if (k < 0) (-0.5 + k * (1 << PrecisionBits)).toInt
          else (0.5 + k * (1 << PrecisionBits)).toInt
        x += 1
      }
      xmins(xx) = xmin
      xmaxs(xx) = xmax
      xx += 1
    }
    (xmins, xmaxs, kk, ksize)
  }

  @inline private def clip8(in: Int): Int = {
    if (in >= (1 << PrecisionBits << 8)) 255
    else if (in <= 0) 0
    else in >> PrecisionBits
  }

  /** Resize a packed-RGB image (one 0xRRGGBB int per pixel, row-major).
    * Alpha is ignored (the tagger pipeline composites alpha over white
    * before resizing, like the reference). */
  def resizeRgb(in: Array[Int], inW: Int, inH: Int,
                outW: Int, outH: Int): Array[Int] = {
    require(in.length == inW * inH, "input size mismatch")
    require(outW > 0 && outH > 0, "bad output dims")
    // pass 1: horizontal (inW → outW), height unchanged
    val horiz =
      if (outW == inW) in
      else {
        val (xmins, xmaxs, kk, ksize) = coeffs(inW, outW)
        val out = new Array[Int](outW * inH)
        val half = 1 << (PrecisionBits - 1)
        var y = 0
        while (y < inH) {
          val rowIn = y * inW
          val rowOut = y * outW
          var xx = 0
          while (xx < outW) {
            val xmin = xmins(xx); val xmax = xmaxs(xx); val kOff = xx * ksize
            var r = half; var g = half; var b = half
            var x = 0
            while (x < xmax) {
              val p = in(rowIn + xmin + x)
              val k = kk(kOff + x)
              r += ((p >> 16) & 0xff) * k
              g += ((p >> 8) & 0xff) * k
              b += (p & 0xff) * k
              x += 1
            }
            out(rowOut + xx) = (clip8(r) << 16) | (clip8(g) << 8) | clip8(b)
            xx += 1
          }
          y += 1
        }
        out
      }
    // pass 2: vertical (inH → outH) over the horizontal result
    if (outH == inH) horiz
    else {
      val (ymins, ymaxs, kk, ksize) = coeffs(inH, outH)
      val out = new Array[Int](outW * outH)
      val half = 1 << (PrecisionBits - 1)
      var yy = 0
      while (yy < outH) {
        val ymin = ymins(yy); val ymax = ymaxs(yy); val kOff = yy * ksize
        val rowOut = yy * outW
        var x = 0
        while (x < outW) {
          var r = half; var g = half; var b = half
          var y = 0
          while (y < ymax) {
            val p = horiz((ymin + y) * outW + x)
            val k = kk(kOff + y)
            r += ((p >> 16) & 0xff) * k
            g += ((p >> 8) & 0xff) * k
            b += (p & 0xff) * k
            y += 1
          }
          out(rowOut + x) = (clip8(r) << 16) | (clip8(g) << 8) | clip8(b)
          x += 1
        }
        yy += 1
      }
      out
    }
  }
}
