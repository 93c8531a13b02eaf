package graft.images

/** ALPH-chunk (lossy-with-alpha) decoder, per the container spec's alpha
  * section and libwebp's dec/alpha_dec.c semantics. The reference tool
  * decodes such files through PIL/libwebp (appV2.py:167); this closes the
  * same surface for the pure-JVM path.
  *
  * Payload layout: one header byte — compression method (bits 0-1:
  * 0 = raw, 1 = headerless VP8L stream whose GREEN channel carries alpha),
  * filter (bits 2-3: none/horizontal/vertical/gradient, libwebp
  * dsp/filters.c), pre-processing (bits 4-5) — followed by the data.
  *
  * Pre-processing 1 ("reduced levels", emitted whenever the encoder ran
  * with alpha_quality<100) decodes IDENTICALLY to 0 here — and that IS
  * reference parity, not an approximation: libwebp's decoder treats the
  * flag as informational and only runs its level-smoothing pass
  * (WebPDequantizeLevels, utils/quant_levels_dec_utils.c) when the
  * caller opts in via WebPDecoderOptions.alpha_dithering_strength > 0,
  * which the simple WebPDecodeRGBA API — the path PIL and appV2.py:167
  * ride — never sets. The opt-in smoothing is still available as
  * [[dequantizeLevels]] for callers who want libwebp's dithered output. */
object Alpha {

  /** Decode to a w×h alpha plane (row-major, unsigned bytes). Throws
    * IllegalArgumentException on malformed/unsupported payloads — callers
    * route that to the error channel. */
  def decode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(payload.length >= 1, "empty ALPH chunk")
    require(w > 0 && h > 0, "bad alpha dimensions")
    val hdr = payload(0) & 0xff
    val method = hdr & 3
    val filter = (hdr >> 2) & 3
    val pre = (hdr >> 4) & 3
    // libwebp (alpha_dec.c ALPHInit) rejects non-zero reserved bits; match
    // it so status parity with the reference holds on bit-flipped bytes
    require((hdr >> 6) == 0, "non-zero ALPH reserved bits")
    require(method <= 1, s"invalid ALPH compression method $method")
    // pre-processing 2/3 are reserved (ALPHInit rejects them); 0 and 1
    // both decode as-is — see the class doc for why that matches libwebp
    require(pre <= 1, s"invalid ALPH pre-processing $pre")
    val raw =
      if (method == 0) {
        require(payload.length - 1 >= w * h, "ALPH raw payload too short")
        java.util.Arrays.copyOfRange(payload, 1, 1 + w * h)
      } else
        Vp8l.decodeAlphaStream(
          java.util.Arrays.copyOfRange(payload, 1, payload.length), w, h)
    unfilter(raw, w, h, filter)
    raw
  }

  /** In-place inverse of libwebp dsp/filters.c. All three filters predict
    * from already-reconstructed neighbors; the first pixel of a row falls
    * back per libwebp's unfilter kernels: horizontal seeds row starts from
    * the pixel above, vertical/gradient treat row 0 as horizontal. */
  private def unfilter(a: Array[Byte], w: Int, h: Int, filter: Int): Unit = {
    if (filter == 0) return
    @inline def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      if (y == 0 || filter == 1) {
        // horizontal (and every filter's row 0): pred = left, seeded by
        // the pixel directly above the row start (0 on row 0)
        var pred = if (y == 0) 0 else a(row - w) & 0xff
        while (x < w) {
          pred = (pred + a(row + x)) & 0xff
          a(row + x) = pred.toByte
          x += 1
        }
      } else if (filter == 2) { // vertical: pred = above
        while (x < w) {
          a(row + x) = ((a(row - w + x) & 0xff) + (a(row + x) & 0xff)).toByte
          x += 1
        }
      } else { // gradient: pred = clip(left + above - aboveleft)
        var left = ((a(row - w) & 0xff) + (a(row) & 0xff)) & 0xff
        a(row) = left.toByte
        x = 1
        while (x < w) {
          val top = a(row - w + x) & 0xff
          val topLeft = a(row - w + x - 1) & 0xff
          left = (clip255(left + top - topLeft) + (a(row + x) & 0xff)) & 0xff
          a(row + x) = left.toByte
          x += 1
        }
      }
      y += 1
    }
  }
}
