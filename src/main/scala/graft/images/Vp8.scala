package graft.images

/** Pure-JVM lossy WebP (VP8 keyframe) decoder — RFC 6386.
  *
  * WebP lossy payloads are VP8 intra-only keyframes (the container
  * allow-listed by the reference pipeline, appV2.py:17). This decoder
  * implements the keyframe subset of the public bitstream format: the
  * §7 boolean arithmetic decoder, §9 frame/segment/filter/quantizer
  * headers, §11 keyframe intra mode parsing, §13 DCT token decoding,
  * §14 dequantization + inverse WHT/DCT + intra prediction, and the
  * §15 in-loop deblocking filter (both normal and simple profiles).
  * Output is the bitstream-defined YUV 4:2:0 reconstruction — verified
  * byte-identical to libwebp's own `WebPDecodeYUV` on the committed
  * fixture corpus (WebPSpec) — plus the libwebp-compatible fancy
  * upsampling + fixed-point BT.601 conversion to RGB.
  *
  * Inter frames, golden/altref refresh, and the experimental profiles
  * are out of scope: a WebP still image is always a single keyframe.
  * All loops are bounded by header-declared macroblock counts and the
  * §7 decoder treats bytes past a truncated partition as zeros, so
  * corrupt input degrades to IllegalArgumentException or garbage
  * pixels bounded in size — never a hang (the R16 error-channel
  * contract, appV2.py:165-185).
  */
object Vp8 {

  /** Bitstream-defined planar YUV 4:2:0 output, already cropped to the
    * visible width/height (planes are decoded at macroblock granularity
    * and trimmed). */
  final case class Planes(width: Int, height: Int,
                          y: Array[Byte], u: Array[Byte], v: Array[Byte]) {
    def uvWidth: Int = (width + 1) / 2
    def uvHeight: Int = (height + 1) / 2
  }

  /** RIFF walk: the VP8 (lossy) chunk payload, looking through a VP8X
    * extended container if present. None for lossless-only files.
    * Delegates to [[WebPContainer.findChunk]] — the one hardened walk. */
  def vp8Chunk(b: Array[Byte]): Option[Array[Byte]] =
    WebPContainer.findChunk(b, "VP8 ")

  def isVp8(fileBytes: Array[Byte]): Boolean = vp8Chunk(fileBytes).isDefined

  /** Decode a WebP container's lossy payload to YUV planes. */
  def decode(fileBytes: Array[Byte]): Planes = {
    val chunk = vp8Chunk(fileBytes).getOrElse(
      throw new IllegalArgumentException("no VP8 chunk"))
    decodeFrame(chunk)
  }

  /** Decode a bare VP8 chunk payload (no RIFF walk) — the form a chunk
    * takes inside an ANMF animation frame. */
  def decodePayload(payload: Array[Byte]): Planes = decodeFrame(payload)

  // ------------------------------------------------------ bool decoder

  /** §7.3 boolean arithmetic decoder. Reads past the partition end are
    * virtual zeros (the encoder's final flush legitimately leaves the
    * last bits implicit); every caller loop is macroblock-bounded so a
    * truncated stream decodes to bounded garbage, never a hang. */
  private final class Bool(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = (nextByte() << 8) | nextByte()
    private var bitCount = 0

    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v } else 0

    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    def flag(): Int = bit(128)

    /** n-bit unsigned literal, MSB first (§7.4). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }

    /** literal value followed by a sign bit (§9.3). */
    def signed(n: Int): Int = {
      val v = literal(n)
      if (bit(128) == 1) -v else v
    }

    /** §8.1 tree reader: node indices are positive, leaves are the
      * negated symbol (zero or negative — the root at index 0 is never
      * a child, so 0 unambiguously encodes symbol 0). */
    def tree(t: Array[Int], probs: Array[Int], startAt: Int = 0): Int = {
      var i = startAt
      while (true) {
        i = t(i + bit(probs(i >> 1)))
        if (i <= 0) return -i
      }
      0 // unreachable
    }
  }

  // -------------------------------------------------- static constants

  // intra 16x16 modes (§11.2): DC, V, H, TM, B(=split into 4x4)
  private final val YDC = 0
  private final val YV = 1
  private final val YH = 2
  private final val YTM = 3
  private final val YB = 4

  private val kfYModeTree = Array(-YB, 2, 4, 6, -YDC, -YV, -YH, -YTM)
  private val kfYModeProbs = Array(145, 156, 163, 128)
  private val uvModeTree = Array(-YDC, 2, -YV, 4, -YH, -YTM)
  private val kfUvModeProbs = Array(142, 114, 183)

  // 4x4 sub-modes (§11.2): DC, TM, VE, HE, LD, RD, VR, VL, HD, HU
  private val bModeTree = Array(
    0 /* -B_DC */ , 2, -1, 4, -2, 6, 8, 12,
    -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  // ymode -> implied uniform 4x4 mode for neighbor context (§11.3)
  private val impliedBMode = Array(0 /*DC*/ , 2 /*VE*/ , 3 /*HE*/ , 1 /*TM*/ )

  // token decoding (§13.2-13.3)
  private val kBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0)
  private val kZigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val kCat3 = Array(173, 148, 140)
  private val kCat4 = Array(176, 155, 140, 135)
  private val kCat5 = Array(180, 157, 141, 134, 130)
  private val kCat6 =
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)
  private val kCats = Array(kCat3, kCat4, kCat5, kCat6)

  // -------------------------------------------------------- frame data

  private final class Header {
    var mbW = 0
    var mbH = 0
    // segmentation (§9.3)
    var segEnabled = false
    var segUpdateMap = false
    var segAbsolute = false
    val segQuant = new Array[Int](4)
    val segFilter = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    // loop filter (§9.4)
    var filterSimple = false
    var filterLevel = 0
    var sharpness = 0
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    // quantizer (§9.6): per-segment matrices [y1dc,y1ac,y2dc,y2ac,uvdc,uvac]
    val quant = Array.ofDim[Int](4, 6)
    // token probabilities [plane][band][ctx][11]
    val probs = Array.ofDim[Int](4, 8, 3, 11)
    var useSkipProb = false
    var skipProb = 0
  }

  private def clip127(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  private def decodeFrame(d: Array[Byte]): Planes = {
    if (d.length < 10) throw new IllegalArgumentException("VP8 chunk too short")
    val tag = (d(0) & 0xff) | ((d(1) & 0xff) << 8) | ((d(2) & 0xff) << 16)
    if ((tag & 1) != 0)
      throw new IllegalArgumentException("VP8 inter frame in a still image")
    val part1Len = tag >>> 5
    if ((d(3) & 0xff) != 0x9d || (d(4) & 0xff) != 0x01 || (d(5) & 0xff) != 0x2a)
      throw new IllegalArgumentException("bad VP8 keyframe start code")
    val width = ((d(6) & 0xff) | ((d(7) & 0xff) << 8)) & 0x3fff
    val height = ((d(8) & 0xff) | ((d(9) & 0xff) << 8)) & 0x3fff
    if (width == 0 || height == 0)
      throw new IllegalArgumentException("zero VP8 dimensions")
    // decompression-bomb guard, REFERENCE PARITY: PIL errors above
    // 2 × MAX_IMAGE_PIXELS = 178,956,970 px — hostile header bytes must
    // not buy a multi-hundred-MB plane allocation on an executor (R16)
    if (width.toLong * height > 178956970L)
      throw new IllegalArgumentException(
        s"decompression bomb: ${width}x$height exceeds the 178.9 Mpx limit")
    if (10L + part1Len > d.length)
      throw new IllegalArgumentException("first partition overruns chunk")

    val hd = new Header
    hd.mbW = (width + 15) >> 4
    hd.mbH = (height + 15) >> 4
    val br = new Bool(d, 10, 10 + part1Len)

    br.literal(1) // color space (must be 0; tolerated)
    br.literal(1) // clamping type (reconstruction always clamps here)

    // --- segmentation header (§9.3)
    hd.segEnabled = br.flag() == 1
    if (hd.segEnabled) {
      hd.segUpdateMap = br.flag() == 1
      val updateData = br.flag() == 1
      if (updateData) {
        hd.segAbsolute = br.flag() == 1
        var i = 0
        while (i < 4) {
          hd.segQuant(i) = if (br.flag() == 1) br.signed(7) else 0; i += 1
        }
        i = 0
        while (i < 4) {
          hd.segFilter(i) = if (br.flag() == 1) br.signed(6) else 0; i += 1
        }
      }
      if (hd.segUpdateMap) {
        var i = 0
        while (i < 3) {
          hd.segTreeProbs(i) = if (br.flag() == 1) br.literal(8) else 255
          i += 1
        }
      }
    }

    // --- loop filter header (§9.4)
    hd.filterSimple = br.literal(1) == 1
    hd.filterLevel = br.literal(6)
    hd.sharpness = br.literal(3)
    hd.lfDeltaEnabled = br.flag() == 1
    if (hd.lfDeltaEnabled && br.flag() == 1) {
      var i = 0
      while (i < 4) {
        if (br.flag() == 1) hd.refLfDelta(i) = br.signed(6); i += 1
      }
      i = 0
      while (i < 4) {
        if (br.flag() == 1) hd.modeLfDelta(i) = br.signed(6); i += 1
      }
    }

    // --- token partitions (§9.5)
    val nParts = 1 << br.literal(2)
    val partBase = 10 + part1Len
    val sizesLen = 3 * (nParts - 1)
    if (partBase + sizesLen > d.length)
      throw new IllegalArgumentException("partition size table overruns chunk")
    val partBr = new Array[Bool](nParts)
    var pOff = partBase + sizesLen
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi < nParts - 1) {
          val o = partBase + 3 * pi
          (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) | ((d(o + 2) & 0xff) << 16)
        } else d.length - pOff
      if (sz < 0 || pOff > d.length)
        throw new IllegalArgumentException("token partition overruns chunk")
      partBr(pi) = new Bool(d, pOff, math.min(pOff.toLong + sz, d.length).toInt)
      pOff += sz
      pi += 1
    }

    // --- quantizer header (§9.6, §14.1)
    val yAcQi = br.literal(7)
    def qDelta(): Int = if (br.flag() == 1) br.signed(4) else 0
    val y1dcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    var s = 0
    while (s < 4) {
      val q =
        if (!hd.segEnabled) yAcQi
        else if (hd.segAbsolute) hd.segQuant(s)
        else yAcQi + hd.segQuant(s)
      val qc = clip127(q)
      val m = hd.quant(s)
      m(0) = Vp8Tables.dcQuant(clip127(qc + y1dcD))
      m(1) = Vp8Tables.acQuant(qc)
      m(2) = Vp8Tables.dcQuant(clip127(qc + y2dcD)) * 2
      m(3) = math.max(8, Vp8Tables.acQuant(clip127(qc + y2acD)) * 155 / 100)
      // chroma DC clamps the quantizer INDEX at 117 (→ table value 132),
      // not the dequant value (libwebp quant_dec.c: kDcTable[clip(q, 117)])
      m(4) = Vp8Tables.dcQuant(math.min(117, clip127(qc + uvdcD)))
      m(5) = Vp8Tables.acQuant(clip127(qc + uvacD))
      s += 1
    }

    br.flag() // refresh_entropy_probs: keyframe state never persists here

    // --- token probability updates (§13.4)
    var p = 0
    var idx = 0
    while (p < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var t = 0
          while (t < 11) {
            val up = Vp8Tables.coeffUpdateProbs(idx) & 0xff
            hd.probs(p)(b)(c)(t) =
              if (br.bit(up) == 1) br.literal(8)
              else Vp8Tables.coeffProbs(idx) & 0xff
            idx += 1
            t += 1
          }
          c += 1
        }
        b += 1
      }
      p += 1
    }

    hd.useSkipProb = br.flag() == 1
    if (hd.useSkipProb) hd.skipProb = br.literal(8)

    // --- per-MB intra modes, whole frame, still partition 1 (§11)
    val mbW = hd.mbW
    val mbH = hd.mbH
    val nMb = mbW * mbH
    val mbSegment = new Array[Byte](nMb)
    val mbSkip = new Array[Boolean](nMb)
    val mbYMode = new Array[Byte](nMb)
    val mbUvMode = new Array[Byte](nMb)
    val mbBModes = new Array[Byte](nMb * 16)
    // neighbor sub-mode context rows: above per MB column, left per row
    val aboveB = Array.fill[Byte](mbW * 4)(0)
    val leftB = new Array[Byte](4)
    var my = 0
    while (my < mbH) {
      java.util.Arrays.fill(leftB, 0.toByte)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        if (hd.segUpdateMap) {
          val p0 = hd.segTreeProbs(0)
          val sid =
            if (br.bit(p0) == 1) 2 + br.bit(hd.segTreeProbs(2))
            else br.bit(hd.segTreeProbs(1))
          mbSegment(mi) = sid.toByte
        }
        if (hd.useSkipProb) mbSkip(mi) = br.bit(hd.skipProb) == 1
        val ym = br.tree(kfYModeTree, kfYModeProbs)
        mbYMode(mi) = ym.toByte
        if (ym == YB) {
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val above =
              if (r == 0) aboveB(mx * 4 + c) else mbBModes(mi * 16 + sb - 4)
            val left =
              if (c == 0) leftB(r) else mbBModes(mi * 16 + sb - 1)
            val po = ((above * 10) + left) * 9
            val probs9 = new Array[Int](9)
            var k = 0
            while (k < 9) {
              probs9(k) = Vp8Tables.kfBModeProbs(po + k) & 0xff; k += 1
            }
            mbBModes(mi * 16 + sb) = br.tree(bModeTree, probs9).toByte
            sb += 1
          }
        } else {
          val imp = impliedBMode(ym).toByte
          java.util.Arrays.fill(mbBModes, mi * 16, mi * 16 + 16, imp)
        }
        mbUvMode(mi) = br.tree(uvModeTree, kfUvModeProbs).toByte
        var k = 0
        while (k < 4) {
          aboveB(mx * 4 + k) = mbBModes(mi * 16 + 12 + k)
          leftB(k) = mbBModes(mi * 16 + 4 * k + 3)
          k += 1
        }
        mx += 1
      }
      my += 1
    }

    // --- residuals + reconstruction ------------------------------------
    // planes are MB-padded with a one-pixel top border row and a 4-px
    // left border column; reconstruction runs unfiltered (intra
    // prediction is defined on pre-loop-filter neighbors), the loop
    // filter then runs over the finished frame — equivalent to the
    // row-pipelined reference order.
    val w16 = mbW * 16
    val h16 = mbH * 16
    val w8 = mbW * 8
    val h8 = mbH * 8
    val yStride = w16 + 8 // 4 left border, 4 top-right margin
    val uvStride = w8 + 8
    val yP = new Array[Byte](yStride * (h16 + 1))
    val uP = new Array[Byte](uvStride * (h8 + 1))
    val vP = new Array[Byte](uvStride * (h8 + 1))
    // top border row: 127 (§12.2 off-frame above); left border: 129,
    // with the 127 corner from the above row (reference border setup)
    java.util.Arrays.fill(yP, 0, yStride, 127.toByte)
    java.util.Arrays.fill(uP, 0, uvStride, 127.toByte)
    java.util.Arrays.fill(vP, 0, uvStride, 127.toByte)
    var row = 1
    while (row <= h16) {
      yP(row * yStride) = 129.toByte; yP(row * yStride + 1) = 129.toByte
      yP(row * yStride + 2) = 129.toByte; yP(row * yStride + 3) = 129.toByte
      row += 1
    }
    row = 1
    while (row <= h8) {
      uP(row * uvStride) = 129.toByte; uP(row * uvStride + 1) = 129.toByte
      uP(row * uvStride + 2) = 129.toByte; uP(row * uvStride + 3) = 129.toByte
      vP(row * uvStride) = 129.toByte; vP(row * uvStride + 1) = 129.toByte
      vP(row * uvStride + 2) = 129.toByte; vP(row * uvStride + 3) = 129.toByte
      row += 1
    }
    @inline def yAt(x: Int, yy: Int): Int = (yy + 1) * yStride + (x + 4)
    @inline def uvAt(x: Int, yy: Int): Int = (yy + 1) * uvStride + (x + 4)

    // nonzero contexts for token decoding: above per MB column, left
    // per MB; layout per MB: y(4) + u(2) + v(2) + y2(1)
    val aboveNz = new Array[Byte](mbW * 9)
    val leftNz = new Array[Byte](9)
    val coeffs = new Array[Int](25 * 16) // 16 Y + 4 U + 4 V + 1 Y2
    val mbHasCoeffs = new Array[Boolean](nMb)

    my = 0
    while (my < mbH) {
      val tbr = partBr(my % nParts)
      java.util.Arrays.fill(leftNz, 0.toByte)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        val seg = mbSegment(mi) & 0xff
        val qm = hd.quant(seg)
        val isB = mbYMode(mi) == YB
        java.util.Arrays.fill(coeffs, 0)
        var anyNz = false

        if (mbSkip(mi)) {
          var k = 0
          while (k < 8) {
            aboveNz(mx * 9 + k) = 0; leftNz(k) = 0; k += 1
          }
          if (!isB) { aboveNz(mx * 9 + 8) = 0; leftNz(8) = 0 }
        } else {
          // Y2 block (§13.3: present unless the MB is 4x4-predicted)
          if (!isB) {
            val ctx = (aboveNz(mx * 9 + 8) + leftNz(8))
            val nz = decodeCoeffs(tbr, hd.probs(1), ctx, 0,
              qm(2), qm(3), coeffs, 24 * 16)
            val f: Byte = if (nz > 0) 1 else 0
            aboveNz(mx * 9 + 8) = f; leftNz(8) = f
            if (nz > 0) anyNz = true
          }
          val yPlane = if (isB) 3 else 0
          val first = if (isB) 0 else 1
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx = aboveNz(mx * 9 + c) + leftNz(r)
            val nz = decodeCoeffs(tbr, hd.probs(yPlane), ctx, first,
              qm(0), qm(1), coeffs, sb * 16)
            val f: Byte = if (nz > first) 1 else 0
            aboveNz(mx * 9 + c) = f
            leftNz(r) = f
            if (f == 1) anyNz = true
            sb += 1
          }
          var pl = 0
          while (pl < 2) { // U then V
            var sub = 0
            while (sub < 4) {
              val r = sub >> 1
              val c = sub & 1
              val ai = mx * 9 + 4 + pl * 2 + c
              val li = 4 + pl * 2 + r
              val ctx = aboveNz(ai) + leftNz(li)
              val nz = decodeCoeffs(tbr, hd.probs(2), ctx, 0,
                qm(4), qm(5), coeffs, (16 + pl * 4 + sub) * 16)
              val f: Byte = if (nz > 0) 1 else 0
              aboveNz(ai) = f
              leftNz(li) = f
              if (nz > 0) anyNz = true
              sub += 1
            }
            pl += 1
          }
        }
        mbHasCoeffs(mi) = anyNz

        // ---- reconstruction (§12, §14)
        if (!isB) {
          // inverse WHT scatters the second-order DC into each Y block
          inverseWht(coeffs, 24 * 16)
          var k = 0
          while (k < 16) { coeffs(k * 16) = coeffs(24 * 16 + k); k += 1 }
        }
        val x0 = mx * 16
        val y0 = my * 16
        if (isB) {
          // MB-level above-right, replicated down for rows > 0 (§12.3)
          val tr = new Array[Int](4)
          var k = 0
          while (k < 4) {
            tr(k) =
              if (mx == mbW - 1) yP(yAt(x0 + 15, y0 - 1)) & 0xff
              else yP(yAt(x0 + 16 + k, y0 - 1)) & 0xff
            k += 1
          }
          var sb = 0
          while (sb < 16) {
            val sx = x0 + (sb & 3) * 4
            val sy = y0 + (sb >> 2) * 4
            predict4(yP, yStride, yAt(sx, sy), mbBModes(mi * 16 + sb),
              useMbTr = (sb & 3) == 3, tr)
            idctAdd(coeffs, sb * 16, yP, yAt(sx, sy), yStride)
            sb += 1
          }
        } else {
          predictSquare(yP, yStride, yAt(x0, y0), mbYMode(mi), 16,
            hasAbove = my > 0, hasLeft = mx > 0)
          var sb = 0
          while (sb < 16) {
            val sx = x0 + (sb & 3) * 4
            val sy = y0 + (sb >> 2) * 4
            idctAdd(coeffs, sb * 16, yP, yAt(sx, sy), yStride)
            sb += 1
          }
        }
        val cx0 = mx * 8
        val cy0 = my * 8
        predictSquare(uP, uvStride, uvAt(cx0, cy0), mbUvMode(mi), 8,
          hasAbove = my > 0, hasLeft = mx > 0)
        predictSquare(vP, uvStride, uvAt(cx0, cy0), mbUvMode(mi), 8,
          hasAbove = my > 0, hasLeft = mx > 0)
        var sub = 0
        while (sub < 4) {
          val sx = cx0 + (sub & 1) * 4
          val sy = cy0 + (sub >> 1) * 4
          idctAdd(coeffs, (16 + sub) * 16, uP, uvAt(sx, sy), uvStride)
          idctAdd(coeffs, (20 + sub) * 16, vP, uvAt(sx, sy), uvStride)
          sub += 1
        }
        mx += 1
      }
      my += 1
    }

    // --- loop filter (§15) over the finished frame
    if (hd.filterLevel > 0)
      loopFilter(hd, mbSegment, mbYMode, mbHasCoeffs,
        yP, yStride, uP, vP, uvStride)

    // crop MB padding and borders
    val outY = new Array[Byte](width * height)
    var yy = 0
    while (yy < height) {
      System.arraycopy(yP, yAt(0, yy), outY, yy * width, width)
      yy += 1
    }
    val uvW = (width + 1) / 2
    val uvH = (height + 1) / 2
    val outU = new Array[Byte](uvW * uvH)
    val outV = new Array[Byte](uvW * uvH)
    yy = 0
    while (yy < uvH) {
      System.arraycopy(uP, uvAt(0, yy), outU, yy * uvW, uvW)
      System.arraycopy(vP, uvAt(0, yy), outV, yy * uvW, uvW)
      yy += 1
    }
    Planes(width, height, outY, outU, outV)
  }

  // ------------------------------------------------------ coefficients

  /** §13.3 token decode of one 4x4 block into `out(off + zigzag)`,
    * dequantized. Returns the scan position after the last nonzero
    * coefficient (== `first` for an empty block). */
  private def decodeCoeffs(br: Bool, probs: Array[Array[Array[Int]]],
                           ctx0: Int, first: Int, dqDc: Int, dqAc: Int,
                           out: Array[Int], off: Int): Int = {
    var n = first
    var p = probs(kBands(n))(ctx0)
    while (n < 16) {
      if (br.bit(p(0)) == 0) return n // EOB
      while (br.bit(p(1)) == 0) { // zero token, then re-read in ctx 0
        n += 1
        if (n == 16) return 16
        p = probs(kBands(n))(0)
      }
      var v = 0
      var nextCtx = 2
      if (br.bit(p(2)) == 0) { v = 1; nextCtx = 1 }
      else {
        if (br.bit(p(3)) == 0) {
          if (br.bit(p(4)) == 0) v = 2
          else v = 3 + br.bit(p(5))
        } else {
          if (br.bit(p(6)) == 0) {
            if (br.bit(p(7)) == 0) v = 5 + br.bit(159)
            else v = 7 + 2 * br.bit(165) + br.bit(145)
          } else {
            val bit1 = br.bit(p(8))
            val bit0 = br.bit(p(9 + bit1))
            val cat = 2 * bit1 + bit0
            val tab = kCats(cat)
            var e = 0
            var k = 0
            while (k < tab.length) { e += e + br.bit(tab(k)); k += 1 }
            v = e + 3 + (8 << cat)
          }
        }
      }
      if (br.flag() == 1) v = -v
      // the reference coefficient domain is int16 (RFC reference decoder
      // and libwebp both store dequantized coefficients in short) — wrap
      // identically so adversarial value×quant products stay bit-exact
      out(off + kZigzag(n)) =
        (v * (if (n == 0) dqDc else dqAc)).toShort.toInt
      n += 1
      if (n < 16) p = probs(kBands(n))(nextCtx)
    }
    16
  }

  // -------------------------------------------------------- transforms

  /** §14.3 inverse Walsh-Hadamard (the Y2 second-order transform),
    * in place over 16 coefficients at `off`. */
  private def inverseWht(c: Array[Int], off: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = c(off + i) + c(off + 12 + i)
      val a1 = c(off + 4 + i) + c(off + 8 + i)
      val a2 = c(off + 4 + i) - c(off + 8 + i)
      val a3 = c(off + i) - c(off + 12 + i)
      tmp(i) = a0 + a1
      tmp(8 + i) = a0 - a1
      tmp(4 + i) = a3 + a2
      tmp(12 + i) = a3 - a2
      i += 1
    }
    i = 0
    while (i < 4) {
      val dc = tmp(4 * i) + 3
      val a0 = dc + tmp(4 * i + 3)
      val a1 = tmp(4 * i + 1) + tmp(4 * i + 2)
      val a2 = tmp(4 * i + 1) - tmp(4 * i + 2)
      val a3 = dc - tmp(4 * i + 3)
      c(off + 4 * i) = (a0 + a1) >> 3
      c(off + 4 * i + 1) = (a3 + a2) >> 3
      c(off + 4 * i + 2) = (a0 - a1) >> 3
      c(off + 4 * i + 3) = (a3 - a2) >> 3
      i += 1
    }
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** §14.4 inverse 4x4 DCT of `c(off..off+15)`, added into the plane. */
  private def idctAdd(c: Array[Int], off: Int,
                      plane: Array[Byte], dst: Int, stride: Int): Unit = {
    val C1 = 20091 // (cos(pi/8)*sqrt(2)-1) << 16
    val C2 = 35468 // sin(pi/8)*sqrt(2) << 16
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = c(off + i) + c(off + 8 + i)
      val b1 = c(off + i) - c(off + 8 + i)
      val t1 = (c(off + 4 + i) * C2) >> 16
      val t2 = c(off + 12 + i) + ((c(off + 12 + i) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = c(off + 4 + i) + ((c(off + 4 + i) * C1) >> 16)
      val t4 = (c(off + 12 + i) * C2) >> 16
      val d1 = t3 + t4
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val o = 4 * i
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      val t1 = (tmp(o + 1) * C2) >> 16
      val t2 = tmp(o + 3) + ((tmp(o + 3) * C1) >> 16)
      val c1 = t1 - t2
      val t3 = tmp(o + 1) + ((tmp(o + 1) * C1) >> 16)
      val t4 = (tmp(o + 3) * C2) >> 16
      val d1 = t3 + t4
      val base = dst + i * stride
      plane(base) = clip255((plane(base) & 0xff) + ((a1 + d1 + 4) >> 3)).toByte
      plane(base + 1) =
        clip255((plane(base + 1) & 0xff) + ((b1 + c1 + 4) >> 3)).toByte
      plane(base + 2) =
        clip255((plane(base + 2) & 0xff) + ((b1 - c1 + 4) >> 3)).toByte
      plane(base + 3) =
        clip255((plane(base + 3) & 0xff) + ((a1 - d1 + 4) >> 3)).toByte
      i += 1
    }
  }

  // --------------------------------------------------- intra predictors

  /** §12.2 DC/V/H/TM over an n×n block (16x16 luma / 8x8 chroma). The
    * 127-above / 129-left border sentinels in the plane make V, H and
    * TM read exactly the reference's off-frame values; only DC needs
    * explicit availability, because its DIVISOR depends on which sides
    * really exist (both: 2n values; one: n; neither: constant 128). */
  private def predictSquare(p: Array[Byte], stride: Int, dst: Int,
                            mode: Byte, n: Int,
                            hasAbove: Boolean, hasLeft: Boolean): Unit = {
    val aboveOff = dst - stride
    val leftOff = dst - 1
    mode match {
      case YDC =>
        var dc = 0
        if (hasAbove || hasLeft) {
          var cnt = 0
          var k = 0
          if (hasAbove) {
            while (k < n) { dc += p(aboveOff + k) & 0xff; k += 1 }
            cnt += n
          }
          if (hasLeft) {
            k = 0
            while (k < n) { dc += p(leftOff + k * stride) & 0xff; k += 1 }
            cnt += n
          }
          dc = (dc + cnt / 2) / cnt
        } else dc = 128
        var r = 0
        while (r < n) {
          java.util.Arrays.fill(p, dst + r * stride, dst + r * stride + n,
            dc.toByte)
          r += 1
        }
      case YV =>
        var r = 0
        while (r < n) {
          System.arraycopy(p, aboveOff, p, dst + r * stride, n); r += 1
        }
      case YH =>
        var r = 0
        while (r < n) {
          java.util.Arrays.fill(p, dst + r * stride, dst + r * stride + n,
            p(leftOff + r * stride))
          r += 1
        }
      case YTM =>
        val tl = p(aboveOff - 1) & 0xff
        var r = 0
        while (r < n) {
          val l = p(leftOff + r * stride) & 0xff
          var c = 0
          while (c < n) {
            p(dst + r * stride + c) =
              clip255(l + (p(aboveOff + c) & 0xff) - tl).toByte
            c += 1
          }
          r += 1
        }
      case _ => ()
    }
  }

  /** §12.3 4x4 luma sub-block prediction. `tr` is the macroblock-level
    * above-right (already resolved for frame edges); it applies to every
    * col-3 sub-block (rows > 0 replicate row 0's top-right). */
  private def predict4(p: Array[Byte], stride: Int, dst: Int, mode: Byte,
                       useMbTr: Boolean, tr: Array[Int]): Unit = {
    val a = new Array[Int](8) // above 4 + above-right 4
    val l = new Array[Int](4)
    val ao = dst - stride
    var k = 0
    while (k < 4) {
      a(k) = p(ao + k) & 0xff
      a(4 + k) = if (useMbTr) tr(k) else p(ao + 4 + k) & 0xff
      l(k) = p(dst - 1 + k * stride) & 0xff
      k += 1
    }
    val tl = p(ao - 1) & 0xff
    // E: l3 l2 l1 l0 tl a0 a1 a2 a3
    @inline def e(i: Int): Int = i match {
      case 0 => l(3); case 1 => l(2); case 2 => l(1); case 3 => l(0)
      case 4 => tl
      case i2 => a(i2 - 5)
    }
    @inline def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    @inline def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    @inline def set(r: Int, c: Int, v: Int): Unit =
      p(dst + r * stride + c) = v.toByte

    mode match {
      case 0 => // B_DC
        var sum = 4
        var i = 0
        while (i < 4) { sum += a(i) + l(i); i += 1 }
        val dc = (sum >> 3).toByte
        var r = 0
        while (r < 4) {
          java.util.Arrays.fill(p, dst + r * stride, dst + r * stride + 4, dc)
          r += 1
        }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, clip255(l(r) + a(c) - tl)); c += 1 }
          r += 1
        }
      case 2 => // B_VE: filtered above row
        val f0 = avg3(tl, a(0), a(1))
        val f1 = avg3(a(0), a(1), a(2))
        val f2 = avg3(a(1), a(2), a(3))
        val f3 = avg3(a(2), a(3), a(4))
        var r = 0
        while (r < 4) {
          set(r, 0, f0); set(r, 1, f1); set(r, 2, f2); set(r, 3, f3); r += 1
        }
      case 3 => // B_HE: filtered left column
        val f0 = avg3(tl, l(0), l(1))
        val f1 = avg3(l(0), l(1), l(2))
        val f2 = avg3(l(1), l(2), l(3))
        val f3 = avg3(l(2), l(3), l(3))
        var c = 0
        while (c < 4) {
          set(0, c, f0); set(1, c, f1); set(2, c, f2); set(3, c, f3); c += 1
        }
      case 4 => // B_LD (down-left)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val i = r + c
            set(r, c,
              if (i < 6) avg3(a(i), a(i + 1), a(i + 2))
              else avg3(a(6), a(7), a(7)))
            c += 1
          }
          r += 1
        }
      case 5 => // B_RD (down-right)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val i = 4 + c - r
            set(r, c, avg3(e(i - 1), e(i), e(i + 1)))
            c += 1
          }
          r += 1
        }
      case 6 => // B_VR (vertical-right)
        set(3, 0, avg3(e(1), e(2), e(3)))
        set(2, 0, avg3(e(2), e(3), e(4)))
        val v35 = avg3(e(3), e(4), e(5)); set(3, 1, v35); set(1, 0, v35)
        val v45 = avg2(e(4), e(5)); set(2, 1, v45); set(0, 0, v45)
        val v46 = avg3(e(4), e(5), e(6)); set(3, 2, v46); set(1, 1, v46)
        val v56 = avg2(e(5), e(6)); set(2, 2, v56); set(0, 1, v56)
        val v57 = avg3(e(5), e(6), e(7)); set(3, 3, v57); set(1, 2, v57)
        val v67 = avg2(e(6), e(7)); set(2, 3, v67); set(0, 2, v67)
        set(1, 3, avg3(e(6), e(7), e(8)))
        set(0, 3, avg2(e(7), e(8)))
      case 7 => // B_VL (vertical-left)
        set(0, 0, avg2(a(0), a(1)))
        set(1, 0, avg3(a(0), a(1), a(2)))
        val x12 = avg2(a(1), a(2)); set(2, 0, x12); set(0, 1, x12)
        val x123 = avg3(a(1), a(2), a(3)); set(3, 0, x123); set(1, 1, x123)
        val x23 = avg2(a(2), a(3)); set(2, 1, x23); set(0, 2, x23)
        val x234 = avg3(a(2), a(3), a(4)); set(3, 1, x234); set(1, 2, x234)
        val x34 = avg2(a(3), a(4)); set(2, 2, x34); set(0, 3, x34)
        val x345 = avg3(a(3), a(4), a(5)); set(3, 2, x345); set(1, 3, x345)
        set(2, 3, avg3(a(4), a(5), a(6)))
        set(3, 3, avg3(a(5), a(6), a(7)))
      case 8 => // B_HD (horizontal-down)
        set(3, 0, avg2(e(0), e(1)))
        set(3, 1, avg3(e(0), e(1), e(2)))
        val h12 = avg2(e(1), e(2)); set(2, 0, h12); set(3, 2, h12)
        val h123 = avg3(e(1), e(2), e(3)); set(2, 1, h123); set(3, 3, h123)
        val h23 = avg2(e(2), e(3)); set(2, 2, h23); set(1, 0, h23)
        val h234 = avg3(e(2), e(3), e(4)); set(2, 3, h234); set(1, 1, h234)
        val h34 = avg2(e(3), e(4)); set(1, 2, h34); set(0, 0, h34)
        val h345 = avg3(e(3), e(4), e(5)); set(1, 3, h345); set(0, 1, h345)
        set(0, 2, avg3(e(4), e(5), e(6)))
        set(0, 3, avg3(e(5), e(6), e(7)))
      case _ => // B_HU (horizontal-up)
        set(0, 0, avg2(l(0), l(1)))
        set(0, 1, avg3(l(0), l(1), l(2)))
        val u12 = avg2(l(1), l(2)); set(0, 2, u12); set(1, 0, u12)
        val u123 = avg3(l(1), l(2), l(3)); set(0, 3, u123); set(1, 1, u123)
        val u23 = avg2(l(2), l(3)); set(1, 2, u23); set(2, 0, u23)
        val u233 = avg3(l(2), l(3), l(3)); set(1, 3, u233); set(2, 1, u233)
        set(2, 2, l(3)); set(2, 3, l(3))
        set(3, 0, l(3)); set(3, 1, l(3)); set(3, 2, l(3)); set(3, 3, l(3))
    }
  }

  // ---------------------------------------------------------- loop filter
  private def loopFilter(hd: Header, mbSegment: Array[Byte],
                         mbYMode: Array[Byte], mbHasCoeffs: Array[Boolean],
                         yP: Array[Byte], yStride: Int,
                         uP: Array[Byte], vP: Array[Byte],
                         uvStride: Int): Unit = {
    val mbW = hd.mbW
    val mbH = hd.mbH
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        val seg = mbSegment(mi) & 0xff
        var level =
          if (!hd.segEnabled) hd.filterLevel
          else if (hd.segAbsolute) hd.segFilter(seg)
          else hd.filterLevel + hd.segFilter(seg)
        if (hd.lfDeltaEnabled) {
          level += hd.refLfDelta(0) // keyframe: always the intra frame
          if (mbYMode(mi) == YB) level += hd.modeLfDelta(0)
        }
        level = if (level < 0) 0 else if (level > 63) 63 else level
        if (level > 0) {
          var ilevel = level
          if (hd.sharpness > 0) {
            ilevel >>= (if (hd.sharpness > 4) 2 else 1)
            val cap = 9 - hd.sharpness
            if (ilevel > cap) ilevel = cap
          }
          if (ilevel < 1) ilevel = 1
          val hev =
            if (level >= 40) 2 else if (level >= 15) 1 else 0 // keyframe
          val tSb = 2 * level + ilevel
          val tMb = tSb + 4
          val inner = mbHasCoeffs(mi) || mbYMode(mi) == YB
          val yDst = (my * 16 + 1) * yStride + (mx * 16 + 4)
          val uvDst = (my * 8 + 1) * uvStride + (mx * 8 + 4)
          if (hd.filterSimple) {
            if (mx > 0) simpleEdge(yP, yDst, 1, yStride, 16, tMb)
            if (inner) {
              simpleEdge(yP, yDst + 4, 1, yStride, 16, tSb)
              simpleEdge(yP, yDst + 8, 1, yStride, 16, tSb)
              simpleEdge(yP, yDst + 12, 1, yStride, 16, tSb)
            }
            if (my > 0) simpleEdge(yP, yDst, yStride, 1, 16, tMb)
            if (inner) {
              simpleEdge(yP, yDst + 4 * yStride, yStride, 1, 16, tSb)
              simpleEdge(yP, yDst + 8 * yStride, yStride, 1, 16, tSb)
              simpleEdge(yP, yDst + 12 * yStride, yStride, 1, 16, tSb)
            }
          } else {
            if (mx > 0) {
              mbEdge(yP, yDst, 1, yStride, 16, tMb, ilevel, hev)
              mbEdge(uP, uvDst, 1, uvStride, 8, tMb, ilevel, hev)
              mbEdge(vP, uvDst, 1, uvStride, 8, tMb, ilevel, hev)
            }
            if (inner) {
              var o = 4
              while (o < 16) {
                sbEdge(yP, yDst + o, 1, yStride, 16, tSb, ilevel, hev)
                o += 4
              }
              sbEdge(uP, uvDst + 4, 1, uvStride, 8, tSb, ilevel, hev)
              sbEdge(vP, uvDst + 4, 1, uvStride, 8, tSb, ilevel, hev)
            }
            if (my > 0) {
              mbEdge(yP, yDst, yStride, 1, 16, tMb, ilevel, hev)
              mbEdge(uP, uvDst, uvStride, 1, 8, tMb, ilevel, hev)
              mbEdge(vP, uvDst, uvStride, 1, 8, tMb, ilevel, hev)
            }
            if (inner) {
              var o = 4
              while (o < 16) {
                sbEdge(yP, yDst + o * yStride, yStride, 1, 16, tSb, ilevel,
                  hev)
                o += 4
              }
              sbEdge(uP, uvDst + 4 * uvStride, uvStride, 1, 8, tSb, ilevel,
                hev)
              sbEdge(vP, uvDst + 4 * uvStride, uvStride, 1, 8, tSb, ilevel,
                hev)
            }
          }
        }
        mx += 1
      }
      my += 1
    }
  }

  @inline private def sclip(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v
  @inline private def u2s(p: Array[Byte], i: Int): Int = (p(i) & 0xff) - 128
  @inline private def s2u(p: Array[Byte], i: Int, v: Int): Unit =
    p(i) = (sclip(v) + 128).toByte

  /** §15.4 common 4-tap adjustment of p0/q0; returns the outer delta. */
  private def adjust(p: Array[Byte], i: Int, step: Int,
                     useOuter: Boolean): Int = {
    val p1 = u2s(p, i - 2 * step); val p0 = u2s(p, i - step)
    val q0 = u2s(p, i); val q1 = u2s(p, i + step)
    val a = sclip((if (useOuter) sclip(p1 - q1) else 0) + 3 * (q0 - p0))
    val f1 = sclip(a + 4) >> 3
    val f2 = sclip(a + 3) >> 3
    s2u(p, i, q0 - f1)
    s2u(p, i - step, p0 + f2)
    f1
  }

  @inline private def simpleMask(p: Array[Byte], i: Int, step: Int,
                                 t: Int): Boolean = {
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    2 * math.abs(p0 - q0) + (math.abs(p1 - q1) >> 1) <= t
  }

  @inline private def normalMask(p: Array[Byte], i: Int, step: Int,
                                 t: Int, it: Int): Boolean = {
    @inline def d(a: Int, b: Int): Int =
      math.abs((p(i + a * step) & 0xff) - (p(i + b * step) & 0xff))
    simpleMask(p, i, step, t) &&
      d(-4, -3) <= it && d(-3, -2) <= it && d(-2, -1) <= it &&
      d(1, 0) <= it && d(2, 1) <= it && d(3, 2) <= it
  }

  @inline private def isHev(p: Array[Byte], i: Int, step: Int,
                            t: Int): Boolean = {
    math.abs((p(i - 2 * step) & 0xff) - (p(i - step) & 0xff)) > t ||
      math.abs((p(i + step) & 0xff) - (p(i) & 0xff)) > t
  }

  /** §15.1 simple filter along one edge. */
  private def simpleEdge(p: Array[Byte], base: Int, step: Int, lineStep: Int,
                         count: Int, t: Int): Unit = {
    var k = 0
    while (k < count) {
      val i = base + k * lineStep
      if (simpleMask(p, i, step, t)) adjust(p, i, step, useOuter = true)
      k += 1
    }
  }

  /** §15.3 normal sub-block edge filter. */
  private def sbEdge(p: Array[Byte], base: Int, step: Int, lineStep: Int,
                     count: Int, t: Int, it: Int, hevT: Int): Unit = {
    var k = 0
    while (k < count) {
      val i = base + k * lineStep
      if (normalMask(p, i, step, t, it)) {
        val hev = isHev(p, i, step, hevT)
        val a = adjust(p, i, step, useOuter = hev)
        if (!hev) {
          val d = (a + 1) >> 1
          s2u(p, i + step, u2s(p, i + step) - d)
          s2u(p, i - 2 * step, u2s(p, i - 2 * step) + d)
        }
      }
      k += 1
    }
  }

  /** §15.3 normal macroblock edge filter (6-tap wide variant). */
  private def mbEdge(p: Array[Byte], base: Int, step: Int, lineStep: Int,
                     count: Int, t: Int, it: Int, hevT: Int): Unit = {
    var k = 0
    while (k < count) {
      val i = base + k * lineStep
      if (normalMask(p, i, step, t, it)) {
        if (isHev(p, i, step, hevT)) adjust(p, i, step, useOuter = true)
        else {
          val p2 = u2s(p, i - 3 * step); val p1 = u2s(p, i - 2 * step)
          val p0 = u2s(p, i - step); val q0 = u2s(p, i)
          val q1 = u2s(p, i + step); val q2 = u2s(p, i + 2 * step)
          val w = sclip(sclip(p1 - q1) + 3 * (q0 - p0))
          val a0 = (27 * w + 63) >> 7
          s2u(p, i, q0 - a0); s2u(p, i - step, p0 + a0)
          val a1 = (18 * w + 63) >> 7
          s2u(p, i + step, q1 - a1); s2u(p, i - 2 * step, p1 + a1)
          val a2 = (9 * w + 63) >> 7
          s2u(p, i + 2 * step, q2 - a2); s2u(p, i - 3 * step, p2 + a2)
        }
      }
      k += 1
    }
  }

  // ------------------------------------------------- YUV -> RGB output

  /** libwebp-compatible fixed-point BT.601 conversion (dsp/yuv.h): the
    * 14-bit coefficients with the >>6 clip, matching WebPDecodeRGBA
    * exactly given identical YUV input. */
  @inline private def mulHi(v: Int, coeff: Int): Int = (v * coeff) >> 8
  @inline private def clip8(v: Int): Int = {
    val mask2 = (256 << 6) - 1
    if ((v & ~mask2) == 0) v >> 6 else if (v < 0) 0 else 255
  }
  @inline private def yuvToR(y: Int, v: Int): Int =
    clip8(mulHi(y, 19077) + mulHi(v, 26149) - 14234)
  @inline private def yuvToG(y: Int, u: Int, v: Int): Int =
    clip8(mulHi(y, 19077) - mulHi(u, 6419) - mulHi(v, 13320) + 8708)
  @inline private def yuvToB(y: Int, u: Int): Int =
    clip8(mulHi(y, 19077) + mulHi(u, 33050) - 17685)

  /** Fancy (bilinear) chroma upsampling + conversion to packed ARGB,
    * the libwebp default decode path (dsp/upsampling.c): chroma samples
    * sit on a half-pel-centered grid, each output pixel blends the four
    * surrounding chroma samples with (9,3,3,1)/16 weights via the
    * two-diagonal formulation; frame borders mirror the edge samples.
    * Byte-identical to WebPDecodeRGBA on the fixture goldens. */
  def toArgb(pl: Planes): Array[Int] = {
    val w = pl.width
    val h = pl.height
    val uvW = pl.uvWidth
    val out = new Array[Int](w * h)

    // one upsampled line pair; bottomY < 0 renders only the top line
    def linePair(topY: Int, bottomY: Int, topUv: Int, curUv: Int): Unit = {
      val lastPair = (w - 1) >> 1
      var tlU = pl.u(topUv * uvW) & 0xff
      var tlV = pl.v(topUv * uvW) & 0xff
      var lU = pl.u(curUv * uvW) & 0xff
      var lV = pl.v(curUv * uvW) & 0xff
      @inline def emit(row: Int, x: Int, u: Int, v: Int): Unit = {
        val y = pl.y(row * w + x) & 0xff
        out(row * w + x) = 0xff000000 |
          (yuvToR(y, v) << 16) | (yuvToG(y, u, v) << 8) | yuvToB(y, u)
      }
      emit(topY, 0, (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2)
      if (bottomY >= 0)
        emit(bottomY, 0, (3 * lU + tlU + 2) >> 2, (3 * lV + tlV + 2) >> 2)
      var x = 1
      while (x <= lastPair) {
        val tU = pl.u(topUv * uvW + x) & 0xff
        val tV = pl.v(topUv * uvW + x) & 0xff
        val cU = pl.u(curUv * uvW + x) & 0xff
        val cV = pl.v(curUv * uvW + x) & 0xff
        val avgU = tlU + tU + lU + cU + 8
        val avgV = tlV + tV + lV + cV + 8
        val diag12U = (avgU + 2 * (tU + lU)) >> 3
        val diag12V = (avgV + 2 * (tV + lV)) >> 3
        val diag03U = (avgU + 2 * (tlU + cU)) >> 3
        val diag03V = (avgV + 2 * (tlV + cV)) >> 3
        emit(topY, 2 * x - 1, (diag12U + tlU) >> 1, (diag12V + tlV) >> 1)
        emit(topY, 2 * x, (diag03U + tU) >> 1, (diag03V + tV) >> 1)
        if (bottomY >= 0) {
          emit(bottomY, 2 * x - 1, (diag03U + lU) >> 1, (diag03V + lV) >> 1)
          emit(bottomY, 2 * x, (diag12U + cU) >> 1, (diag12V + cV) >> 1)
        }
        tlU = tU; tlV = tV; lU = cU; lV = cV
        x += 1
      }
      if ((w & 1) == 0) {
        emit(topY, w - 1, (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2)
        if (bottomY >= 0)
          emit(bottomY, w - 1, (3 * lU + tlU + 2) >> 2,
            (3 * lV + tlV + 2) >> 2)
      }
    }

    linePair(0, -1, 0, 0) // first line mirrors the chroma boundary
    var cr = 0
    while (2 * cr + 2 < h) {
      linePair(2 * cr + 1, 2 * cr + 2, cr, cr + 1)
      cr += 1
    }
    if (h > 1 && (h & 1) == 0)
      linePair(h - 1, -1, pl.uvHeight - 1, pl.uvHeight - 1)
    out
  }
}
