package graft.images

import java.awt.image.BufferedImage

/** Pure-JVM WebP **lossless** (VP8L) decoder.
  *
  * The reference allow-lists `.webp` at its directory scan (appV2.py:17)
  * but the JDK ships no ImageIO webp reader, so those rows previously
  * rode the row-level error channel. This decoder closes the gap for the
  * lossless half of the format natively — no plugin jar — by
  * implementing the public VP8L bitstream specification (RFC 9649 /
  * Google "WebP Lossless Bitstream Specification"): canonical-Huffman
  * entropy coding with meta-Huffman entropy images, color cache, LZ77
  * backward references with the 120-entry near-pixel distance map, and
  * all four transforms (predictor, cross-color, subtract-green,
  * color-indexing incl. sub-byte pixel bundling).
  *
  * Lossy VP8 payloads (a full intra-frame video codec) remain out of
  * scope and continue to route to the error channel — the ImageIO SPI
  * answers `canDecodeInput = false` for them, preserving the documented
  * Images.scala contract for undecodable bytes.
  *
  * Correctness is pinned against the reference C implementation:
  * WebPSpec decodes libwebp-encoded fixtures (src/test/resources/graft/
  * webp/, tools/make_webp_fixtures.py) and compares every RGBA byte with
  * libwebp's own decode of the same file.
  */
object Vp8l {

  /** Decode a .webp FILE (RIFF container) to ARGB. Throws
    * IllegalArgumentException for anything that is not a well-formed
    * container holding a VP8L chunk. */
  def decode(fileBytes: Array[Byte]): Decoded = {
    val payload = vp8lChunk(fileBytes).getOrElse(
      throw new IllegalArgumentException("no VP8L (lossless) chunk in webp"))
    decodeStream(payload)
  }

  final case class Decoded(width: Int, height: Int, argb: Array[Int]) {
    def toImage: BufferedImage = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, width, height, argb, 0, width)
      img
    }
  }

  /** RIFF walk: returns the VP8L chunk payload, looking through a VP8X
    * extended container if present. None for lossy-only files.
    * Delegates to [[WebPContainer.findChunk]] — ONE hardened walk
    * (Long-arithmetic sizes, strict-increase) shared by all readers. */
  def vp8lChunk(b: Array[Byte]): Option[Array[Byte]] =
    WebPContainer.findChunk(b, "VP8L")

  /** True when the container holds a VP8L chunk (cheap header walk). */
  def isLossless(fileBytes: Array[Byte]): Boolean = vp8lChunk(fileBytes).isDefined

  /** Decode a bare VP8L chunk payload (no RIFF walk) — the form a chunk
    * takes inside an ANMF animation frame. */
  def decodePayload(payload: Array[Byte]): Decoded = decodeStream(payload)

  /** Decode an ALPH chunk's headerless VP8L stream (alpha_dec.c
    * semantics): same bitstream as a level-0 image stream, but the 5-byte
    * signature/size header is absent — dimensions come from the frame —
    * and the alpha values ride the GREEN channel of the decoded pixels. */
  private[images] def decodeAlphaStream(payload: Array[Byte],
                                        w: Int, h: Int): Array[Byte] = {
    val br = new BitReader(payload)
    val (pixels, _) = decodeImageStream(w, h, isLevel0 = true, br)
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) { out(i) = ((pixels(i) >> 8) & 0xff).toByte; i += 1 }
    out
  }

  // ---------------------------------------------------------------- bits

  /** LSB-first bit reader over the VP8L payload. */
  private final class BitReader(b: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bytePos >= b.length)
          throw new IllegalArgumentException("truncated VP8L stream")
        v |= (((b(bytePos) >> bitPos) & 1) << i)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // ------------------------------------------------------------- huffman

  /** Canonical Huffman decoder: codes assigned by (length asc, symbol
    * asc) and read MSB-first from the LSB-first bitstream (the DEFLATE
    * convention VP8L shares). A table whose alphabet collapses to one
    * used symbol decodes with ZERO bits — the spec's simple-code rule,
    * and libwebp's BuildHuffmanTable single-symbol special case. */
  private final class Huffman(lengths: Array[Int]) {
    private val maxLen = 15
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach { l =>
      require(l >= 0 && l <= maxLen, s"bad code length $l")
      if (l > 0) count(l) += 1
    }
    private val used = count.sum
    private val single: Int = if (used == 1) lengths.indexWhere(_ > 0) else -1
    // Kraft completeness: libwebp rejects over-/under-subscribed trees as
    // bitstream errors; without this a corrupt stream decodes to garbage
    // with status 'ok' instead of riding the R16 error channel. The empty
    // and single-symbol tables are the spec's special cases.
    if (used > 1) {
      var kraft = 0L
      var l = 1
      while (l <= maxLen) { kraft += count(l).toLong << (maxLen - l); l += 1 }
      require(kraft == (1L << maxLen), "invalid (incomplete/oversubscribed) huffman table in VP8L stream")
    }
    // firstCode(len) and symbol list sorted by (len, sym)
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    locally {
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offset(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
    }
    private val sorted: Array[Int] = {
      val arr = new Array[Int](used)
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { arr(next(l)) = s; next(l) += 1 }
        s += 1
      }
      arr
    }
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit()
        len += 1
        val idx = code - firstCode(len)
        if (idx >= 0 && idx < count(len)) return sorted(offset(len) + idx)
      }
      throw new IllegalArgumentException("invalid huffman code in VP8L stream")
    }
  }

  /** kCodeLengthCodeOrder — the fixed transmission order of the 19
    * code-length-code lengths. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read ONE Huffman code (simple or code-length-coded) for the given
    * alphabet size. */
  private def readHuffmanCode(alphabetSize: Int, br: BitReader): Huffman = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) { // simple: 1-2 symbols stored raw
      val numSymbols = 1 + br.bit()
      val firstWide = br.bit() // first symbol in 8 bits vs 1 bit
      val s0 = br.bits(if (firstWide == 1) 8 else 1)
      require(s0 < alphabetSize, "simple-code symbol out of range")
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.bits(8)
        require(s1 < alphabetSize, "simple-code symbol out of range")
        lengths(s1) = 1
      }
    } else {
      val clLens = new Array[Int](19)
      val numCl = 4 + br.bits(4)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val inner = new Huffman(clLens)
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          val m = 2 + br.bits(lengthNBits)
          require(m <= alphabetSize, "max_symbol exceeds alphabet")
          m
        } else alphabetSize
      var symbol = 0
      var prev = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = inner.decode(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prev = cl
        } else {
          val (repBase, extra, value) = cl match {
            case 16 => (3, 2, prev)
            case 17 => (3, 3, 0)
            case _  => (11, 7, 0)
          }
          var rep = repBase + br.bits(extra)
          require(symbol + rep <= alphabetSize, "code-length repeat overflow")
          while (rep > 0) { lengths(symbol) = value; symbol += 1; rep -= 1 }
        }
      }
    }
    new Huffman(lengths)
  }

  // -------------------------------------------------------- LZ77 helpers

  /** Prefix-coded value (shared by copy lengths and distance codes). */
  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** The 120-entry near-pixel distance map: ALL (dx, dy) offsets with
    * dx ∈ [−7, 8], dy ∈ [0, 7] (dy = 0 restricted to dx ≥ 1 — exactly
    * 120 candidates), sorted by (dx²+dy² asc, dy desc, dx desc). This
    * reproduces the spec's kCodeToPlane table byte for byte under its
    * packing yoffset = b >> 4, xoffset = 8 − (b & 0xf) — verified
    * against the table embedded in libwebp, and every fixture with
    * backward references pins it end-to-end. */
  private val DistMap: Array[(Int, Int)] = {
    val cand = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    val sorted = cand.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }
    require(sorted.size == 120, s"distance map must have 120 entries, got ${sorted.size}")
    sorted.toArray
  }

  private def planeCodeToDistance(xsize: Int, planeCode: Int): Int =
    if (planeCode > 120) planeCode - 120
    else {
      val (dx, dy) = DistMap(planeCode - 1)
      val dist = dy * xsize + dx
      if (dist >= 1) dist else 1
    }

  // ---------------------------------------------------------- transforms

  private sealed trait Transform { def xsize: Int; def ysize: Int }
  private final case class Predictor(bits: Int, image: Array[Int],
                                     xsize: Int, ysize: Int) extends Transform
  private final case class CrossColor(bits: Int, image: Array[Int],
                                      xsize: Int, ysize: Int) extends Transform
  private final case class SubtractGreen(xsize: Int, ysize: Int) extends Transform
  private final case class ColorIndexing(palette: Array[Int], widthBits: Int,
                                         xsize: Int, ysize: Int) extends Transform

  private def subSample(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // --------------------------------------------------------- main decode

  private def decodeStream(payload: Array[Byte]): Decoded = {
    val br = new BitReader(payload)
    require(br.bits(8) == 0x2f, "bad VP8L signature byte")
    val width = br.bits(14) + 1
    val height = br.bits(14) + 1
    // decompression-bomb guard, REFERENCE PARITY: PIL (the pipeline
    // appV2.py:167 rides) raises DecompressionBombError above
    // 2 × MAX_IMAGE_PIXELS = 178,956,970 px — a few hostile header bytes
    // must not buy a multi-hundred-MB allocation on an executor (R16:
    // error channel, never OOM). 14-bit dims allow up to 16384² ≈ 268 Mpx.
    require(width.toLong * height <= 178956970L,
      s"decompression bomb: ${width}x$height exceeds the 178.9 Mpx limit")
    br.bit() // alpha hint — informational
    require(br.bits(3) == 0, "unsupported VP8L version")
    val (pixels, _) = decodeImageStream(width, height, isLevel0 = true, br)
    Decoded(width, height, pixels)
  }

  /** Decode one spatially-coded image (the main ARGB image when
    * isLevel0, else an entropy/predictor/color/palette sub-image).
    * Returns (pixels, coded width) — the coded width differs from the
    * nominal when a color-indexing transform bundles pixels. */
  private def decodeImageStream(xsize0: Int, ysize: Int, isLevel0: Boolean,
                                br: BitReader): (Array[Int], Int) = {
    var xsize = xsize0
    // transforms (top-level image only), read order recorded
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    if (isLevel0) {
      val seen = scala.collection.mutable.Set.empty[Int]
      while (br.bit() == 1) {
        val t = br.bits(2)
        require(seen.add(t), s"duplicate VP8L transform $t")
        t match {
          case 0 => // predictor
            val bits = br.bits(3) + 2
            val (img, _) = decodeImageStream(subSample(xsize, bits),
              subSample(ysize, bits), isLevel0 = false, br)
            transforms += Predictor(bits, img, xsize, ysize)
          case 1 => // cross-color
            val bits = br.bits(3) + 2
            val (img, _) = decodeImageStream(subSample(xsize, bits),
              subSample(ysize, bits), isLevel0 = false, br)
            transforms += CrossColor(bits, img, xsize, ysize)
          case 2 => // subtract-green
            transforms += SubtractGreen(xsize, ysize)
          case _ => // color-indexing
            val numColors = br.bits(8) + 1
            val widthBits =
              if (numColors > 16) 0
              else if (numColors > 4) 1
              else if (numColors > 2) 2
              else 3
            val (raw, _) = decodeImageStream(numColors, 1, isLevel0 = false, br)
            // palette entries are delta-coded per channel
            var i = 1
            while (i < raw.length) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
            transforms += ColorIndexing(raw, widthBits, xsize, ysize)
            xsize = subSample(xsize, widthBits)
        }
      }
    }
    // color cache
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      require(cb >= 1 && cb <= 11, s"bad color-cache bits $cb")
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta-huffman entropy image (top level only)
    var metaBits = 0
    var metaImage: Array[Int] = null
    var metaWidth = 0
    var numGroups = 1
    if (isLevel0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaWidth = subSample(xsize, metaBits)
      val (img, _) = decodeImageStream(metaWidth, subSample(ysize, metaBits),
        isLevel0 = false, br)
      metaImage = img
      var maxIdx = 0
      img.foreach { p =>
        val m = (p >> 8) & 0xffff
        if (m > maxIdx) maxIdx = m
      }
      numGroups = maxIdx + 1
    }
    // 5 Huffman codes per group
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      val green = readHuffmanCode(greenAlphabet, br)
      val red = readHuffmanCode(256, br)
      val blue = readHuffmanCode(256, br)
      val alpha = readHuffmanCode(256, br)
      val dist = readHuffmanCode(40, br)
      (green, red, blue, alpha, dist)
    }
    // spatial decode
    val total = xsize * ysize
    val out = new Array[Int](total)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    @inline def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * argb) >>> (32 - cacheBits))) = argb
    var pos = 0
    var col = 0
    var row = 0
    var group = groups(0)
    var lastGroupIdx = -1
    @inline def refreshGroup(): Unit =
      if (metaImage != null) {
        val gi = (metaImage((row >> metaBits) * metaWidth + (col >> metaBits)) >> 8) & 0xffff
        if (gi != lastGroupIdx) { lastGroupIdx = gi; group = groups(gi) }
      }
    while (pos < total) {
      refreshGroup()
      val (green, red, blue, alpha, dist) = group
      val s = green.decode(br)
      if (s < 256) {
        val g = s
        val r = red.decode(br)
        val b = blue.decode(br)
        val a = alpha.decode(br)
        val px = (a << 24) | (r << 16) | (g << 8) | b
        out(pos) = px
        cacheInsert(px)
        pos += 1; col += 1
        if (col >= xsize) { col = 0; row += 1 }
      } else if (s < 256 + 24) {
        val length = prefixValue(s - 256, br)
        val distCode = prefixValue(dist.decode(br), br)
        val d = planeCodeToDistance(xsize, distCode)
        require(d <= pos, "VP8L backward reference before image start")
        var i = 0
        while (i < length && pos < total) {
          val px = out(pos - d)
          out(pos) = px
          cacheInsert(px)
          pos += 1; col += 1
          if (col >= xsize) { col = 0; row += 1 }
          i += 1
        }
      } else {
        val idx = s - 256 - 24
        require(cache != null && idx < cacheSize, "color-cache miss")
        val px = cache(idx)
        out(pos) = px
        pos += 1; col += 1
        if (col >= xsize) { col = 0; row += 1 }
      }
    }
    // inverse transforms, reverse read order
    var pixels = out
    var curWidth = xsize
    transforms.reverseIterator.foreach { t =>
      pixels = t match {
        case ColorIndexing(palette, widthBits, w, h) =>
          val res = inverseColorIndexing(pixels, curWidth, w, h, palette, widthBits)
          curWidth = w
          res
        case Predictor(bits, img, w, h)  => inversePredictor(pixels, w, h, bits, img)
        case CrossColor(bits, img, w, h) => inverseCrossColor(pixels, w, h, bits, img)
        case SubtractGreen(_, _)         => inverseSubtractGreen(pixels)
      }
    }
    (pixels, curWidth)
  }

  // ------------------------------------------------- transform inverses

  /** Per-channel byte-wise add (mod 256 in each of A,R,G,B). */
  @inline private def addPixels(a: Int, b: Int): Int = {
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    (ag << 8) | rb
  }

  private def inverseSubtractGreen(p: Array[Int]): Array[Int] = {
    var i = 0
    while (i < p.length) {
      val argb = p(i)
      val g = (argb >>> 8) & 0xff
      val r = (((argb >>> 16) & 0xff) + g) & 0xff
      val b = ((argb & 0xff) + g) & 0xff
      p(i) = (argb & 0xff00ff00) | (r << 16) | b
      i += 1
    }
    p
  }

  private def inverseColorIndexing(p: Array[Int], codedWidth: Int, w: Int,
                                   h: Int, palette: Array[Int],
                                   widthBits: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val pixelsPerByte = 1 << widthBits
    val bitsPerPixel = 8 >> widthBits
    val mask = (1 << bitsPerPixel) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = (p(y * codedWidth + (x >> widthBits)) >>> 8) & 0xff
        val idx =
          if (widthBits == 0) packed
          else (packed >> ((x & (pixelsPerByte - 1)) * bitsPerPixel)) & mask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  @inline private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without overflow: carry-save average
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def inversePredictor(p: Array[Int], w: Int, h: Int, bits: Int,
                               modeImage: Array[Int]): Array[Int] = {
    val modeW = subSample(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred: Int =
          if (y == 0 && x == 0) 0xff000000
          else if (y == 0) p(i - 1) // first row: forced LEFT
          else if (x == 0) p(i - w) // first column: forced TOP
          else {
            val mode = (modeImage((y >> bits) * modeW + (x >> bits)) >>> 8) & 0xff
            val l = p(i - 1)
            val t = p(i - w)
            val tl = p(i - w - 1)
            // top-right: for the rightmost column i−w+1 lands on the
            // CURRENT row's first pixel (already decoded) — exactly the
            // wrap the spec mandates, so the linear index is uniform
            val tr = p(i - w + 1)
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => t
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), t)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, t)
              case 8  => avg2(tl, t)
              case 9  => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(avg2(l, t), tl)
              case m  => throw new IllegalArgumentException(s"bad predictor mode $m")
            }
          }
        p(i) = addPixels(p(i), pred)
        x += 1
      }
      y += 1
    }
    p
  }

  /** Predictor 11: return `t` when the summed per-channel gradient
    * favors top, else `l` (libwebp's Select with its exact tie rule). */
  @inline private def select(t: Int, l: Int, tl: Int): Int = {
    @inline def sub3(a: Int, b: Int, c: Int): Int =
      math.abs(b - c) - math.abs(a - c)
    val paMinusPb =
      sub3((t >>> 24) & 0xff, (l >>> 24) & 0xff, (tl >>> 24) & 0xff) +
        sub3((t >>> 16) & 0xff, (l >>> 16) & 0xff, (tl >>> 16) & 0xff) +
        sub3((t >>> 8) & 0xff, (l >>> 8) & 0xff, (tl >>> 8) & 0xff) +
        sub3(t & 0xff, l & 0xff, tl & 0xff)
    if (paMinusPb <= 0) t else l
  }

  @inline private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(sh: Int): Int =
      clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  @inline private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    // per channel: clip255(a + (a - b) / 2) with C-style truncation
    @inline def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clip255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def inverseCrossColor(p: Array[Int], w: Int, h: Int, bits: Int,
                                cteImage: Array[Int]): Array[Int] = {
    val cteW = subSample(w, bits)
    @inline def delta(m: Int, c: Int): Int = (m.toByte * c.toByte) >> 5
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val cte = cteImage((y >> bits) * cteW + (x >> bits))
        val greenToRed = cte & 0xff
        val greenToBlue = (cte >>> 8) & 0xff
        val redToBlue = (cte >>> 16) & 0xff
        val argb = p(i)
        val g = (argb >>> 8) & 0xff
        var r = (argb >>> 16) & 0xff
        var b = argb & 0xff
        r = (r + delta(greenToRed, g)) & 0xff
        b = (b + delta(greenToBlue, g)) & 0xff
        b = (b + delta(redToBlue, r)) & 0xff
        p(i) = (argb & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
    p
  }
}
