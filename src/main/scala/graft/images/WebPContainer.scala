package graft.images

/** RIFF/WEBP container walk covering the full still surface of the format
  * (container spec: developers.google.com/speed/webp/docs/riff_container):
  * simple lossy (VP8), simple lossless (VP8L), and the VP8X extended layout
  * with ALPH (lossy-with-alpha), metadata chunks (ICCP/EXIF/XMP), and
  * ANIM/ANMF animations resolved to their first frame — the same "an
  * animated file yields frame 0" behavior the reference tool inherits from
  * PIL (appV2.py:167 `Image.open`). Hardened like [[Vp8l.vp8lChunk]]:
  * Long-arithmetic sizes, strict-increase walk, bounds-clamped payload
  * copies — untrusted bytes degrade to None/IllegalArgumentException (the
  * R16 error channel), never a hang. */
object WebPContainer {

  /** One decodable image: exactly one of `vp8`/`vp8l` is set; `alph`
    * accompanies `vp8` when the still carries a separate alpha plane
    * (VP8L encodes alpha in-stream). */
  final case class Frame(vp8: Option[Array[Byte]],
                         vp8l: Option[Array[Byte]],
                         alph: Option[Array[Byte]])

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length) new String(b, off, 4, "US-ASCII") else ""

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def le24(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)

  /** Walk one chunk sequence in `b[from, until)`, yielding
    * (fourcc, payloadStart, payloadLen). Stops at the first malformed
    * header instead of throwing — callers decide whether what was
    * gathered suffices. */
  private def walk(b: Array[Byte], from: Int, until: Int,
                   f: (String, Int, Int) => Boolean): Unit = {
    var off = from.toLong
    var go = true
    while (go && off + 8 <= until) {
      val iOff = off.toInt
      val cc = fourcc(b, iOff)
      val size = le32(b, iOff + 4)
      val len = math.min(size, until - off - 8).toInt
      go = f(cc, iOff + 8, len)
      val next = off + 8 + size + (size & 1)
      if (next <= off || next > until) go = false
      else off = next
    }
  }

  private def slice(b: Array[Byte], start: Int, len: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(b, start, start + len)

  /** First top-level chunk payload with the given fourcc — the single
    * hardened walk behind [[Vp8.vp8Chunk]] and [[Vp8l.vp8lChunk]]. */
  def findChunk(b: Array[Byte], cc: String): Option[Array[Byte]] = {
    if (b.length < 20 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP")
      return None
    var found: Array[Byte] = null
    walk(b, 12, b.length, (c, start, len) =>
      if (c == cc) { found = slice(b, start, len); false } else true)
    Option(found)
  }

  /** Everything ONE top-level walk can tell us: the still's chunk set
    * (if any), the VP8X canvas dims, and the (start, len) span of every
    * ANMF chunk — gathered once and shared by [[firstFrame]], [[frames]]
    * and [[compositedFrames]], so the three entry points ride the same
    * hardened dispatch and cannot drift. */
  private final case class Top(vp8: Array[Byte], vp8l: Array[Byte],
                               alph: Array[Byte], canvasW: Int, canvasH: Int,
                               anmf: Vector[(Int, Int)]) {
    def still: Option[Frame] =
      if (vp8 != null || vp8l != null)
        Some(Frame(Option(vp8), Option(vp8l), Option(alph)))
      else None
  }

  private def gatherTop(b: Array[Byte]): Option[Top] = {
    if (b.length < 20 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP")
      return None
    var vp8: Array[Byte] = null
    var vp8l: Array[Byte] = null
    var alph: Array[Byte] = null
    var canvasW = -1
    var canvasH = -1
    val anmf = Vector.newBuilder[(Int, Int)]
    walk(b, 12, b.length, (cc, start, len) => cc match {
      case "VP8 " if vp8 == null && vp8l == null =>
        vp8 = slice(b, start, len); true
      case "VP8L" if vp8 == null && vp8l == null =>
        vp8l = slice(b, start, len); true
      case "ALPH" if alph == null =>
        alph = slice(b, start, len); true
      case "VP8X" if len >= 10 =>
        canvasW = le24(b, start + 4) + 1
        canvasH = le24(b, start + 7) + 1
        true
      case "ANMF" =>
        anmf += ((start, len)); true
      case _ => true // ICCP / EXIF / XMP / ANIM / unknown: skip
    })
    Some(Top(vp8, vp8l, alph, canvasW, canvasH, anmf.result()))
  }

  /** The container's first decodable frame. For a still this is its
    * VP8/VP8L (+ALPH) chunk set; for an animation, the first ANMF frame —
    * required to cover the full canvas at (0,0), which is what every
    * encoder emits for frame 0 (later frames may be partial deltas this
    * still decoder has no canvas state for). */
  def firstFrame(b: Array[Byte]): Option[Frame] =
    gatherTop(b).flatMap { t =>
      t.still.orElse(t.anmf.headOption.flatMap { case (start, len) =>
        anmfFrame(b, start, len, t.canvasW, t.canvasH, 0)
      })
    }

  /** EVERY STANDALONE-decodable frame, in stream order: a still yields
    * its single VP8/VP8L(+ALPH) chunk set; an animation yields each ANMF
    * frame that decodes correctly WITHOUT canvas state — (a) full-canvas
    * at the origin, and (b) for frames after the first, either
    * do-not-blend or alpha-free (an alpha-BLENDING frame composites over
    * the prior canvas, so decoding it alone would produce silently wrong
    * pixels). Skipped frames are dropped, never decoded wrong — use
    * [[compositedFrames]] when every frame is needed: it carries the
    * canvas state this walk deliberately refuses to fake. */
  def frames(b: Array[Byte]): Seq[Frame] =
    gatherTop(b) match {
      case None => Seq.empty
      case Some(t) => t.still.map(Seq(_)).getOrElse(
        t.anmf.zipWithIndex.flatMap { case ((start, len), i) =>
          anmfFrame(b, start, len, t.canvasW, t.canvasH, i)
        })
    }

  /** One ANMF frame with its placement/compositing metadata (container
    * spec ANMF header): rect at (x, y) sized w×h on the canvas; `blend`
    * = alpha-composite over prior canvas state (flags bit1 CLEAR);
    * `disposeBg` = zero-fill the rect after display (flags bit0 SET). */
  final case class AnimFrame(x: Int, y: Int, w: Int, h: Int,
                             blend: Boolean, disposeBg: Boolean, frame: Frame)

  /** EVERY frame of the container as a viewer sees it — for an
    * animation, the per-frame COMPOSITED canvas. Semantics follow
    * libwebp's WebPAnimDecoder (demux/anim_decode.c — the decoder PIL
    * rides for animated webp): an RGBA canvas, initially transparent
    * black, carried across frames; each ANMF frame is drawn into its
    * rect by its blend method, and after display a dispose-to-background
    * frame's rect is zero-filled to TRANSPARENT black (libwebp ignores
    * the ANIM chunk's background color, as do browsers). Blending uses
    * the non-premultiplied integer arithmetic of BlendPixelNonPremult:
    * scale = dst_a·(255−src_a)/255 and blend_a = src_a + scale with C
    * integer division, each channel (src·src_a + dst·scale)/blend_a; a
    * fully-transparent source pixel keeps the canvas pixel and a
    * fully-opaque one overwrites it (both exactly what the formula
    * yields). No libwebpdemux ships in this environment, so the
    * arithmetic is pinned by an independent reimplementation in the
    * fixture generator (tools/make_alpha_fixtures.py) cross-checked
    * byte-for-byte by AnimCompositeSpec, with the per-frame pixel
    * decode itself C-validated via libwebp still goldens.
    *
    * A still yields its single decoded frame. Non-webp bytes yield
    * Seq.empty; a malformed ANMF header, a frame rect escaping the
    * canvas, or a bad payload throws (the R16 error channel) — unlike
    * [[frames]], which yields only frames whose STANDALONE decode
    * already equals the composited view and silently drops the rest,
    * every frame decodes here. */
  def compositedFrames(b: Array[Byte],
                       sampleEvery: Int = 1,
                       maxTotalPixels: Long = 178956970L * 2): Seq[Vp8l.Decoded] = {
    require(sampleEvery > 0, s"sampleEvery must be positive, got $sampleEvery")
    require(maxTotalPixels > 0, s"maxTotalPixels must be positive")
    gatherTop(b) match {
      case None => Seq.empty
      case Some(t) =>
        t.still match {
          case Some(f) => Seq(decodeFrame(f))
          case None =>
            if (t.anmf.isEmpty) return Seq.empty
            val (canvasW, canvasH) = (t.canvasW, t.canvasH)
            require(canvasW > 0 && canvasH > 0, "animation without a VP8X canvas")
            // same PIL-parity decompression-bomb bound as the frame
            // decoders: a hostile VP8X header must not buy the canvas
            require(canvasW.toLong * canvasH <= 178956970L,
              s"decompression bomb: ${canvasW}x$canvasH exceeds the 178.9 Mpx limit")
            val canvasPx = canvasW * canvasH
            val canvas = new Array[Int](canvasPx) // transparent black
            var disposeRect: AnimFrame = null
            var emittedPx = 0L
            val out = Vector.newBuilder[Vp8l.Decoded]
            var idx = 0
            for ((spanStart, spanLen) <- t.anmf) {
              val af = anmfMeta(b, spanStart, spanLen)
              if (disposeRect != null) {
                var row = 0
                while (row < disposeRect.h) {
                  java.util.Arrays.fill(canvas,
                    (disposeRect.y + row) * canvasW + disposeRect.x,
                    (disposeRect.y + row) * canvasW + disposeRect.x + disposeRect.w, 0)
                  row += 1
                }
              }
              val d = decodeFrame(af.frame)
              require(d.width == af.w && d.height == af.h,
                s"ANMF declares ${af.w}x${af.h} but payload decodes ${d.width}x${d.height}")
              require(af.x >= 0 && af.y >= 0 &&
                af.x.toLong + af.w <= canvasW && af.y.toLong + af.h <= canvasH,
                s"ANMF rect ${af.w}x${af.h}@(${af.x},${af.y}) escapes the " +
                  s"${canvasW}x$canvasH canvas")
              var row = 0
              while (row < af.h) {
                var cOff = (af.y + row) * canvasW + af.x
                var fOff = row * af.w
                val rowEnd = cOff + af.w
                while (cOff < rowEnd) {
                  val sp = d.argb(fOff)
                  canvas(cOff) = if (af.blend) blendPixel(sp, canvas(cOff)) else sp
                  cOff += 1
                  fOff += 1
                }
                row += 1
              }
              disposeRect = if (af.disposeBg) af else null
              if (idx % sampleEvery == 0) {
                // only SAMPLED frames are snapshotted; the PER-FRAME
                // canvas is bounded like one still decode (the VP8X
                // require above), while TOTAL emitted output gets its
                // own, larger budget: a per-still limit repurposed as a
                // cumulative cap would reject legitimate long
                // animations (~87 frames of 1920x1080 at sampleEvery=1)
                // that libwebp/PIL decode fine. The default — 2 stills'
                // worth, ~172 1080p frames — still turns a crafted
                // many-frame/huge-canvas file into the R16 error
                // channel, never an OutOfMemoryError the per-row
                // Exception handler cannot catch. The budget check runs
                // BEFORE the clone, so worst-case RETAINED heap is
                // bounded by maxTotalPixels × 4 B (default ≈ 1.4 GB —
                // the knob trades animation-length acceptance against
                // per-task heap; size it to the executor when raising).
                emittedPx += canvasPx
                require(emittedPx <= maxTotalPixels,
                  s"decompression bomb: composited output passes " +
                    s"$maxTotalPixels total px at frame $idx")
                out += Vp8l.Decoded(canvasW, canvasH, canvas.clone())
              }
              idx += 1
            }
            out.result()
        }
    }
  }

  /** libwebp anim_decode.c BlendPixelNonPremult: straight-alpha OVER in
    * 8-bit integer arithmetic (see [[compositedFrames]]). */
  private def blendPixel(src: Int, dst: Int): Int = {
    val srcA = src >>> 24
    if (srcA == 0) return dst
    if (srcA == 0xff) return src
    val dstA = dst >>> 24
    val scale = dstA * (255 - srcA) / 255
    val blendA = srcA + scale
    val r = (((src >> 16) & 0xff) * srcA + ((dst >> 16) & 0xff) * scale) / blendA
    val g = (((src >> 8) & 0xff) * srcA + ((dst >> 8) & 0xff) * scale) / blendA
    val bl = ((src & 0xff) * srcA + (dst & 0xff) * scale) / blendA
    (blendA << 24) | (r << 16) | (g << 8) | bl
  }

  /** Parse one ANMF payload to its full metadata — used by the
    * compositing path, which (unlike [[anmfFrame]]) accepts partial,
    * blending and disposing frames; malformed headers throw instead of
    * being silently dropped, since a missing frame would corrupt every
    * later composite. */
  private def anmfMeta(b: Array[Byte], start: Int, len: Int): AnimFrame = {
    require(len >= 16, s"ANMF payload of $len bytes has no frame header")
    val x = le24(b, start) * 2
    val y = le24(b, start + 3) * 2
    val w = le24(b, start + 6) + 1
    val h = le24(b, start + 9) + 1
    val flags = b(start + 15)
    var vp8: Array[Byte] = null
    var vp8l: Array[Byte] = null
    var alph: Array[Byte] = null
    walk(b, start + 16, start + len, (cc, s, l) => cc match {
      case "VP8 " if vp8 == null && vp8l == null => vp8 = slice(b, s, l); false
      case "VP8L" if vp8 == null && vp8l == null => vp8l = slice(b, s, l); false
      case "ALPH" if alph == null                => alph = slice(b, s, l); true
      case _                                     => true
    })
    require(vp8 != null || vp8l != null, "ANMF frame has no VP8/VP8L payload")
    AnimFrame(x, y, w, h,
      blend = (flags & 2) == 0, disposeBg = (flags & 1) != 0,
      Frame(Option(vp8), Option(vp8l), Option(alph)))
  }

  /** One frame's chunk set → ARGB pixels, the shared decode behind the
    * ImageIO reader and per-frame consumers: VP8L carries alpha
    * in-stream; a lossy frame composes its VP8 planes with an optional
    * straight (non-premultiplied) ALPH plane, like WebPDecodeRGBA. */
  def decodeFrame(frame: Frame): Vp8l.Decoded = frame.vp8l match {
    case Some(l) => Vp8l.decodePayload(l)
    case None =>
      val planes = Vp8.decodePayload(frame.vp8.getOrElse(
        throw new IllegalArgumentException("frame has no VP8/VP8L payload")))
      val argb = Vp8.toArgb(planes)
      frame.alph.foreach { a =>
        val plane = Alpha.decode(a, planes.width, planes.height)
        var i = 0
        while (i < argb.length) {
          argb(i) = ((plane(i) & 0xff) << 24) | (argb(i) & 0xffffff)
          i += 1
        }
      }
      Vp8l.Decoded(planes.width, planes.height, argb)
  }

  /** Does this frame's pixel data carry alpha? A separate ALPH chunk, or
    * a VP8L stream whose header sets the alpha hint (bit 36 of the
    * payload: 8-bit signature + 14+14-bit dims, LSB-first). VP8 alone is
    * always opaque. */
  private def frameHasAlpha(f: Frame): Boolean =
    f.alph.isDefined ||
      f.vp8l.exists(l => l.length > 4 && ((l(4) >> 4) & 1) == 1)

  /** One ANMF payload as a STANDALONE-decodable frame (the [[frames]]/
    * [[firstFrame]] acceptance rule): full-canvas at the origin, and for
    * frames after the first, do-not-blend or alpha-free. Malformed
    * payloads yield None — those walks skip bad frames, they do not
    * composite over them. */
  private def anmfFrame(b: Array[Byte], start: Int, len: Int,
                        canvasW: Int, canvasH: Int,
                        frameIndex: Int = 0): Option[Frame] =
    scala.util.Try(anmfMeta(b, start, len)).toOption.flatMap { m =>
      if (m.x != 0 || m.y != 0 || m.w != canvasW || m.h != canvasH) None
      else if (frameIndex > 0 && m.blend && frameHasAlpha(m.frame)) None
      else Some(m.frame)
    }
}