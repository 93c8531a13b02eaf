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

  /** The container's first decodable frame. For a still this is its
    * VP8/VP8L (+ALPH) chunk set; for an animation, the first ANMF frame —
    * required to cover the full canvas at (0,0), which is what every
    * encoder emits for frame 0 (later frames may be partial deltas this
    * still decoder has no canvas state for). */
  def firstFrame(b: Array[Byte]): Option[Frame] = {
    if (b.length < 20 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP")
      return None
    var vp8: Array[Byte] = null
    var vp8l: Array[Byte] = null
    var alph: Array[Byte] = null
    var canvasW = -1
    var canvasH = -1
    var animFrame: Frame = null
    walk(b, 12, b.length, (cc, start, len) => cc match {
      case "VP8 " if vp8 == null && vp8l == null =>
        vp8 = slice(b, start, len); false
      case "VP8L" if vp8 == null && vp8l == null =>
        vp8l = slice(b, start, len); false
      case "ALPH" if alph == null =>
        alph = slice(b, start, len); true
      case "VP8X" if len >= 10 =>
        canvasW = le24(b, start + 4) + 1
        canvasH = le24(b, start + 7) + 1
        true
      case "ANMF" if animFrame == null =>
        // only the FIRST frame is eligible: a later frame may be a
        // partial delta over canvas state this still decoder doesn't keep
        animFrame = anmfFrame(b, start, len, canvasW, canvasH).orNull
        false
      case _ => true // ICCP / EXIF / XMP / ANIM / unknown: skip
    })
    if (vp8 != null || vp8l != null) Some(Frame(Option(vp8), Option(vp8l), Option(alph)))
    else Option(animFrame)
  }

  /** EVERY decodable frame, in stream order: a still yields its single
    * VP8/VP8L(+ALPH) chunk set; an animation yields each full-canvas ANMF
    * frame. Frames that are not full-canvas at the origin are SKIPPED
    * (they are deltas over canvas state a stateless per-frame decoder
    * doesn't keep) — callers sampling frames for per-frame work (the
    * mm_frame_sample fan-out) get exactly the frames that decode
    * standalone. Same hardened walk as [[firstFrame]]. */
  def frames(b: Array[Byte]): Seq[Frame] = {
    if (b.length < 20 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WEBP")
      return Seq.empty
    var vp8: Array[Byte] = null
    var vp8l: Array[Byte] = null
    var alph: Array[Byte] = null
    var canvasW = -1
    var canvasH = -1
    val anim = scala.collection.mutable.ArrayBuffer.empty[Frame]
    walk(b, 12, b.length, (cc, start, len) => cc match {
      case "VP8 " if vp8 == null && vp8l == null =>
        vp8 = slice(b, start, len); false
      case "VP8L" if vp8 == null && vp8l == null =>
        vp8l = slice(b, start, len); false
      case "ALPH" if alph == null =>
        alph = slice(b, start, len); true
      case "VP8X" if len >= 10 =>
        canvasW = le24(b, start + 4) + 1
        canvasH = le24(b, start + 7) + 1
        true
      case "ANMF" =>
        anmfFrame(b, start, len, canvasW, canvasH).foreach(anim += _)
        true
      case _ => true
    })
    if (vp8 != null || vp8l != null)
      Seq(Frame(Option(vp8), Option(vp8l), Option(alph)))
    else anim.toSeq
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

  /** Parse one ANMF payload: 16-byte frame header (x/2, y/2, w-1, h-1,
    * duration — 24-bit LE each — then a flags byte), then the frame's own
    * ALPH?/VP8|VP8L chunk sequence. None unless the frame is full-canvas
    * at the origin. */
  private def anmfFrame(b: Array[Byte], start: Int, len: Int,
                        canvasW: Int, canvasH: Int): Option[Frame] = {
    if (len < 16) return None
    val x = le24(b, start) * 2
    val y = le24(b, start + 3) * 2
    val w = le24(b, start + 6) + 1
    val h = le24(b, start + 9) + 1
    if (x != 0 || y != 0 || w != canvasW || h != canvasH) return None
    var vp8: Array[Byte] = null
    var vp8l: Array[Byte] = null
    var alph: Array[Byte] = null
    walk(b, start + 16, start + len, (cc, s, l) => cc match {
      case "VP8 " if vp8 == null && vp8l == null => vp8 = slice(b, s, l); false
      case "VP8L" if vp8 == null && vp8l == null => vp8l = slice(b, s, l); false
      case "ALPH" if alph == null                => alph = slice(b, s, l); true
      case _                                     => true
    })
    if (vp8 != null || vp8l != null) Some(Frame(Option(vp8), Option(vp8l), Option(alph)))
    else None
  }
}
