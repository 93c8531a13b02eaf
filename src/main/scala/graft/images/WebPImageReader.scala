package graft.images

import java.awt.image.BufferedImage
import java.util.Locale
import javax.imageio.{ImageReader, ImageReadParam, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadata
import javax.imageio.spi.ImageReaderSpi
import javax.imageio.stream.ImageInputStream

/** ImageIO plumbing for the pure-JVM WebP decoders: a standard
  * `ImageReader` + SPI pair registered via META-INF/services, so plain
  * `ImageIO.read(...)` — the exact call Images.preprocess already makes —
  * decodes the full still surface of the format with no call-site
  * changes: lossless (VP8L), lossy (VP8 keyframe), lossy-with-alpha
  * (ALPH chunk), VP8X containers with metadata, and animations resolved
  * to their first frame (what the reference inherits from PIL). Corrupt
  * bytes and partial-first-frame animations throw from read() and ride
  * the error channel (Images.scala decode contract). */
final class WebPImageReader(spi: ImageReaderSpi) extends ImageReader(spi) {

  private var decoded: Vp8l.Decoded = _

  private def ensureDecoded(): Vp8l.Decoded = {
    if (decoded == null) {
      val stream = input match {
        case s: ImageInputStream => s
        case other => throw new IllegalStateException(s"unsupported input $other")
      }
      // .webp files are small relative to their pixel output; slurping
      // the stream keeps the decoder a pure Array[Byte] => pixels
      // function (and executor-side inputs are in-memory byte arrays
      // from binaryFile anyway)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 << 10)
      var n = stream.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = stream.read(chunk) }
      val bytes = buf.toByteArray
      val frame = WebPContainer.firstFrame(bytes).getOrElse(
        throw new IllegalArgumentException(
          "no decodable VP8/VP8L frame in webp container"))
      decoded = WebPContainer.decodeFrame(frame)
    }
    decoded
  }

  private def checkIndex(imageIndex: Int): Unit =
    if (imageIndex != 0) throw new IndexOutOfBoundsException(s"image $imageIndex")

  override def getNumImages(allowSearch: Boolean): Int = 1
  override def getWidth(imageIndex: Int): Int = { checkIndex(imageIndex); ensureDecoded().width }
  override def getHeight(imageIndex: Int): Int = { checkIndex(imageIndex); ensureDecoded().height }

  override def getImageTypes(imageIndex: Int): java.util.Iterator[ImageTypeSpecifier] = {
    checkIndex(imageIndex)
    java.util.Collections.singletonList(
      ImageTypeSpecifier.createFromBufferedImageType(BufferedImage.TYPE_INT_ARGB)
    ).iterator()
  }

  override def getStreamMetadata: IIOMetadata = null
  override def getImageMetadata(imageIndex: Int): IIOMetadata = { checkIndex(imageIndex); null }

  override def read(imageIndex: Int, param: ImageReadParam): BufferedImage = {
    checkIndex(imageIndex)
    ensureDecoded().toImage
  }

  override def setInput(input: Object, seekForwardOnly: Boolean,
                        ignoreMetadata: Boolean): Unit = {
    super.setInput(input, seekForwardOnly, ignoreMetadata)
    decoded = null
  }

  override def reset(): Unit = { super.reset(); decoded = null }
  override def dispose(): Unit = { decoded = null }
}

object WebPImageReaderSpi {
  /** Peek the container: true for RIFF/WEBP files that hold (or, for
    * animations, embed in a frame) a VP8/VP8L chunk. Bounded walk —
    * chunk headers only, no payload reads; an ANMF chunk counts as
    * decodable without descending into it (a bad first frame then throws
    * from read(), which the decode contract routes to the error
    * channel). */
  private[images] def sniff(stream: ImageInputStream): Boolean = {
    stream.mark()
    try {
      // readFully, not read(): ImageInputStream.read may legally return a
      // short read before EOF, which would falsely reject a valid file
      val head = new Array[Byte](12)
      try stream.readFully(head)
      catch { case _: java.io.EOFException => return false }
      if (!(fourcc(head, 0) == "RIFF" && fourcc(head, 8) == "WEBP")) return false
      var hops = 0
      while (hops < 8) {
        val hdr = new Array[Byte](8)
        try stream.readFully(hdr)
        catch { case _: java.io.EOFException => return false }
        val cc = fourcc(hdr, 0)
        if (cc == "VP8L" || cc == "VP8 " || cc == "ANMF") return true
        if (!(cc == "VP8X" || cc == "ICCP" || cc == "EXIF" || cc == "XMP " ||
              cc == "ALPH" || cc == "ANIM"))
          return false // unknown chunk before any image data: not ours
        val size = (hdr(4) & 0xffL) | ((hdr(5) & 0xffL) << 8) |
          ((hdr(6) & 0xffL) << 16) | ((hdr(7) & 0xffL) << 24)
        var toSkip = size + (size & 1)
        while (toSkip > 0) {
          val skipped = stream.skipBytes(math.min(toSkip, Int.MaxValue.toLong).toInt)
          if (skipped <= 0) return false
          toSkip -= skipped
        }
        hops += 1
      }
      false
    } finally stream.reset()
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")
}

final class WebPImageReaderSpi extends ImageReaderSpi(
  /* vendorName */ "graft",
  /* version */ "1.0",
  /* names */ Array("webp", "WEBP", "wbp"),
  /* suffixes */ Array("webp"),
  /* MIMETypes */ Array("image/webp"),
  /* readerClassName */ classOf[WebPImageReader].getName,
  /* inputTypes */ Array(classOf[ImageInputStream]),
  /* writerSpiNames */ null,
  /* supportsStandardStreamMetadataFormat */ false, null, null, null, null,
  /* supportsStandardImageMetadataFormat */ false, null, null, null, null) {

  override def getDescription(locale: Locale): String =
    "graft pure-JVM WebP reader (VP8L, VP8, ALPH alpha, first anim frame)"

  override def canDecodeInput(source: Object): Boolean = source match {
    case s: ImageInputStream => WebPImageReaderSpi.sniff(s)
    case _                   => false
  }

  override def createReaderInstance(extension: Object): ImageReader =
    new WebPImageReader(this)
}
