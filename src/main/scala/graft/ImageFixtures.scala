package graft

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** Deterministic generated image fixtures (FIXTURES.md §B "Image
  * fixtures") — the testdata tables carry no images, and writing outside
  * /root/repo is limited to temp space, so each run materializes the same
  * tiny corpus on demand: RGB/RGBA/portrait/landscape/BMP/GIF cases, a
  * corrupt file with an image extension (error-isolation path,
  * appV2.py:183-185), and a non-image extension (excluded by the R1 scan
  * filter, appV2.py:135). */
object ImageFixtures {

  /** Generation tag for SHARED fixture dirs (bump when any generator or
    * bundled resource changes): concurrent JVMs (Verify, Bench, the test
    * suite can overlap) and machines with an old tmpdir must never read
    * a previous generation's files as current — the idempotent
    * write-if-absent below would otherwise leave them in place forever. */
  val generation = "g9"

  /** The shared cross-JVM fixture dir (generation-keyed). */
  def sharedDir: String =
    sys.props("java.io.tmpdir") + s"/graft_img_fixtures_$generation"

  /** Deterministic RGB pixel function. */
  private def pix(x: Int, y: Int, seed: Int): Int = {
    val r = (x * 7 + seed * 13) % 256
    val g = (y * 11 + seed * 29) % 256
    val b = (x * 3 + y * 5 + seed * 31) % 256
    (r << 16) | (g << 8) | b
  }

  private def rgbImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y, seed))
    img
  }

  private def rgbaImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val alpha = (x * 255 / math.max(1, w - 1)) & 0xff
      img.setRGB(x, y, (alpha << 24) | pix(x, y, seed))
    }
    img
  }

  /** Minimal GIF LZW stream: a CLEAR code before every pixel code keeps
    * the code width constant at minCode+1 (the dictionary never grows),
    * so no compression logic is needed — valid per GIF89a Appendix F,
    * and decodes identically everywhere. */
  private def gifLzw(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val width = minCode + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    pixels.foreach { p => emit(clear); emit(p & 0xff) }
    emit(eoi)
    if (nbits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** Hand-crafted GIF89a (4-entry global palette, optional transparent
    * index, one image block per frame — 2+ frames = animated). Exists
    * because ImageIO's writer round-trip cannot pin FORMAT-level parity
    * facts (PIL's mode "P" + transparency → RGBA → white composite;
    * first-frame choice for animations) the way controlled bytes can. */
  /** GIF interlace row order (GIF89a §20, Appendix E): pass 1 rows
    * 0,8,16…, pass 2 rows 4,12…, pass 3 rows 2,6,10…, pass 4 odd rows.
    * Pillow's GifDecode.c and the JDK's GIFImageReader both implement
    * the spec's de-interleave, so a crafted interlaced stream pins the
    * class the same way the Adam7 PNG fixture does. */
  private def gifInterlaceRows(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private[graft] def craftGif(w: Int, h: Int, palette: Array[Int],
                              frames: Seq[Array[Byte]],
                              transparentIndex: Int = -1,
                              frameRect: Option[(Int, Int, Int, Int)] = None,
                              interlaced: Boolean = false)
      : Array[Byte] = {
    require(palette.length == 4, "4-entry palette (GCT size field = 1)")
    val bos = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    bos.write(0x80 | 0x01) // GCT present, 2^(1+1) = 4 entries
    bos.write(0); bos.write(0) // background index, aspect
    palette.foreach { c =>
      bos.write((c >> 16) & 0xff); bos.write((c >> 8) & 0xff); bos.write(c & 0xff)
    }
    val (fx, fy, fw, fh) = frameRect.getOrElse((0, 0, w, h))
    frames.foreach { px0 =>
      require(px0.length == fw * fh, "frame pixel count")
      // interlace: the stream carries rows in pass order; `px0` stays in
      // natural order so the caller's pixel function IS the ground truth
      val px = if (!interlaced) px0
        else gifInterlaceRows(fh).toArray.flatMap(y =>
          px0.slice(y * fw, (y + 1) * fw))
      if (transparentIndex >= 0) {
        bos.write(0x21); bos.write(0xf9); bos.write(4)
        bos.write(0x01) // packed: transparent-color flag
        u16(0) // delay
        bos.write(transparentIndex); bos.write(0)
      }
      bos.write(0x2c); u16(fx); u16(fy); u16(fw); u16(fh)
      bos.write(if (interlaced) 0x40 else 0)
      bos.write(2) // LZW minimum code size
      val lzw = gifLzw(px, 2)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n); off += n
      }
      bos.write(0)
    }
    bos.write(0x3b)
    bos.toByteArray
  }

  /** 4-band JPEG from stored samples, with an optionally injected Adobe
    * APP14 transform (the JDK writer emits none — probed): the crafted
    * shape a CMYK/YCCK file takes. `blocks` paints vertical 8px stripes
    * cycling the given stored 4-tuples; constant 8×8 blocks survive
    * quality-1.0 quantization bit-exactly (probed: stored samples
    * round-trip through readRaster unchanged), so the decode is
    * deterministic without any golden tolerance. */
  private[graft] def craftCmykJpeg(w: Int, h: Int, blocks: Seq[Array[Int]],
                                   adobeTransform: Int = -1): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "8-aligned so constant blocks stay exact")
    val raster = java.awt.image.Raster.createInterleavedRaster(
      java.awt.image.DataBuffer.TYPE_BYTE, w, h, 4, null)
    for (y <- 0 until h; x <- 0 until w) {
      val px = blocks((x / 8) % blocks.length)
      for (b <- 0 until 4) raster.setSample(x, y, b, px(b))
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    try writer.write(null, new javax.imageio.IIOImage(raster, null, null), p)
    finally { writer.dispose(); ios.close() }
    val plain = bos.toByteArray
    if (adobeTransform < 0) plain
    else {
      // APP14 "Adobe" v100, flags 0, transform byte — spliced after SOI
      val seg = Array(0xff, 0xee, 0, 14, 'A'.toInt, 'd'.toInt, 'o'.toInt,
        'b'.toInt, 'e'.toInt, 0, 100, 0, 0, 0, 0, adobeTransform)
        .map(_.toByte)
      plain.take(2) ++ seg ++ plain.drop(2)
    }
  }

  /** Minimal 16bpp BMP (BITMAPINFOHEADER, bottom-up). `is565` writes
    * BI_BITFIELDS with the canonical 565 masks; otherwise BI_RGB
    * (which the format defines as 555). `sample(x, y)` returns the raw
    * packed 16-bit pixel. `masksOverride` substitutes arbitrary masks
    * (for pinning the unsupported-layout refusal). */
  private[graft] def craftBmp16(w: Int, h: Int, is565: Boolean,
                                sample: (Int, Int) => Int,
                                masksOverride: Option[(Int, Int, Int)] = None)
      : Array[Byte] = {
    val comp = if (is565 || masksOverride.isDefined) 3 else 0
    val maskBytes = if (comp == 3) 12 else 0
    val rowBytes = ((w * 2 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    val offset = 14 + 40 + maskBytes
    val size = offset + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(offset)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(16)
      .putInt(comp).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    if (comp == 3) {
      val (rm, gm, bm) = masksOverride.getOrElse((0xf800, 0x07e0, 0x001f))
      b.putInt(rm).putInt(gm).putInt(bm)
    }
    for (y <- (h - 1) to 0 by -1) { // bottom-up row order
      for (x <- 0 until w) b.putShort(sample(x, y).toShort)
      var pad = rowBytes - w * 2
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
    }
    b.array()
  }

  /** Palette BMP (BITMAPINFOHEADER, bottom-up): bpp ∈ {1,4,8}, palette
    * as packed 0xRRGGBB ints written as BGRX quads. `comp` 0 writes
    * BI_RGB rows from `idx(x, y)`; 1/2 (BI_RLE8/BI_RLE4) write the raw
    * `rle` escape stream verbatim (the parity specs own the stream
    * bytes). biClrUsed carries palette.length (0 would imply 2^bpp). */
  private[graft] def craftBmpPalette(bpp: Int, w: Int, h: Int,
      palette: Array[Int], idx: (Int, Int) => Int = (_, _) => 0,
      comp: Int = 0, rle: Array[Byte] = Array.empty): Array[Byte] = {
    val rowBytes = ((w * bpp + 31) / 32) * 4
    val pix =
      if (comp != 0) rle
      else {
        val p = new Array[Byte](rowBytes * h)
        for (y <- 0 until h; x <- 0 until w) {
          val fy = h - 1 - y // bottom-up
          val bitOff = x * bpp
          val o = fy * rowBytes + bitOff / 8
          val shift = 8 - bpp - (bitOff % 8)
          p(o) = (p(o) | (idx(x, y) << shift)).toByte
        }
        p
      }
    val offset = 14 + 40 + palette.length * 4
    val b = java.nio.ByteBuffer.allocate(offset + pix.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(offset + pix.length)
      .putInt(0).putInt(offset)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(bpp.toShort)
      .putInt(comp).putInt(pix.length).putInt(2835).putInt(2835)
      .putInt(palette.length).putInt(0)
    palette.foreach { c =>
      b.put((c & 0xff).toByte).put(((c >> 8) & 0xff).toByte)
        .put(((c >> 16) & 0xff).toByte).put(0.toByte)
    }
    b.put(pix)
    b.array()
  }

  /** 32bpp BMP (BITMAPINFOHEADER, bottom-up): BI_RGB when masks is
    * None (the 4th byte of each pixel is padding — PIL raw mode
    * "BGRX"), BI_BITFIELDS with the given (r, g, b) mask DWORDs
    * otherwise. `px(x, y)` returns the raw little-endian 32-bit pixel
    * (for BI_RGB: 0xXXRRGGBB with XX ignored by both decoders). */
  private[graft] def craftBmp32(w: Int, h: Int, px: (Int, Int) => Int,
      masks: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val comp = if (masks.isDefined) 3 else 0
    val offset = 14 + 40 + (if (comp == 3) 12 else 0)
    val b = java.nio.ByteBuffer.allocate(offset + w * h * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(offset + w * h * 4)
      .putInt(0).putInt(offset)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(32)
      .putInt(comp).putInt(w * h * 4).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    masks.foreach { case (rm, gm, bm) => b.putInt(rm).putInt(gm).putInt(bm) }
    for (y <- (h - 1) to 0 by -1; x <- 0 until w) b.putInt(px(x, y))
    b.array()
  }

  /** 32bpp BI_BITFIELDS BMP with a BITMAPV4HEADER (108 bytes) carrying
    * all FOUR channel masks in-header — the layout alpha-capable
    * writers emit and the shape Pillow's SUPPORTED[32] gate classifies
    * (masks at file offsets 54/58/62/66, exactly where Pillow reads
    * them for header sizes ≥ 56). `px(x, y)` returns the raw
    * little-endian 32-bit pixel value as stored. */
  private[graft] def craftBmp32V4(w: Int, h: Int, px: (Int, Int) => Int,
      rMask: Int, gMask: Int, bMask: Int, aMask: Int): Array[Byte] = {
    val offset = 14 + 108
    val b = java.nio.ByteBuffer.allocate(offset + w * h * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(offset + w * h * 4)
      .putInt(0).putInt(offset)
    b.putInt(108).putInt(w).putInt(h).putShort(1).putShort(32)
      .putInt(3).putInt(w * h * 4).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    b.putInt(rMask).putInt(gMask).putInt(bMask).putInt(aMask)
    b.put("BGRs".getBytes("US-ASCII")) // CSType: calibrated sRGB-ish tag
    (0 until 12).foreach(_ => b.putInt(0)) // endpoints + gamma (unused)
    for (y <- (h - 1) to 0 by -1; x <- 0 until w) b.putInt(px(x, y))
    b.array()
  }

  /** OS/2 BITMAPCOREHEADER BMP (12-byte header, 16-bit dims, RGB
    * TRIPLE palette — no quads, no compression field): bpp ∈ {1, 4, 8}
    * palette classes, or 24 with `idx(x, y)` returning packed
    * 0xRRGGBB. Both Pillow (BmpImagePlugin "12" branch) and the JDK
    * (VERSION_2) decode this legacy layout. */
  private[graft] def craftBmpCore(bpp: Int, w: Int, h: Int,
      palette: Array[Int], idx: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = ((w * bpp + 31) / 32) * 4
    val pix = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val fy = h - 1 - y
      if (bpp == 24) {
        val v = idx(x, y)
        val o = fy * rowBytes + x * 3
        pix(o) = (v & 0xff).toByte
        pix(o + 1) = ((v >> 8) & 0xff).toByte
        pix(o + 2) = ((v >> 16) & 0xff).toByte
      } else {
        val bitOff = x * bpp
        val o = fy * rowBytes + bitOff / 8
        val shift = 8 - bpp - (bitOff % 8)
        pix(o) = (pix(o) | (idx(x, y) << shift)).toByte
      }
    }
    val offset = 14 + 12 + palette.length * 3
    val b = java.nio.ByteBuffer.allocate(offset + pix.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(offset + pix.length)
      .putInt(0).putInt(offset)
    b.putInt(12).putShort(w.toShort).putShort(h.toShort)
      .putShort(1).putShort(bpp.toShort)
    palette.foreach { c =>
      b.put((c & 0xff).toByte).put(((c >> 8) & 0xff).toByte)
        .put(((c >> 16) & 0xff).toByte)
    }
    b.put(pix)
    b.array()
  }

  /** Adam7-INTERLACED truecolor PNG (IHDR interlace = 1): seven passes
    * at the spec's (x0, y0, dx, dy) offsets, one filter-0 scanline per
    * pass row that contains pixels, all passes in one zlib stream.
    * ImageIO's writer never emits interlace, so parity for the class
    * (Pillow and the JDK both implement the spec's lossless
    * de-interleave — probed EXACT on an 11×9 with partial passes)
    * needs crafted bytes. `px(x, y)` returns packed 0xRRGGBB. */
  private[graft] def craftAdam7Png(w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        .putInt(crc.getValue.toInt).array()
    }
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val raw = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes; if x0 < w) {
      var y = y0
      while (y < h) {
        raw.write(0) // filter None
        var x = x0
        while (x < w) {
          val c = px(x, y)
          raw.write((c >> 16) & 0xff); raw.write((c >> 8) & 0xff)
          raw.write(c & 0xff)
          x += dx
        }
        y += dy
      }
    }
    // loop-until-finished + end(): a single deflate() into a fixed
    // headroom buffer would silently truncate near-incompressible input,
    // and an un-end()ed Deflater leaks native zlib memory per call
    val d = new java.util.zip.Deflater()
    val zipped = try {
      d.setInput(raw.toByteArray); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      .put(1.toByte).array() // interlace = 1 (Adam7)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zipped) ++
      chunk("IEND", Array.empty)
  }

  /** A baseline JDK-written JPEG with its SOF0 marker rewritten to SOF9
    * (extended sequential, ARITHMETIC entropy coding — ITU T.81 table
    * B.1): the minimal stream that DECLARES arithmetic coding. Pillow's
    * bundled libjpeg-turbo decodes the class (appV2.py:167 tags it);
    * the JDK cannot — used to pin the engine's explicit refusal
    * message (COVERAGE.md R5 known divergence). The scan stops at the
    * first FF C0, which for a JDK-written baseline stream is the real
    * SOF (entropy data, where FF is escaped as FF 00, only starts after
    * SOS). */
  private[graft] def craftArithmeticJpeg(): Array[Byte] = {
    val src = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(src, "jpg", bos)
    val b = bos.toByteArray
    var i = 2
    var done = false
    while (!done && i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0) {
        b(i + 1) = 0xc9.toByte; done = true
      } else i += 1
    }
    require(done, "no SOF0 marker found to rewrite")
    b
  }

  /** Splice an APP2 ICC_PROFILE segment (single chunk) into a JPEG,
    * right after SOI — the layout AdobeRGB/Display-P3 cameras write.
    * Used to pin that decode IGNORES the profile like PIL (Sun's reader
    * would otherwise color-convert through it). */
  private[graft] def withJpegIcc(jpeg: Array[Byte], icc: Array[Byte]): Array[Byte] = {
    val hdr = "ICC_PROFILE".getBytes("US-ASCII") :+ 0.toByte
    val len = 2 + hdr.length + 2 + icc.length
    require(len <= 0xffff, "single-chunk test profile only")
    val seg = java.nio.ByteBuffer.allocate(4 + hdr.length + 2 + icc.length)
    seg.put(0xff.toByte).put(0xe2.toByte)
      .put((len >> 8).toByte).put((len & 0xff).toByte)
      .put(hdr).put(1.toByte).put(1.toByte) // chunk 1 of 1
      .put(icc)
    jpeg.take(2) ++ seg.array() ++ jpeg.drop(2)
  }

  /** Splice an EXIF APP1 segment carrying ONLY an Orientation tag into
    * a JPEG, right after SOI — the camera shape. Pins that decode
    * IGNORES orientation: PIL's `Image.open` never auto-rotates
    * (rotation is the opt-in `ImageOps.exif_transpose`, which the
    * reference never calls — appV2.py:167 is a bare open), and the
    * JDK's reader ignores EXIF likewise, so pixels must equal the
    * untagged twin's byte-for-byte. Minimal TIFF body: little-endian
    * header, one IFD with the single SHORT tag 0x0112. */
  private[graft] def withJpegExif(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    val tiff = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8) // IFD at 8
    tiff.putShort(1)                       // one directory entry
    tiff.putShort(0x0112.toShort)          // Orientation
    tiff.putShort(3)                       // type SHORT
    tiff.putInt(1)                         // count
    tiff.putShort(orientation.toShort).putShort(0) // value + pad
    tiff.putInt(0)                         // next IFD: none
    val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.array()
    val len = 2 + body.length
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (len >> 8).toByte, (len & 0xff).toByte) ++ body
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Baseline grayscale JPEG built from flat 8×8 blocks with a DRI
    * restart interval — the one baseline-JPEG structure the JDK writer
    * cannot emit (no restart-interval knob), so probing RSTn handling
    * needs crafted bytes. DC-only encoding with a flat quant table of
    * 8 makes the decode EXACT in any spec decoder: quantized DC =
    * v−128 (all 64 AC coefficients zero), dequantized 8·(v−128), IDCT
    * of a DC-only block is the flat value F00/8 = v−128, level shift
    * +128 → v, no rounding anywhere. Pillow's libjpeg and the JDK both
    * decode restart markers per ITU T.81 §B.2.4.4/E.2.4; ground truth
    * is `blocks` itself. Custom minimal Huffman tables (canonical, the
    * all-ones code unused): DC categories 0–8 at 4 bits each, AC EOB
    * alone at 2 bits. `restartInterval` 0 omits DRI/RSTn entirely (the
    * twin fixture proving restarts are pixel-transparent). */
  private[graft] def craftRestartJpeg(wBlocks: Int, hBlocks: Int,
      blocks: Seq[Int], restartInterval: Int): Array[Byte] = {
    require(blocks.length == wBlocks * hBlocks, "one gray value per MCU")
    val bos = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { bos.write(0xff); bos.write(marker) }
    def u16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(67); bos.write(0x00) // DQT: table 0, 8-bit
    (0 until 64).foreach(_ => bos.write(8))
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    m(0xc0); u16(11) // SOF0: 1 component
    bos.write(8); u16(hBlocks * 8); u16(wBlocks * 8); bos.write(1)
    bos.write(1); bos.write(0x11); bos.write(0) // id 1, 1x1 sampling, Tq 0
    // DHT, DC table 0: 9 symbols (categories 0-8), all 4-bit codes
    m(0xc4); u16(2 + 1 + 16 + 9); bos.write(0x00)
    (1 to 16).foreach(l => bos.write(if (l == 4) 9 else 0))
    (0 to 8).foreach(bos.write)
    // DHT, AC table 0: the single EOB symbol (run 0 / size 0) at 2 bits
    m(0xc4); u16(2 + 1 + 16 + 1); bos.write(0x10)
    (1 to 16).foreach(l => bos.write(if (l == 2) 1 else 0))
    bos.write(0x00)
    m(0xda); u16(8) // SOS
    bos.write(1); bos.write(1); bos.write(0x00) // comp 1, DC 0 / AC 0
    bos.write(0); bos.write(63); bos.write(0) // Ss, Se, Ah/Al
    // entropy stream: bit-packer with FF byte-stuffing
    var cur = 0; var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) {
          bos.write(cur)
          if (cur == 0xff) bos.write(0x00)
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushToByte(): Unit = if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits)
    var pred = 0
    var rst = 0
    blocks.zipWithIndex.foreach { case (v, i) =>
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        flushToByte()
        m(0xd0 + rst); rst = (rst + 1) % 8
        pred = 0
      }
      val dc = v - 128
      val diff = dc - pred
      pred = dc
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag) // 0 for diff 0
      putBits(cat, 4) // DC category, 4-bit canonical code = the category
      if (cat > 0) putBits(if (diff >= 0) diff else diff - 1 + (1 << cat), cat)
      putBits(0, 2) // AC EOB (code '00')
    }
    flushToByte()
    m(0xd9) // EOI
    bos.toByteArray
  }

  /** Stored YCCK sample for true ink (c, m, y, k) under the Adobe
    * inverted-storage convention: the YCC channels carry the forward
    * JFIF transform of ink-as-RGB, K stores the complement. */
  private[graft] def ycckStored(c: Int, m: Int, y: Int, k: Int): Array[Int] = {
    def r(v: Double) = math.max(0, math.min(255, math.round(v).toInt))
    Array(
      r(0.299 * c + 0.587 * m + 0.114 * y),
      r(-0.168735892 * c - 0.331264108 * m + 0.5 * y + 128),
      r(0.5 * c - 0.418687589 * m - 0.081312411 * y + 128),
      255 - k)
  }

  /** Write the fixture corpus under `dir` (idempotent, concurrency-safe:
    * every file lands via temp-name + atomic rename, so a reader in
    * another JVM can never observe a torn half-written image — the
    * plain write-if-absent race produced truncated PNGs when Verify and
    * the test suite overlapped on a cold tmpdir). Returns the dir. */
  def ensure(dir: String): String = {
    val d = new File(dir)
    d.mkdirs()
    def writeAtomic(name: String)(gen: File => Unit): Unit = {
      val f = new File(d, name)
      if (!f.exists()) {
        // temp twin in the TARGET's directory (same filesystem, so the
        // rename is atomic; name may carry a subdir like sub/nested.png)
        val tmp = File.createTempFile(s".${f.getName}.", ".tmp", f.getParentFile)
        try {
          gen(tmp)
          try java.nio.file.Files.move(tmp.toPath, f.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            // another JVM won the race — its identical copy is in place
            case _: java.nio.file.FileAlreadyExistsException => ()
          }
        } finally { tmp.delete(); () }
      }
    }
    def write(img: BufferedImage, fmt: String, name: String): Unit =
      writeAtomic(name)(tmp => { ImageIO.write(img, fmt, tmp); () })
    write(rgbImage(64, 48, 1), "png", "landscape.png")
    write(rgbImage(32, 64, 2), "png", "portrait.png")
    write(rgbImage(40, 40, 3), "png", "square.PNG") // upper-case ext (appV2.py:135)
    write(rgbaImage(48, 48, 4), "png", "alpha.png")
    write(rgbImage(24, 24, 5), "bmp", "tiny.bmp")
    // plain grayscale PNG (color type 0, PIL mode "L"): pins the raw-L
    // replication branch — convert("RGB") does NO color management,
    // where Java2D's gray→sRGB conversion gamma-shifts (100 → 168) —
    // inside the hash-checked e2e digest, not just the unit spec
    writeAtomic("gray.png") { tmp =>
      val g = new BufferedImage(28, 20, BufferedImage.TYPE_BYTE_GRAY)
      val r = g.getRaster
      for (y <- 0 until 20; x <- 0 until 28)
        r.setSample(x, y, 0, (x * 9 + y * 17) % 256)
      ImageIO.write(g, "png", tmp)
      ()
    }
    write(rgbImage(24, 24, 6), "gif", "anim.gif")
    // crafted animated GIF with a transparent index (VERDICT r10 #6):
    // PIL opens GIFs as mode "P" + a `transparency` info key →
    // convert("RGBA") → white composite (binary alpha — exact), and
    // Image.open resolves an animation to its FIRST frame; both facts
    // ride the hash-checked e2e digest here. Frame 2 is a different
    // solid color so a wrong-frame choice changes bytes loudly.
    writeAtomic("trans.gif") { tmp =>
      val palette = Array(0x0ac925, 0x28323c, 0x8f1e55, 0xffffff)
      val w = 20; val h = 16
      val f1 = Array.tabulate(w * h)(i =>
        (if ((i % w) < w / 2) 0 else 1).toByte) // left = transparent idx 0
      val f2 = Array.fill(w * h)(2.toByte)
      java.nio.file.Files.write(tmp.toPath,
        craftGif(w, h, palette, Seq(f1, f2), transparentIndex = 0))
      ()
    }
    write(rgbImage(24, 24, 7), "jpg", "photo.jpg")
    // ICC-profiled JPEG (the AdobeRGB/Display-P3 camera shape): PIL
    // ignores the embedded profile at decode (raw JFIF samples), Sun's
    // reader color-converts through it — Images.stripJpegIcc restores
    // parity, and this corpus file rides the hash-checked e2e digest.
    // The digest does NOT depend on the JDK's profile bytes: the
    // profile is stripped before decode, so tags equal the profileless
    // twin's.
    writeAtomic("icc.jpg") { tmp =>
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(rgbImage(24, 24, 11), "jpg", bos)
      val icc = java.awt.color.ICC_Profile
        .getInstance(java.awt.color.ColorSpace.CS_LINEAR_RGB).getData
      java.nio.file.Files.write(tmp.toPath, withJpegIcc(bos.toByteArray, icc))
      ()
    }
    // CMYK JPEG in the Photoshop YCCK layout (Adobe APP14 transform 2,
    // inverted storage): PIL opens it as mode "CMYK" and convert("RGB")s
    // (appV2.py:21-22,41); ImageIO.read() has no CMYK color model, so
    // this pins Images.decodeCmykJpeg's raw-raster Pillow-chain replay
    // inside the hash-checked e2e digest. Blocks: paper white, full
    // black, pure cyan, a mixed tone.
    writeAtomic("cmyk.jpg") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftCmykJpeg(32, 16,
        Seq(ycckStored(0, 0, 0, 0), ycckStored(0, 0, 0, 255),
          ycckStored(255, 0, 0, 0), ycckStored(60, 70, 80, 90)),
        adobeTransform = 2))
      ()
    }
    // 16bpp (555) BMP: the reference allow-list includes .bmp
    // (appV2.py:17) and Pillow's BGR;15 unpacker expands 5-bit samples
    // with TRUNCATING `v * 255 / 31` where the JDK's getRGB rounds — a
    // ±1 on about half the sample values (Images.bmp16Expand). The
    // gradient sweeps all 32 values of each channel so any rounding
    // drift moves the hash-checked e2e digest.
    writeAtomic("lowcolor.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmp16(32, 16, is565 = false,
        (x, y) => ((x & 31) << 10) | (((x + y) & 31) << 5) | (y & 31)))
      ()
    }
    // BMP parity matrix corpus (VERDICT r12 #6): one fixture per
    // accepted decode class, each riding the hash-checked e2e digest so
    // a JDK-side drift in any class moves the gate. The parity itself
    // (JDK ≡ Pillow BmpImagePlugin/Unpack.c, probed) is pinned by the
    // ImagesSpec matrix tests; values here sweep each class's surface.
    val matPal = Array.tabulate(16)(i =>
      ((i * 17) << 16) | ((255 - i * 13) << 8) | ((i * 31) % 256))
    // 8bpp palette, every index used
    writeAtomic("pal8.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmpPalette(8, 16, 12, matPal,
        (x, y) => (x + y) % 16)); ()
    }
    // 4bpp palette (nibble packing, odd width → row padding)
    writeAtomic("pal4.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmpPalette(4, 13, 9, matPal,
        (x, y) => (x * 3 + y) % 16)); ()
    }
    // 1bpp (MSB-first bits, non-black/white palette → PIL mode "P")
    writeAtomic("mono.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmpPalette(1, 18, 7,
        Array(0x204060, 0xe0c0a0), (x, y) => (x ^ y) & 1)); ()
    }
    // RLE8: encoded runs + one absolute run + a delta skip (zero-fill)
    // + EOLs + EOB — every escape class inside the digest
    writeAtomic("rle8.bmp") { tmp =>
      val rle = Array[Byte](
        8, 3, 0, 0, // row0 (bottom): run 8 idx3, EOL
        0, 4, 1, 2, 3, 4, 4, 5, 0, 0, // row1: absolute 4 + run 4 idx5, EOL
        2, 6, 0, 2, 3, 1, // row2: 2px idx6, delta right3 up1 → row3 x5
        3, 7, 0, 1) // 3px idx7 at row3 x5..7, EOB
      java.nio.file.Files.write(tmp.toPath,
        craftBmpPalette(8, 8, 4, matPal, comp = 1, rle = rle)); ()
    }
    // RLE4: nibble-alternating runs + absolute + EOB
    writeAtomic("rle4.bmp") { tmp =>
      val rle = Array[Byte](
        6, 0x5a.toByte, 0, 0, // row0: 5,10,5,10,5,10 then EOL
        0, 6, 0x12, 0x34, 0x56, 0, 0, 0, // row1: absolute 1,2,3,4,5,6 (+pad), EOL
        6, 0x0f, 0, 1) // row2: 0,15,0,15,0,15, EOB
      java.nio.file.Files.write(tmp.toPath,
        craftBmpPalette(4, 6, 3, matPal, comp = 2, rle = rle)); ()
    }
    // 32bpp BI_RGB (BGRX): garbage in the padding byte must not leak
    writeAtomic("deep.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmp32(14, 10,
        (x, y) => (((x * y * 37) % 256) << 24) | (pix(x, y, 12) & 0xffffff)))
      ()
    }
    // OS/2 BITMAPCOREHEADER, 24bpp (16-bit dims, no compression field)
    writeAtomic("legacy.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmpCore(24, 15, 11,
        Array.empty, (x, y) => pix(x, y, 13))); ()
    }
    // Adam7-interlaced PNG: the one PNG layout class the ImageIO
    // writer can't produce; decode parity (lossless de-interleave,
    // both engines) rides the digest. Non-multiple-of-8 dims exercise
    // the partial passes.
    writeAtomic("interlaced.png") { tmp =>
      java.nio.file.Files.write(tmp.toPath,
        craftAdam7Png(27, 21, (x, y) => pix(x, y, 14))); ()
    }
    // r14 probe-class fixtures (VERDICT r13 #3/#4/#6), each riding the
    // hash-checked e2e digest:
    // interlaced GIF — spec 4-pass de-interleave (GIF89a appendix E)
    writeAtomic("interlaced.gif") { tmp =>
      val palette = Array(0x0ac925, 0x28323c, 0x8f1e55, 0xffffff)
      val w = 19; val h = 13
      val px = Array.tabulate(w * h)(i => (((i % w) + 2 * (i / w)) % 4).toByte)
      java.nio.file.Files.write(tmp.toPath,
        craftGif(w, h, palette, Seq(px), interlaced = true)); ()
    }
    // EXIF orientation tag — decode must NOT rotate (bare Image.open
    // never does; appV2.py:167): pixel-identical to photo.jpg
    writeAtomic("oriented.jpg") { tmp =>
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(rgbImage(24, 24, 7), "jpg", bos)
      java.nio.file.Files.write(tmp.toPath,
        withJpegExif(bos.toByteArray, orientation = 6)); ()
    }
    // baseline JPEG with DRI/RSTn restart markers (ITU T.81 §E.2.4):
    // DC-only flat blocks decode EXACTLY, so the digest pins the class
    writeAtomic("restarts.jpg") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftRestartJpeg(4, 3,
        Seq(0, 16, 240, 255, 128, 77, 200, 33, 99, 180, 5, 222),
        restartInterval = 2)); ()
    }
    // 32bpp BITFIELDS BGRA (a SUPPORTED[32] alpha layout): decodes via
    // the engine's own raster reader + white composite
    writeAtomic("bgra32.bmp") { tmp =>
      java.nio.file.Files.write(tmp.toPath, craftBmp32V4(12, 9,
        (x, y) => {
          val c = pix(x, y, 15)
          (((c & 0xff0000) >> 16) << 16) | (c & 0xff00) | (c & 0xff) |
            (((x * 23 + y * 41) % 256) << 24) // fractional alpha sweep
        }, 0xff0000, 0xff00, 0xff, 0xff000000)); ()
    }
    // RLE8 stream ending at an early EOB with rows uncovered: Pillow
    // raises "not enough image data" — an ERROR row in the digest
    writeAtomic("rle_short.bmp") { tmp =>
      val pal = Array.tabulate(16)(i =>
        ((i * 17) << 16) | ((255 - i * 13) << 8) | ((i * 31) % 256))
      java.nio.file.Files.write(tmp.toPath, craftBmpPalette(8, 6, 5, pal,
        comp = 1, rle = Array[Byte](6, 3, 0, 0, 6, 4, 0, 1))); ()
    }
    writeAtomic("corrupt.png")(tmp => java.nio.file.Files.write(
      tmp.toPath, "not an image at all".getBytes))
    // a STRUCTURALLY VALID WebP container with a TRUNCATED zero VP8
    // bitstream (RIFF/WEBP/VP8 chunk headers, no real keyframe): the
    // reference allow-list includes .webp (appV2.py:17); the engine's
    // own readers (graft.images) decode both real halves of the format,
    // while corrupt payloads keep the documented contract
    // (Images.scala): source-inclusion + decode-stage error status —
    // NOT a silent drop. This fixture pins the corrupt-bytes half.
    writeAtomic("photo.webp") { tmp =>
      val payload = new Array[Byte](10) // fake VP8 bitstream bytes
      val body = "WEBP".getBytes("US-ASCII") ++ "VP8 ".getBytes("US-ASCII") ++
        java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(payload.length).array() ++ payload
      val riff = "RIFF".getBytes("US-ASCII") ++
        java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(body.length).array() ++ body
      java.nio.file.Files.write(tmp.toPath, riff)
      ()
    }
    // real libwebp-encoded artifacts (the genuine shapes a crawler
    // yields), all decoded natively by the engine's pure-JVM readers
    // (graft.images, bit-identical to libwebp on the committed goldens)
    // and riding the OK path in the hash-checked img_tagger_e2e fixture:
    //   lossy.webp       — lossy VP8 keyframe (bundled lossy_gradient)
    //   art.webp         — lossless VP8L
    //   translucent.webp — lossy-with-alpha (VP8X + ALPH + VP8)
    //   motion.webp      — animated (ANIM/ANMF), resolved to frame 1
    //                      like the reference's PIL does
    def copyResource(res: String, name: String): Unit =
      writeAtomic(name) { tmp =>
        val in = getClass.getResourceAsStream(s"/graft/fixtures/$res")
        require(in != null, s"missing bundled $res fixture")
        try java.nio.file.Files.write(tmp.toPath, in.readAllBytes())
        finally in.close()
        ()
      }
    copyResource("lossy_gradient.webp", "lossy.webp")
    copyResource("art.webp", "art.webp")
    copyResource("translucent.webp", "translucent.webp")
    copyResource("motion.webp", "motion.webp")
    writeAtomic("note.txt")(tmp => java.nio.file.Files.write(
      tmp.toPath, "excluded by extension".getBytes))
    // underscore/dot-prefixed names: the reference's os.walk tags these
    // (appV2.py:132-137 has no hidden-file notion), while Spark's file
    // index would silently drop them — they pin Images.source's explicit
    // walk (R1 parity)
    write(rgbImage(24, 24, 9), "png", "_shadow.png")
    write(rgbImage(24, 24, 10), "png", ".dotfile.png")
    val sub = new File(d, "sub")
    sub.mkdirs()
    writeAtomic("sub/nested.png")(tmp =>
      { ImageIO.write(rgbImage(20, 20, 8), "png", tmp); () })
    d.getAbsolutePath
  }

  /** Default fixture vocabulary for image-pipeline runs: 32 tags cycling
    * the 8 categories (same deterministic generator as the oracle vocab). */
  def vocab(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    Tagging.syntheticVocab(spark, 32)
}
