package graft.ops

import graft.Images
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star op): image/audio/video as opaque BINARY
  * columns with typed metadata, feature extraction as per-partition batch
  * map work — the Scala-idiomatic equivalent of a mapInPandas stage (one
  * init per partition, iterator-in/iterator-out, columnar-friendly
  * output schema).
  *
  * Decode reality in this container (no codec libraries): IMAGE decode is
  * REAL (JDK ImageIO, shared with graft.Images), and ANIM decode is REAL
  * (the engine's own ANMF canvas compositor + per-frame VP8/VP8L/ALPH
  * decoders, graft.images.WebPContainer.compositedFrames — blend/dispose
  * semantics golden-validated frame by frame in AnimCompositeSpec). AUDIO and VIDEO decode are DETERMINISTIC FAKES —
  * audio "decode" parses the synthetic s16le PCM layout the fixture
  * generator writes; video "decode" treats content as fixed-size frame
  * blocks and samples every k-th frame. A real codec drops into
  * `decodeAudio`/`decodeVideoFrame` without touching the Spark plumbing
  * (schema, partitioning, batch shape), which is real and under test. */
object Multimodal {

  val kinds = Seq("image", "audio", "video", "anim")

  // ---------- fixture corpus (deterministic) ----------

  private def sineAudioBytes(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val f = 110.0 * (1 + (id % 5))
      val s = (math.sin(2 * math.Pi * f * i / sampleRate) * 12000).toShort
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def frameVideoBytes(id: Long, nFrames: Int, frameSize: Int): Array[Byte] = {
    val out = new Array[Byte](nFrames * frameSize)
    var i = 0
    while (i < out.length) {
      out(i) = ((i * 31 + id * 17) % 251).toByte
      i += 1
    }
    out
  }

  /** The bundled 8-frame animated WebP (clip2): partial rects, alpha
    * blending, no-blend overwrite, a dispose-to-background frame, and
    * lossless/lossy/lossy+ALPH payloads — decoded through the engine's
    * ANMF canvas compositor (WebPContainer.compositedFrames), with
    * per-frame composited goldens pinned by AnimCompositeSpec. */
  private lazy val clipBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/clip2.webp")
    require(in != null, "missing bundled clip2.webp fixture")
    try in.readAllBytes() finally in.close()
  }

  /** Deterministic mixed-media table:
    * media(media_id, kind, content BINARY, width, height, sample_rate,
    * n_frames). */
  def fixtureMedia(spark: SparkSession, n: Int = 30): DataFrame = {
    import spark.implicits._
    val imgDir = graft.ImageFixtures.ensure(graft.ImageFixtures.sharedDir)
    val imgBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(imgDir, "landscape.png"))
    val rows = (0 until n).map { i =>
      val id = i.toLong
      (i % 4) match {
        case 0 => (id, "image", imgBytes, 64, 48, 0, 0)
        case 1 => (id, "audio", sineAudioBytes(id, 4000, 8000), 0, 0, 8000, 0)
        case 2 => (id, "video", frameVideoBytes(id, 12, 256), 16, 16, 0, 12)
        case _ => (id, "anim", clipBytes, 64, 48, 0, 8)
      }
    }
    rows.toDF("media_id", "kind", "content", "width", "height",
      "sample_rate", "n_frames")
  }

  // ---------- "decoders" (see scaladoc: image real, audio/video fakes) ----------

  private def decodeAudio(bytes: Array[Byte]): Array[Double] = {
    // deterministic fake codec: s16le PCM
    val n = bytes.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1).toInt
      out(i) = ((hi << 8) | lo) / 32768.0
      i += 1
    }
    out
  }

  private def decodeVideoFrame(bytes: Array[Byte], frame: Int, frameSize: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, frame * frameSize,
      math.min(bytes.length, (frame + 1) * frameSize))

  /** Mean unsigned-byte value of one decoded frame — shared by
    * extractFeatures and sampleFrames so edge handling cannot drift
    * between them. Empty frames are a decode error, never a NaN. */
  private def frameByteMean(bytes: Array[Byte], frame: Int, frameSize: Int): Double = {
    val fr = decodeVideoFrame(bytes, frame, frameSize)
    if (fr.isEmpty) throw new IllegalArgumentException(s"empty frame $frame")
    fr.map(b => (b & 0xff).toDouble).sum / fr.length
  }

  /** REAL per-frame decode for animated WebP: EVERY ANMF frame of the
    * container as the viewer sees it, via the engine's canvas
    * compositor (graft.images.WebPContainer.compositedFrames — blend +
    * dispose semantics, so partial/blending frames decode correctly
    * instead of being dropped; every frame up to the last sampled one
    * must decode, since compositing is stateful). Returns (frame_idx,
    * pixelByteMean over all four ARGB channels, n_pixel_bytes) per
    * k-th frame — the same scalar digest shape the fake video codec
    * feeds, shared by extractFeatures and sampleFrames so edge handling
    * cannot drift between them. */
  private def sampledAnimFrames(bytes: Array[Byte],
                                every: Int): IndexedSeq[(Int, Double, Int)] = {
    // sampleEvery pushes the sampling INTO the compositor: every frame
    // still decodes (canvas state is stateful) but only every k-th is
    // snapshotted, so memory is one canvas + the sampled frames
    val frames = graft.images.WebPContainer.compositedFrames(bytes, every)
    if (frames.isEmpty)
      throw new IllegalArgumentException("no decodable frames")
    frames.indices.map { j =>
      val f = j * every
      val d = frames(j)
      var s = 0.0
      var i = 0
      while (i < d.argb.length) {
        val p = d.argb(i)
        s += ((p >>> 24) & 0xff) + ((p >> 16) & 0xff) +
          ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      (f, s / (4.0 * d.argb.length), 4 * d.argb.length)
    }
  }

  // ---------- the feature-extraction stage ----------

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      features: Array[Double], status: String)

  final case class Thumb(media_id: Long, thumb_png: Array[Byte],
                         thumb_w: Int, thumb_h: Int, status: String)

  /** REAL image resize stage: decode (ImageIO) → aspect-preserving
    * downscale to fit `maxSide` → re-encode PNG, executor-side with
    * per-row error isolation. The thumbnail/derived-asset materialization
    * every multimodal corpus pipeline runs; every input row appears in
    * the output — non-image rows and corrupt bytes land in the error
    * channel (status != "ok"), never fail the job and are never silently
    * dropped. */
  def thumbnails(media: DataFrame, maxSide: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, kind, bytes) =>
          if (kind != "image")
            Thumb(id, Array.empty[Byte], 0, 0, s"error: not an image (kind=$kind)")
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) throw new IllegalArgumentException("undecodable image")
            val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
            val (w, h) =
              if (scale >= 1.0) (img.getWidth, img.getHeight)
              else (math.max(1, (img.getWidth * scale).round.toInt),
                    math.max(1, (img.getHeight * scale).round.toInt))
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            Thumb(id, buf.toByteArray, w, h, "ok")
          } catch {
            case e: Exception =>
              Thumb(id, Array.empty[Byte], 0, 0,
                s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
          }
        }
      }
      .toDF()
  }

  /** One sampled frame (or one error row). Error-row contract, uniform
    * across every kind (anim, video, not-a-video): frame_idx = -1,
    * n_bytes = 0, mean_byte = 0.0 — n_bytes always describes the
    * DECODED frame, never the input container, so error rows (which
    * decoded nothing) report 0 regardless of input length. */
  final case class FrameRow(media_id: Long, frame_idx: Int, n_bytes: Int,
      mean_byte: Double, status: String)

  /** Frame sampling as a FIRST-CLASS row expansion: every k-th frame of
    * each video becomes its own output row — the explode step a video
    * training pipeline runs before per-frame downstream work (dedup,
    * embedding, captioning), where one media row fans into many frame
    * rows and the frame relation, not the video relation, is what
    * shuffles from then on. Iterator-in/iterator-out (a flatMap inside
    * mapPartitions — one decoder handle per partition, rows never
    * buffered per video), per-row error isolation: non-video and
    * undecodable inputs emit ONE error-channel row each, so every input
    * is accounted for in the output. */
  def sampleFrames(media: DataFrame, every: Int = 4): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"), col("n_frames"))
      .as[(Long, String, Array[Byte], Int)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, kind, bytes, nFrames) =>
          if (kind == "anim") try {
            // REAL decode: every k-th standalone ANMF frame through the
            // engine's own VP8/VP8L readers
            sampledAnimFrames(bytes, every).map { case (f, mean, nb) =>
              FrameRow(id, f, nb, math.rint(mean * 1e6) / 1e6, "ok")
            }
          } catch {
            case e: Exception =>
              Seq(FrameRow(id, -1, 0, 0.0,
                s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"))
          }
          else if (kind != "video")
            Seq(FrameRow(id, -1, 0, 0.0, s"error: not a video (kind=$kind)"))
          else try {
            val frameSize = if (nFrames > 0) bytes.length / nFrames else 0
            if (frameSize <= 0)
              throw new IllegalArgumentException(
                s"undecodable: ${bytes.length} bytes for $nFrames frames")
            // materialized INSIDE the try: a lazy iterator would escape
            // the catch and a frame-decode failure would kill the task
            // instead of landing in the error channel
            (0 until nFrames by every).map { f =>
              val mean = frameByteMean(bytes, f, frameSize)
              FrameRow(id, f, frameSize, math.rint(mean * 1e6) / 1e6, "ok")
            }
          } catch {
            case e: Exception =>
              Seq(FrameRow(id, -1, 0, 0.0,
                s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"))
          }
        }
      }
      .toDF()
  }

  /** Batch feature extraction: per-partition init (the scorer/codec
    * handle), iterator-in/iterator-out, per-row error isolation — the
    * exact batch shape a Pandas-UDF stage has, minus Python. Features:
    * image → per-channel means of the preprocessed tensor; audio → RMS,
    * zero-crossing rate, peak; video → per-sampled-frame byte means. */
  def extractFeatures(media: DataFrame, frameSampleEvery: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"),
        col("sample_rate"), col("n_frames"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { iter =>
        iter.map { case (id, kind, bytes, _, nFrames) =>
          try {
            val feats = kind match {
              case "image" =>
                val t = Images.preprocess(bytes, targetSize = 32)
                val n = t.length / 3
                Array(0, 1, 2).map { c =>
                  var s = 0.0; var i = 0
                  while (i < n) { s += t(c * n + i); i += 1 }
                  s / n
                }
              case "audio" =>
                val pcm = decodeAudio(bytes)
                val rms = math.sqrt(pcm.map(x => x * x).sum / pcm.length)
                // a 1-sample stream yields one PARTIAL sliding window —
                // p(1) on it would throw a valid row into the error channel
                val zc = pcm.sliding(2).filter(_.length == 2)
                  .count(p => p(0) * p(1) < 0).toDouble / pcm.length
                Array(rms, zc, pcm.map(math.abs).max)
              case "video" =>
                // same degenerate-input rule as sampleFrames: n_frames<=0
                // is an ERROR row, not a silent "ok" with empty features —
                // the two ops must not drift on edge handling
                val frameSize = if (nFrames > 0) bytes.length / nFrames else 0
                if (frameSize <= 0)
                  throw new IllegalArgumentException(
                    s"undecodable: ${bytes.length} bytes for $nFrames frames")
                (0 until nFrames by frameSampleEvery).map { f =>
                  frameByteMean(bytes, f, frameSize)
                }.toArray
              case "anim" =>
                // real per-frame decode, same sampled-mean digest as
                // sampleFrames
                sampledAnimFrames(bytes, frameSampleEvery)
                  .map(_._2).toArray
              case other => throw new IllegalArgumentException(s"unknown kind $other")
            }
            MediaFeatures(id, kind, bytes.length, feats.map(d => math.rint(d * 1e6) / 1e6), "ok")
          } catch {
            case e: Exception =>
              MediaFeatures(id, kind, if (bytes == null) 0 else bytes.length,
                Array.empty[Double],
                s"error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
          }
        }
      }
      .toDF()
  }
}
