package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** The Spark-side plumbing of the multimodal stage is real and under
  * test: schema, batch shape, partitioning-invariance, error isolation.
  * (Audio/video decode are deterministic fakes — see Multimodal scaladoc.) */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fixtureMedia(spark, 30)

  test("fixture schema and kind distribution") {
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "kind", "content",
      "width", "height", "sample_rate", "n_frames"))
    assert(media.schema("content").dataType.typeName === "binary")
    val byKind = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind === Map("image" -> 8, "audio" -> 8, "video" -> 7, "anim" -> 7))
  }

  test("feature extraction: per-kind feature shapes, all ok") {
    val f = Multimodal.extractFeatures(media).cache()
    assert(f.filter(col("status") =!= "ok").count() === 0)
    val dims = f.select(col("kind"), size(col("features")).as("d"))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dims("image") === 3)  // per-channel means
    assert(dims("audio") === 3)  // rms, zcr, peak
    assert(dims("video") === 3)  // 12 frames sampled every 4
    assert(dims("anim") === 2)   // 6 real ANMF frames sampled every 4
    // image means must reflect real decode (not all-zero, in [-1,1])
    val img = f.filter(col("kind") === "image").select("features").head()
      .getSeq[Double](0)
    assert(img.forall(v => v >= -1 && v <= 1) && img.exists(_ != 0.0))
    // anim means are real pixel-byte means: in (0, 255), frames distinct
    val anim = f.filter(col("kind") === "anim").select("features").head()
      .getSeq[Double](0)
    assert(anim.forall(v => v > 0 && v < 255) && anim.distinct.length === 2)
  }

  test("partitioning invariance: same features at 1 and 7 partitions") {
    def run(parts: Int) = Multimodal.extractFeatures(media.repartition(parts))
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(1) === run(7))
  }

  test("thumbnails: real ImageIO downscale, aspect preserved, error isolated") {
    import org.apache.spark.sql.functions._
    val all = Multimodal.thumbnails(media, maxSide = 16).collect()
    // every input row appears: images decode, non-images (audio, video,
    // anim — the thumbnail op is stills-only by contract) hit the error
    // channel
    assert(all.length === 30)
    val nonImage = all.filter(_.getAs[String]("status").startsWith("error: not an image"))
    assert(nonImage.length === 22)
    val thumbs = all.filter(_.getAs[String]("status") === "ok")
    assert(thumbs.length === 8)
    thumbs.foreach { r =>
      val (w, h) = (r.getAs[Int]("thumb_w"), r.getAs[Int]("thumb_h"))
      assert(math.max(w, h) === 16)
      // 64×48 source → 16×12 aspect-preserving
      assert(w === 16 && h === 12)
      // output is a real decodable PNG
      val png = r.getAs[Array[Byte]]("thumb_png")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(back.getWidth === 16 && back.getHeight === 12)
    }
    // corrupt bytes → error channel
    import spark.implicits._
    val bad = Seq((99L, "image", Array[Byte](1, 2, 3), 0, 0, 0, 0))
      .toDF("media_id", "kind", "content", "width", "height", "sample_rate", "n_frames")
    val er = Multimodal.thumbnails(bad).collect()
    assert(er.length === 1 && er.head.getAs[String]("status").startsWith("error:"))
  }

  test("error isolation: corrupt image bytes produce an error row, not a failure") {
    import spark.implicits._
    val bad = Seq((99L, "image", "garbage".getBytes, 0, 0, 0, 0))
      .toDF("media_id", "kind", "content", "width", "height", "sample_rate", "n_frames")
    val out = Multimodal.extractFeatures(bad).collect()
    assert(out.length === 1 && out.head.getAs[String]("status").startsWith("error:"))
  }

  test("frame sampling: every 4th frame as its own row, non-fanout kinds in the error channel") {
    val media = Multimodal.fixtureMedia(spark, 30)
    val out = Multimodal.sampleFrames(media, every = 4).collect()
    // every input row is accounted for: videos and anims fan out, others
    // emit one error row each
    val videos = media.filter(org.apache.spark.sql.functions.col("kind") === "video").count()
    val anims = media.filter(org.apache.spark.sql.functions.col("kind") === "anim").count()
    val ok = out.filter(_.getAs[String]("status") == "ok")
    val err = out.filter(_.getAs[String]("status").startsWith("error:"))
    assert(err.length.toLong === media.count() - videos - anims)
    assert(ok.map(_.getAs[Long]("media_id")).distinct.length.toLong === videos + anims)
    // fixture videos (media_id % 4 == 2) have 12 fake frames → 0, 4, 8;
    // anims (media_id % 4 == 3) are clip2's 8 COMPOSITED ANMF frames
    // (blend/dispose/partial all decode) → 0, 4
    val (videoRows, animRows) = ok.partition(_.getAs[Long]("media_id") % 4 == 2)
    assert(videoRows.groupBy(_.getAs[Long]("media_id")).values.forall(
      _.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 4, 8))))
    assert(animRows.groupBy(_.getAs[Long]("media_id")).values.forall(
      _.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 4))))
    // video per-frame means match a driver replay of the deterministic codec
    videoRows.foreach { r =>
      val (id, f) = (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"))
      var s = 0.0
      (f * 256 until (f + 1) * 256).foreach(i => s += ((i * 31 + id * 17) % 251).toDouble)
      assert(r.getAs[Double]("mean_byte") === math.rint(s / 256 * 1e6) / 1e6,
        s"media $id frame $f")
    }
    // anim per-frame means are anchored to the clip2 COMPOSITED goldens
    // (tools/make_alpha_fixtures.py): mean over the golden canvas's RGBA
    // bytes — frame pixels C-decoded by libwebp, canvas arithmetic the
    // generator's independent reimplementation, not our decoder twice
    def goldenMean(res: String): Double = {
      val in = getClass.getResourceAsStream(s"/graft/alpha/$res")
      require(in != null, s"missing $res")
      val g = try in.readAllBytes() finally in.close()
      val px = g.drop(8)
      math.rint(px.map(b => (b & 0xff).toDouble).sum / px.length * 1e6) / 1e6
    }
    val wantByFrame = Map(0 -> goldenMean("clip2_64x48_f0.composited"),
                          4 -> goldenMean("clip2_64x48_f4.composited"))
    animRows.foreach { r =>
      assert(r.getAs[Double]("mean_byte") ===
        wantByFrame(r.getAs[Int]("frame_idx")),
        s"media ${r.getAs[Long]("media_id")} frame ${r.getAs[Int]("frame_idx")}")
      assert(r.getAs[Int]("n_bytes") === 64 * 48 * 4)
    }
  }

  test("frame sampling edge cases: truncated video errors (no NaN), bad step rejected") {
    import spark.implicits._
    // 6 bytes claiming 12 frames → frameSize 0 → ONE error row, never
    // NaN frames with status ok
    val truncated = Seq((7L, "video", Array.fill(6)(1.toByte), 0, 0, 0, 12))
      .toDF("media_id", "kind", "content", "width", "height", "sample_rate", "n_frames")
    val out = Multimodal.sampleFrames(truncated).collect()
    assert(out.length === 1 && out.head.getAs[String]("status").startsWith("error:"))
    assert(!out.exists(r => r.getAs[Double]("mean_byte").isNaN))
    // a non-positive step is a caller error, not silent row loss
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(truncated, every = -1)
    }
  }

  test("degenerate inputs: features and frame sampling agree, 1-sample audio is valid") {
    import spark.implicits._
    val rows = Seq(
      // n_frames=0 video: BOTH ops must route it to the error channel —
      // extractFeatures used to emit status ok with empty features while
      // sampleFrames errored, contradictory accounting for the same row
      (1L, "video", Array.fill(64)(1.toByte), 0, 0, 0, 0),
      // 2 content bytes = one 16-bit sample: one PARTIAL sliding window;
      // zero-crossing must be 0, not an IndexOutOfBounds error row
      (2L, "audio", Array[Byte](0x10, 0x20), 0, 0, 8000, 0))
      .toDF("media_id", "kind", "content", "width", "height", "sample_rate", "n_frames")
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("status")).toMap
    assert(feats(1L).startsWith("error:"),
      "n_frames=0 video must be an error row in extractFeatures too")
    assert(feats(2L) === "ok", "a 1-sample audio row is decodable")
    val frames = Multimodal.sampleFrames(rows.filter(col("kind") === "video")).collect()
    assert(frames.length === 1 && frames.head.getAs[String]("status").startsWith("error:"))
  }
}
