package graft.queries

import graft.{ImageFixtures, Images, Tagging}
import org.apache.spark.sql.functions._

/** The reference's flagship image chain as a declared query (rows-only
  * driver check — decode/score is not ANSI-expressible, SURVEY.md §5).
  * Images are deterministic generated fixtures (no images ship in the
  * testdata); the scorer is the FixtureScorer stand-in for the
  * unavailable ONNX model. */
object ImageQueries extends QueryRegistry {

  private val e2e = NamedQuery(
    "img_tagger_e2e",
    (spark, _) => {
      val dir = ImageFixtures.ensure(
        sys.props("java.io.tmpdir") + "/graft_img_fixtures")
      Images.tagImages(spark, dir, ImageFixtures.vocab(spark),
          Images.FixtureScorer(32), recursive = false)
        .select(
          element_at(split(col("path"), "/"), -1).as("file"),
          col("status"), col("tags"))
        .orderBy("file")
    },
    None)

  // Multimodal feature extraction over the mixed binary-column fixture
  // (rows-only check — binary decode is not ANSI-expressible).
  private val mm = NamedQuery(
    "mm_features",
    (spark, _) => graft.ops.Multimodal
      .extractFeatures(graft.ops.Multimodal.fixtureMedia(spark, 30))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        size(col("features")).as("n_features"), col("status"))
      .orderBy("media_id"),
    None)

  // Thumbnail/derived-asset materialization over the same fixture
  // (rows-only check): real ImageIO downscale for image rows, explicit
  // error channel for everything else — every input row accounted for.
  private val thumbs = NamedQuery(
    "mm_thumbnails",
    // maxSide=32 < the 64x48 fixture image's long side, so the query
    // exercises the actual downscale branch (aspect-preserving bilinear
    // resize), not just decode + re-encode passthrough
    (spark, _) => graft.ops.Multimodal
      .thumbnails(graft.ops.Multimodal.fixtureMedia(spark, 30), maxSide = 32)
      .select(col("media_id"), col("thumb_w"), col("thumb_h"),
        length(col("thumb_png")).as("n_png_bytes"), col("status"))
      .orderBy("media_id"),
    None)

  // Frame sampling as row expansion (rows-only check): every 4th frame
  // of each fixture video becomes its own row; non-video inputs land in
  // the error channel, one row each.
  private val frames = NamedQuery(
    "mm_frame_sample",
    (spark, _) => graft.ops.Multimodal
      .sampleFrames(graft.ops.Multimodal.fixtureMedia(spark, 30), every = 4)
      .orderBy("media_id", "frame_idx"),
    None)

  val all: Seq[NamedQuery] = Seq(e2e, mm, thumbs, frames)
}
