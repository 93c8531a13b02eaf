package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational tagging core — the reference's `get_tags` + sigmoid
  * (reference appV2.py:74-101,174) re-expressed as Spark built-ins.
  *
  * The central reframing (SURVEY.md §2): a score vector per item is a
  * long-format relation scores(image_id, tag_idx, prob) joined to the
  * vocabulary dimension; tag selection is
  *   - per-category top-1 (unthresholded) for rating/quality (appV2.py:77-83)
  *   - per-category threshold filter for the other six (appV2.py:86-97)
  *   - a substring blacklist anti-filter on meta tags (appV2.py:98-99)
  *   - underscore→space projection (appV2.py:83,97)
  *   - ordered group-concat, order = (category emission rank, JSON
  *     insertion position) (appV2.py:62-68,77,86-89,93)
  *
  * Everything here is Catalyst built-ins (whole-stage codegen'd, no UDFs):
  * scale comes from one shuffle on image_id for the argmax aggregation and
  * one for the final concat; the vocab join is an explicit broadcast (the
  * dimension is tiny — mirror of the reference's in-memory index,
  * appV2.py:70-71).
  */
object Tagging {

  /** Clipped sigmoid 1/(1+e^-clip(x,-30,30)) (appV2.py:174). The clip is
    * semantic, not cosmetic: logits beyond ±30 saturate to the SAME prob,
    * so argmax tie-breaking (first in category-index insertion order,
    * numpy argmax contract) can engage where raw logits would differ. */
  def clippedSigmoid(x: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-greatest(least(x.cast("double"), lit(30.0)), lit(-30.0))))

  /** Vector → long format: (id, tag_idx LONG, logit DOUBLE). posexplode is
    * the Spark dual of numpy fancy-indexing over the score vector
    * (appV2.py:79,92). */
  def explodeScores(scores: DataFrame, idCol: String = "image_id",
                    vecCol: String = "logits"): DataFrame =
    scores.select(
      col(idCol).as("image_id"),
      posexplode(col(vecCol)).as(Seq("tag_idx", "logit")))
      .select(col("image_id"), col("tag_idx").cast("long").as("tag_idx"),
        col("logit").cast("double").as("logit"))

  /** Category → emission rank (appV2.py:77,86-89): rating, quality first
    * (argmax loop order), then threshold_map insertion order. */
  def catRank(category: Column): Column =
    Vocab.emissionRank.foldLeft(lit(-1)) { case (acc, (cat, rank)) =>
      when(category === cat, lit(rank)).otherwise(acc)
    }

  /** From long-format probs (image_id, tag_idx, prob) and the vocab
    * dimension (must carry emit_pos — Vocab.toDF / syntheticVocab do),
    * select tags per the reference contract. Returns
    * (image_id, cat_rank INT, emit_pos LONG, tag_idx LONG, display STRING). */
  def selectTags(probs: DataFrame, vocab: DataFrame,
                 genThreshold: Double = 0.55, charThreshold: Double = 0.60): DataFrame = {
    // Inner join reproduces both the dense-array hole skip and the
    // None-name guard (appV2.py:82,96): a tag_idx with no vocab row
    // selects nothing.
    val joined = probs.join(broadcast(vocab), "tag_idx")

    // Unthresholded per-category argmax for rating/quality (appV2.py:77-83).
    // numpy argmax returns the FIRST max in the category index array,
    // which is built in JSON-insertion order (appV2.py:62-68) → ties
    // break to the lowest emit_pos, NOT the lowest tag_idx (they differ
    // when the mapping's keys are not ascending); max_by over
    // struct(prob, -emit_pos) encodes exactly that.
    val argmax = joined
      .filter(col("category").isin(Vocab.argmaxCategories: _*))
      .groupBy("image_id", "category")
      .agg(max_by(
        struct(col("emit_pos"), col("tag_idx"), col("tag_name")),
        struct(col("prob"), negate(col("emit_pos")))).as("best"))
      .select(col("image_id"), col("category"),
        col("best.emit_pos").as("emit_pos"),
        col("best.tag_idx").as("tag_idx"), col("best.tag_name").as("tag_name"))

    // Category-dependent threshold filter (appV2.py:86-97); >= not >.
    val thresholded = joined
      .filter(
        (col("category").isin(Vocab.genThresholdCategories: _*) &&
          col("prob") >= lit(genThreshold)) ||
        (col("category").isin(Vocab.charThresholdCategories: _*) &&
          col("prob") >= lit(charThreshold)))
      .select("image_id", "category", "emit_pos", "tag_idx", "tag_name")

    val display = regexp_replace(col("tag_name"), "_", " ")
    // Substring (not word) blacklist on meta tags, checked on the
    // lower-cased underscore-replaced name (appV2.py:97-98 — replace
    // happens BEFORE the check).
    val blacklisted = Vocab.metaBlacklist
      .map(s => lower(display).contains(s))
      .reduce(_ || _)

    argmax.unionByName(thresholded)
      .filter(!(col("category") === "meta" && blacklisted))
      .select(col("image_id"), catRank(col("category")).as("cat_rank"),
        col("emit_pos"), col("tag_idx"), display.as("display"))
  }

  /** Ordered group-concat (appV2.py:101): ", ".join in (cat_rank,
    * emit_pos) order — the reference emits threshold tags in category-
    * index (JSON insertion) order. `ids` must hold one row per input item
    * (column image_id) so items with zero selected tags still emit an
    * empty string, like the reference writing an empty .txt. */
  def concatTags(ids: DataFrame, selected: DataFrame): DataFrame = {
    val agg = selected
      .groupBy("image_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("cat_rank"), col("emit_pos"), col("display")))),
          x => x.getField("display")),
        ", ").as("tags"))
    ids.select(col("image_id")).join(agg, Seq("image_id"), "left")
      .withColumn("tags", coalesce(col("tags"), lit("")))
  }

  /** Full pipeline: scores(id, logits ARRAY) × vocab → (image_id, tags). */
  def pipeline(scores: DataFrame, vocab: DataFrame,
               genThreshold: Double = 0.55, charThreshold: Double = 0.60,
               idCol: String = "image_id", vecCol: String = "logits"): DataFrame = {
    val probs = explodeScores(scores, idCol, vecCol)
      .withColumn("prob", clippedSigmoid(col("logit")))
    val selected = selectTags(probs, vocab, genThreshold, charThreshold)
    concatTags(scores.select(col(idCol).as("image_id")), selected)
  }

  /** Deterministic synthetic vocabulary over tag_idx 0..n-1, mirrored
    * exactly by SQL in the DuckDB oracle (see SparkEntry.oracleSql):
    * category cycles through the 8 recognized ones; every 16th index in
    * the meta lane gets a blacklisted name (substring "id") to keep the
    * anti-filter under oracle test; underscore names exercise the
    * underscore→space projection. */
  def syntheticVocab(spark: SparkSession, n: Int = 64): DataFrame =
    spark.range(n).select(
      col("id").as("tag_idx"),
      // synthetic mapping is ascending → insertion order == tag_idx
      col("id").as("emit_pos"),
      expr("CASE WHEN id % 8 = 5 AND id % 16 = 13 " +
        "THEN concat('meta_id_', CAST(id AS STRING)) " +
        "ELSE concat('tag_', CAST(id AS STRING)) END").as("tag_name"),
      expr("CASE CAST(id % 8 AS INT) " +
        "WHEN 0 THEN 'rating' WHEN 1 THEN 'general' WHEN 2 THEN 'artist' " +
        "WHEN 3 THEN 'character' WHEN 4 THEN 'copyright' WHEN 5 THEN 'meta' " +
        "WHEN 6 THEN 'quality' ELSE 'model' END").as("category"))

  /** SQL text of the synthetic vocab for the DuckDB oracle (DuckDB `range`
    * produces column `range`). Must stay in lockstep with syntheticVocab. */
  def syntheticVocabSql(n: Int = 64): String =
    s"""SELECT range AS tag_idx,
       |  CASE WHEN range % 8 = 5 AND range % 16 = 13
       |       THEN 'meta_id_' || CAST(range AS VARCHAR)
       |       ELSE 'tag_' || CAST(range AS VARCHAR) END AS tag_name,
       |  CASE CAST(range % 8 AS INT)
       |       WHEN 0 THEN 'rating' WHEN 1 THEN 'general' WHEN 2 THEN 'artist'
       |       WHEN 3 THEN 'character' WHEN 4 THEN 'copyright' WHEN 5 THEN 'meta'
       |       WHEN 6 THEN 'quality' ELSE 'model' END AS category
       |FROM range(0, $n)""".stripMargin
}
