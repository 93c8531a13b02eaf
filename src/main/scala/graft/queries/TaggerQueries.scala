package graft.queries

import graft.{Tables, Tagging}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship pipeline (reference appV2.py:165-185) under
  * DuckDB-oracle test: the `embeddings` fixture plays the model's score
  * vectors (logit = 4 × component — ×4 is a power of two, so Spark and
  * DuckDB compute bit-identical doubles), the vocabulary is the
  * deterministic synthetic dimension generated identically in both
  * engines. Output (image_id, tags) exercises the full contract:
  * clipped sigmoid, argmax, thresholds, blacklist, underscore→space,
  * ordered concat. */
object TaggerQueries extends QueryRegistry {

  /** embeddings → scores(image_id, logits ARRAY<DOUBLE>). */
  def scoresFromEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("image_id"),
      transform(col("embedding"), x => x.cast("double") * lit(4.0)).as("logits"))

  private val probsSql =
    """SELECT vec_id AS image_id,
      |       generate_subscripts(embedding, 1) - 1 AS tag_idx,
      |       1/(1 + exp(-greatest(least(CAST(unnest(embedding) AS DOUBLE) * 4, 30), -30))) AS prob
      |FROM embeddings""".stripMargin

  private def pipelineSql(genT: Double, charT: Double): String =
    s"""WITH vocab AS (${Tagging.syntheticVocabSql(64)}),
       |probs AS ($probsSql),
       |joined AS (
       |  SELECT p.image_id, p.tag_idx, p.prob, v.tag_name, v.category
       |  FROM probs p JOIN vocab v USING (tag_idx)),
       |argmax AS (
       |  SELECT image_id, category, tag_idx, tag_name
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY image_id, category ORDER BY prob DESC, tag_idx) AS rn
       |        FROM joined WHERE category IN ('rating','quality')) r
       |  WHERE rn = 1),
       |thresh AS (
       |  SELECT image_id, category, tag_idx, tag_name FROM joined
       |  WHERE (category IN ('general','meta','model') AND prob >= $genT)
       |     OR (category IN ('character','copyright','artist') AND prob >= $charT)),
       |sel AS (
       |  SELECT image_id,
       |         CASE category WHEN 'rating' THEN 0 WHEN 'quality' THEN 1
       |              WHEN 'general' THEN 2 WHEN 'meta' THEN 3 WHEN 'model' THEN 4
       |              WHEN 'character' THEN 5 WHEN 'copyright' THEN 6 ELSE 7 END AS cat_rank,
       |         tag_idx, replace(tag_name, '_', ' ') AS display
       |  FROM (SELECT * FROM argmax UNION ALL SELECT * FROM thresh) u
       |  WHERE NOT (category = 'meta' AND (
       |        lower(replace(tag_name,'_',' ')) LIKE '%id%'
       |     OR lower(replace(tag_name,'_',' ')) LIKE '%commentary%'
       |     OR lower(replace(tag_name,'_',' ')) LIKE '%request%'
       |     OR lower(replace(tag_name,'_',' ')) LIKE '%mismatch%')))
       |SELECT e.vec_id AS image_id, coalesce(t.tags, '') AS tags
       |FROM embeddings e LEFT JOIN (
       |  SELECT image_id, string_agg(display, ', ' ORDER BY cat_rank, tag_idx) AS tags
       |  FROM sel GROUP BY image_id) t ON e.vec_id = t.image_id
       |ORDER BY image_id""".stripMargin

  /** Schema-A vocabulary with every normalization edge from §1.3: mixed-
    * case category (lower-cased), missing category (defaults general),
    * unknown category (dropped), an index hole at 14, blacklist-trap meta
    * names ('holiday' contains 'id' — substring semantics), underscores. */
  private val vocabJson =
    """{"idx_to_tag": {
      |  "0": "safe", "1": "explicit", "2": "best_quality", "3": "worst_quality",
      |  "4": "long_hair", "5": "short_hair", "6": "blue_sky", "7": "holiday",
      |  "8": "english_commentary", "9": "watermark", "10": "some_model",
      |  "11": "alice", "12": "bob_the_builder", "13": "acme_series",
      |  "15": "mystery_artist", "16": "weird_one", "17": "orphan_tag",
      |  "18": "tag_request", "19": "size_mismatch", "20": "highres",
      |  "21": "carol", "22": "dave_the_great", "23": "initial_d"},
      | "tag_to_category": {
      |  "safe": "RATING", "explicit": "rating", "best_quality": "Quality",
      |  "worst_quality": "quality", "long_hair": "general", "short_hair": "general",
      |  "blue_sky": "general", "holiday": "meta", "english_commentary": "meta",
      |  "watermark": "meta", "some_model": "model", "alice": "character",
      |  "bob_the_builder": "character", "acme_series": "copyright",
      |  "mystery_artist": "artist", "weird_one": "unknown_cat",
      |  "tag_request": "meta", "size_mismatch": "meta", "highres": "meta",
      |  "carol": "character", "dave_the_great": "artist",
      |  "initial_d": "copyright"}}""".stripMargin

  /** Real dual-schema ingestion (graft.Vocab) feeding the pipeline; the
    * oracle receives the NORMALIZED entries as literal VALUES — parse
    * normalization itself is pinned by VocabSpec against the reference. */
  private val vocabJsonQuery = {
    val entries = graft.Vocab.parseJson(vocabJson)
    val valuesSql = entries
      .map(e => s"(${e.tagIdx}, '${e.tagName}', '${e.category}')")
      .mkString(",\n  ")
    NamedQuery(
      "tagger_vocab_json",
      (spark, sfDir) => Tagging.pipeline(
        Tables.embeddings(spark, sfDir).select(
          col("vec_id").as("image_id"),
          transform(slice(col("embedding"), 1, 24),
            x => x.cast("double") * lit(4.0)).as("logits")),
        graft.Vocab.fromJson(spark, vocabJson)).orderBy("image_id"),
      Some(s"""WITH vocab(tag_idx, tag_name, category) AS (VALUES
         |  $valuesSql),
         |probs AS (
         |  SELECT vec_id AS image_id,
         |         generate_subscripts(embedding, 1) - 1 AS tag_idx,
         |         1/(1 + exp(-greatest(least(CAST(unnest(embedding) AS DOUBLE) * 4, 30), -30))) AS prob
         |  FROM embeddings),
         |joined AS (
         |  SELECT p.image_id, p.tag_idx, p.prob, v.tag_name, v.category
         |  FROM probs p JOIN vocab v USING (tag_idx) WHERE p.tag_idx < 24),
         |argmax AS (
         |  SELECT image_id, category, tag_idx, tag_name
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY image_id, category ORDER BY prob DESC, tag_idx) AS rn
         |        FROM joined WHERE category IN ('rating','quality')) r
         |  WHERE rn = 1),
         |thresh AS (
         |  SELECT image_id, category, tag_idx, tag_name FROM joined
         |  WHERE (category IN ('general','meta','model') AND prob >= 0.55)
         |     OR (category IN ('character','copyright','artist') AND prob >= 0.60)),
         |sel AS (
         |  SELECT image_id,
         |         CASE category WHEN 'rating' THEN 0 WHEN 'quality' THEN 1
         |              WHEN 'general' THEN 2 WHEN 'meta' THEN 3 WHEN 'model' THEN 4
         |              WHEN 'character' THEN 5 WHEN 'copyright' THEN 6 ELSE 7 END AS cat_rank,
         |         tag_idx, replace(tag_name, '_', ' ') AS display
         |  FROM (SELECT * FROM argmax UNION ALL SELECT * FROM thresh) u
         |  WHERE NOT (category = 'meta' AND (
         |        lower(replace(tag_name,'_',' ')) LIKE '%id%'
         |     OR lower(replace(tag_name,'_',' ')) LIKE '%commentary%'
         |     OR lower(replace(tag_name,'_',' ')) LIKE '%request%'
         |     OR lower(replace(tag_name,'_',' ')) LIKE '%mismatch%')))
         |SELECT e.vec_id AS image_id, coalesce(t.tags, '') AS tags
         |FROM embeddings e LEFT JOIN (
         |  SELECT image_id, string_agg(display, ', ' ORDER BY cat_rank, tag_idx) AS tags
         |  FROM sel GROUP BY image_id) t ON e.vec_id = t.image_id
         |ORDER BY image_id""".stripMargin))
  }

  /** Throughput headline (rows-only; trig differs across libm so no
    * oracle): the full tagging program over 500k synthetic 64-logit score
    * vectors generated distributively, through the SCALE path
    * (Tagging.pipelineLocal): the whole selection — sigmoid, per-category
    * argmax, thresholds, blacklist, ordered concat — runs array-locally
    * inside one whole-stage-codegen map with ZERO shuffles, instead of
    * exploding to 32M rows through two shuffles and a 500k×500k join.
    * Output is bit-identical to the relational Tagging.pipeline (pinned
    * by TaggingSpec and the tagger_pipeline_local oracle query below).
    * The reference processes ~1 image/sec single-threaded
    * (appV2.py:165-185, batch=1); this measures 5000× that item count in
    * one bench entry. */
  private val throughput = NamedQuery(
    "tagger_throughput_500k",
    (spark, _) => {
      val scores = spark.range(500000).select(
        col("id").as("image_id"),
        transform(sequence(lit(0), lit(63)),
          j => sin(col("id") * 0.7 + j.cast("double") * 1.3) * 4.0).as("logits"))
      // the trailing filter REFERENCES the computed tag string, so a
      // bench-style count() cannot prune the tag computation away
      Tagging.pipelineLocal(scores, Tagging.syntheticVocabEntries(64))
        .filter(length(col("tags")) >= 0)
    },
    None)

  /** The scale path under the SAME DuckDB oracle as the relational form:
    * proves pipelineLocal ≡ pipeline ≡ the reference, hash-checked. */
  private val pipelineLocalQ = NamedQuery(
    "tagger_pipeline_local",
    (spark, sfDir) => Tagging.pipelineLocal(
      Tables.embeddings(spark, sfDir).select(
        col("vec_id").as("image_id"),
        transform(col("embedding"), x => x.cast("double") * lit(4.0)).as("logits")),
      Tagging.syntheticVocabEntries(64)).orderBy("image_id"),
    Some(pipelineSql(0.55, 0.60)))

  val all: Seq[NamedQuery] = Seq(
    vocabJsonQuery,
    throughput,
    pipelineLocalQ,
    NamedQuery(
      "tagger_pipeline",
      (spark, sfDir) => Tagging.pipeline(
        scoresFromEmbeddings(spark, sfDir),
        Tagging.syntheticVocab(spark, 64)).orderBy("image_id"),
      Some(pipelineSql(0.55, 0.60))),
    // Raised thresholds pin the >= comparison and threshold-map routing
    // independently of the defaults (appV2.py:126-127 allows user thresholds).
    NamedQuery(
      "tagger_pipeline_strict",
      (spark, sfDir) => Tagging.pipeline(
        scoresFromEmbeddings(spark, sfDir),
        Tagging.syntheticVocab(spark, 64),
        genThreshold = 0.65, charThreshold = 0.70).orderBy("image_id"),
      Some(pipelineSql(0.65, 0.70))))
}
