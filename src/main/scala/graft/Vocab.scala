package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Tag-vocabulary ingestion + normalization.
  *
  * Reproduces the reference's `load_tag_mapping` semantics
  * (reference appV2.py:51-72):
  *   - two accepted on-disk JSON schemas, detected by the presence of an
  *     `idx_to_tag` key (appV2.py:54):
  *       A: {"idx_to_tag": {"<idx>": tag}, "tag_to_category": {tag: cat}}
  *       B: {"<idx>": {"tag": tag, "category": cat}}
  *   - string keys cast to int (appV2.py:55,58)
  *   - category lower-cased, defaulting to "general" when the tag is
  *     missing from tag_to_category (appV2.py:67)
  *   - only 8 recognized categories; a tag with any other category is
  *     dropped from every category index and can never be emitted
  *     (appV2.py:63,68)
  *   - the dense `names` array with None holes (appV2.py:62) maps
  *     relationally to "no row for that tag_idx" — an inner join on
  *     tag_idx reproduces both the hole-skip and the None-guard
  *     (appV2.py:82,96).
  *
  * The vocabulary is a small dimension; it is parsed driver-side and
  * broadcast at join time (mirror of the reference's precomputed in-memory
  * index, appV2.py:70-71).
  */
object Vocab {

  /** The 8 recognized categories, in the reference's dict insertion order
    * (appV2.py:63). */
  val recognized: Seq[String] = Seq(
    "rating", "general", "artist", "character",
    "copyright", "meta", "quality", "model")

  /** Emission order of `get_tags` (appV2.py:77,86-89): rating- and
    * quality-argmax first, then the threshold categories in threshold_map
    * insertion order. */
  val emissionRank: Map[String, Int] = Map(
    "rating" -> 0, "quality" -> 1, "general" -> 2, "meta" -> 3,
    "model" -> 4, "character" -> 5, "copyright" -> 6, "artist" -> 7)

  /** Categories selected by unthresholded per-category argmax
    * (appV2.py:77). */
  val argmaxCategories: Seq[String] = Seq("rating", "quality")

  /** Threshold categories → which of the two thresholds applies
    * (appV2.py:86-89). */
  val genThresholdCategories: Seq[String] = Seq("general", "meta", "model")
  val charThresholdCategories: Seq[String] = Seq("character", "copyright", "artist")

  /** Meta-blacklist substrings (appV2.py:98) — substring match, not word
    * match, checked on the lower-cased, underscore-replaced name. */
  val metaBlacklist: Seq[String] = Seq("id", "commentary", "request", "mismatch")

  /** One normalized vocabulary entry. `emitPos` is the tag's position in
    * the mapping's JSON INSERTION order (the reference iterates dict
    * insertion order when building the category index arrays,
    * appV2.py:62-68) — threshold tags are emitted and numpy-argmax ties
    * broken in that order, which coincides with ascending tag_idx only
    * when the JSON happens to list keys ascending. */
  final case class Entry(tagIdx: Long, tagName: String, category: String, emitPos: Long)

  /** Parse either accepted JSON schema into normalized entries.
    *
    * Returned entries keep ONLY recognized categories (unknown-category
    * tags are unmappable to any category index in the reference and thus
    * unreachable, appV2.py:68). Holes (missing indices) are simply absent
    * rows. Category is lower-cased with default "general". Entries come
    * back in JSON insertion order with `emitPos` assigned before the
    * unknown-category drop, mirroring python dict iteration; duplicate
    * int-cast keys keep the FIRST occurrence's position and the LAST
    * occurrence's value (python `d[int(k)] = v` semantics).
    */
  def parseJson(json: String): Seq[Entry] = {
    val root = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(
        s"tag mapping must be a JSON object, got ${other.getClass.getSimpleName}")
    }
    val fields = root.obj.toMap
    val (orderedIdxTag: Seq[(Long, String)], tagToCategory: Map[String, String]) =
      if (fields.contains("idx_to_tag")) {
        // Schema A (appV2.py:54-56)
        val raw = fields("idx_to_tag") match {
          case JObject(kv) => kv.map { case (k, v) => k.toLong -> str(v) }
          case _ => throw new IllegalArgumentException("idx_to_tag must be an object")
        }
        // python-dict dedup: first position, last value
        val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
        raw.foreach { case (i, t) => m.update(i, t) }
        val cats = fields.get("tag_to_category") match {
          case Some(JObject(kv)) => kv.map { case (k, v) => k -> str(v) }.toMap
          case Some(_) => throw new IllegalArgumentException("tag_to_category must be an object")
          // the reference raises KeyError here (appV2.py:56) — a schema-A
          // mapping without tag_to_category must FAIL, not silently tag
          // everything 'general'
          case None => throw new IllegalArgumentException(
            "schema A mapping requires tag_to_category (reference appV2.py:56 raises KeyError)")
        }
        (m.toSeq, cats)
      } else {
        // Schema B (appV2.py:57-60). Both derived relations come from the
        // SAME int-key-deduped dict, exactly like the reference:
        // idx_to_tag from its items, tag_to_category from its VALUES
        // (appV2.py:59) — a tag-NAME-keyed dict, so two entries sharing a
        // tag name both resolve to the LAST one's category by reference
        // contract (a quirk, but the pinned semantics), and an entry
        // overwritten during int-key dedup never contributes its category
        val m = scala.collection.mutable.LinkedHashMap.empty[Long, (String, String)]
        root.obj.foreach { case (k, v) =>
          v match {
            case JObject(inner) =>
              val e = inner.toMap
              m.update(k.toLong, (str(e("tag")), str(e("category"))))
            case _ => throw new IllegalArgumentException(s"entry $k must be an object")
          }
        }
        (m.toSeq.map { case (i, (t, _)) => i -> t },
          m.values.map { case (t, c) => t -> c }.toMap)
      }
    orderedIdxTag.zipWithIndex.flatMap { case ((idx, tag), pos) =>
      val cat = tagToCategory.getOrElse(tag, "general").toLowerCase
      if (recognized.contains(cat)) Some(Entry(idx, tag, cat, pos.toLong)) else None
    }
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  /** Vocabulary as a small dimension DataFrame:
    * vocab(tag_idx LONG, tag_name STRING, category STRING, emit_pos LONG). */
  def toDF(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    entries.map(e => (e.tagIdx, e.tagName, e.category, e.emitPos))
      .toDF("tag_idx", "tag_name", "category", "emit_pos")
  }

  def fromJson(spark: SparkSession, json: String): DataFrame =
    toDF(spark, parseJson(json))
}
