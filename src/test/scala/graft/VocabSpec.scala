package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the load_tag_mapping normalization contract (SURVEY.md §1.3;
  * reference appV2.py:51-72). Golden expectations were produced by
  * executing the reference's own functions on the same inputs. */
class VocabSpec extends AnyFunSuite {

  test("schema A: idx_to_tag + tag_to_category, int-cast keys, lower-cased category") {
    val json =
      """{"idx_to_tag": {"0": "safe", "1": "long_hair"},
        | "tag_to_category": {"safe": "RATING", "long_hair": "general"}}""".stripMargin
    val entries = Vocab.parseJson(json)
    assert(entries === Seq(
      Vocab.Entry(0, "safe", "rating", 0),
      Vocab.Entry(1, "long_hair", "general", 1)))
  }

  test("schema B: flat idx → {tag, category}") {
    val json =
      """{"0": {"tag": "safe", "category": "rating"},
        | "1": {"tag": "long_hair", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(0, "safe", "rating", 0),
      Vocab.Entry(1, "long_hair", "general", 1)))
  }

  test("missing category defaults to general (appV2.py:67)") {
    val json = """{"idx_to_tag": {"0": "orphan_tag"}, "tag_to_category": {}}"""
    assert(Vocab.parseJson(json) === Seq(Vocab.Entry(0, "orphan_tag", "general", 0)))
  }

  test("schema A without tag_to_category fails like the reference KeyError (appV2.py:56)") {
    val json = """{"idx_to_tag": {"0": "some_tag"}}"""
    assertThrows[IllegalArgumentException](Vocab.parseJson(json))
  }

  test("unknown category is dropped entirely but still consumes its emit position (appV2.py:68)") {
    val json =
      """{"5": {"tag": "weird_tag", "category": "unknown_cat"},
        | "7": {"tag": "ok_tag", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(Vocab.Entry(7, "ok_tag", "general", 1)))
  }

  test("index holes are absent rows; JSON insertion order is preserved (python dict iteration)") {
    val json =
      """{"idx_to_tag": {"9": "b", "2": "a"},
        | "tag_to_category": {"a": "general", "b": "meta"}}""".stripMargin
    // the reference iterates dict insertion order, NOT ascending idx:
    // 'b' (idx 9) comes first and gets emit position 0
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(9, "b", "meta", 0),
      Vocab.Entry(2, "a", "general", 1)))
  }

  test("duplicate int-cast keys: first position, last value (python d[int(k)]=v)") {
    val json =
      """{"idx_to_tag": {"1": "first_val", "01": "second_val", "3": "other"},
        | "tag_to_category": {"first_val": "general", "second_val": "general",
        |                     "other": "meta"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(1, "second_val", "general", 0),
      Vocab.Entry(3, "other", "meta", 1)))
  }

  test("schema B: duplicate tag NAMES resolve to the LAST category (appV2.py:59 parity)") {
    // the reference builds tag_to_category as a tag-NAME-keyed dict from
    // the entry values, so two indices sharing a name BOTH get the later
    // entry's category — a quirk, but the pinned contract
    val json =
      """{"0": {"tag": "dup", "category": "rating"},
        | "1": {"tag": "dup", "category": "meta"},
        | "2": {"tag": "solo", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(0, "dup", "meta", 0),
      Vocab.Entry(1, "dup", "meta", 1),
      Vocab.Entry(2, "solo", "general", 2)))
  }

  test("schema B: an entry overwritten by int-key dedup never contributes its category") {
    // mirror of appV2.py:57-59 — tag_to_category comes from the DEDUPED
    // dict's values: key "01" overwrites key "1", so first_tag's
    // category from the overwritten entry must not resurface
    val json =
      """{"1": {"tag": "dup", "category": "rating"},
        | "01": {"tag": "winner", "category": "meta"},
        | "2": {"tag": "dup", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(1, "winner", "meta", 0),
      Vocab.Entry(2, "dup", "general", 1)))
  }

  test("emission rank covers exactly the 8 recognized categories") {
    assert(Vocab.emissionRank.keySet === Vocab.recognized.toSet)
    assert(Vocab.emissionRank.values.toSeq.sorted === (0 until 8))
  }
}
