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
      Vocab.Entry(0, "safe", "rating"),
      Vocab.Entry(1, "long_hair", "general")))
  }

  test("schema B: flat idx → {tag, category}") {
    val json =
      """{"0": {"tag": "safe", "category": "rating"},
        | "1": {"tag": "long_hair", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(
      Vocab.Entry(0, "safe", "rating"),
      Vocab.Entry(1, "long_hair", "general")))
  }

  test("missing category defaults to general (appV2.py:67)") {
    val json = """{"idx_to_tag": {"0": "orphan_tag"}, "tag_to_category": {}}"""
    assert(Vocab.parseJson(json) === Seq(Vocab.Entry(0, "orphan_tag", "general")))
  }

  test("unknown category is dropped entirely (appV2.py:68)") {
    val json =
      """{"5": {"tag": "weird_tag", "category": "unknown_cat"},
        | "7": {"tag": "ok_tag", "category": "general"}}""".stripMargin
    assert(Vocab.parseJson(json) === Seq(Vocab.Entry(7, "ok_tag", "general")))
  }

  test("index holes are simply absent rows; entries sorted by idx") {
    val json =
      """{"idx_to_tag": {"9": "b", "2": "a"},
        | "tag_to_category": {"a": "general", "b": "meta"}}""".stripMargin
    assert(Vocab.parseJson(json).map(_.tagIdx) === Seq(2L, 9L))
  }

  test("emission rank covers exactly the 8 recognized categories") {
    assert(Vocab.emissionRank.keySet === Vocab.recognized.toSet)
    assert(Vocab.emissionRank.values.toSeq.sorted === (0 until 8))
  }
}
