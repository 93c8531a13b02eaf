package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the reconciliation / range-join / clustering /
  * heavy-hitter additions. The oracle hash gate pins exact values; these
  * pin the properties that must survive any refactor. */
class ReconQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_table_diff: classification counts match the modular snapshot derivation") {
    val rows = run("q_table_diff").collect()
    val byType = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k")).collect().map(_.getLong(0))
    val added = keys.count(k => k % 7 == 0 && k % 11 != 0)
    val removed = keys.count(k => k % 11 == 0 && k % 7 != 0)
    val changed = keys.count(k => k % 5 == 0 && k % 7 != 0 && k % 11 != 0)
    val unchanged = keys.count(k => k % 5 != 0 && k % 7 != 0 && k % 11 != 0)
    assert(byType.getOrElse("added", 0L) == added)
    assert(byType.getOrElse("removed", 0L) == removed)
    assert(byType.getOrElse("changed", 0L) == changed)
    assert(byType.getOrElse("unchanged", 0L) == unchanged)
    // every key present in either snapshot is classified exactly once
    assert(byType.values.sum == keys.count(k => k % 7 != 0 || k % 11 != 0))
  }

  test("q_range_bin_join: binned equi-join ≡ the declared range join") {
    val rows = run("q_range_bin_join").collect()
    assert(rows.nonEmpty)
    // reference answer straight from the theta-join the oracle states
    val cents = Tables.orders(spark, sfDir)
      .select((floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("pc"),
        col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val cuts = Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(997)) === 0)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    val expected = cuts.zip(cuts.tail).zipWithIndex.flatMap {
      case ((lo, hi), i) =>
        val in = cents.filter(c => c >= lo && c < hi)
        if (in.isEmpty) None else Some((i + 1, in.length.toLong, in.sum))
    }
    val got = rows.map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq,
      s"binned join diverged from the direct range join")
    // no fact row double-counted across tiers (tiers are non-overlapping)
    val inRange = cents.count(c => c >= cuts.head && c < cuts.last)
    assert(rows.map(_.getLong(1)).sum == inRange)
  }

  test("sim_kmeans: a partition of the corpus, deterministic on recompute") {
    val a = run("sim_kmeans").collect()
    assert(a.length == 4, s"expected k=4 clusters, got ${a.length}")
    val total = Tables.embeddings(spark, sfDir).count()
    assert(a.map(_.getLong(1)).sum == total, "members do not partition the corpus")
    a.foreach(r => assert(r.getDouble(2) >= 0.0, "negative inertia"))
    val b = run("sim_kmeans").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq,
      "k-means not deterministic across recomputes")
  }

  test("text_heavy_hitters: every hitter clears the 0.2% bar and counts are exact") {
    val rows = run("text_heavy_hitters").collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(1))
    assert(counts.toSeq == counts.sortBy(-_).toSeq, "not ordered by count desc")
    // recompute token counts directly and cross-check each reported hitter
    val exact = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = exact.values.sum
    rows.foreach { r =>
      val (tok, cnt) = (r.getString(0), r.getLong(1))
      assert(exact(tok) == cnt, s"count mismatch for '$tok'")
      assert(cnt * 1000 > tot * 2, s"'$tok' below the 0.2% bar")
      assert(math.abs(r.getDouble(2) - cnt.toDouble / tot) < 1e-12)
    }
    // completeness: no token above the bar is missing from the report
    val reported = rows.map(_.getString(0)).toSet
    exact.foreach { case (w, c) =>
      if (c * 1000 > tot * 2) assert(reported(w), s"missing hitter '$w'")
    }
  }
}
