package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the statistical-monitoring family (anomaly
  * z-score, last-touch attribution, BPE pair counting, histogram-exact
  * KS test). The oracle hash gate pins exact values at sf0.01; these pin
  * the properties that must survive any refactor. */
class MlStatsQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_anomaly_zscore: flags agree with z, trailing stats need >=3 days, z is standardized") {
    val rows = run("q_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      val flag = if (r.isNullAt(6)) None else Some(r.getLong(6))
      // flag is defined exactly when z is, and matches |z| > 2
      assert(z.isDefined == flag.isDefined)
      z.zip(flag).foreach { case (zv, f) =>
        assert((math.abs(zv) > 2) == (f == 1L),
          s"flag $f disagrees with z=$zv for $r")
      }
    }
    // first two days of every series are excluded (trail_n >= 3): with a
    // 30-day fixture each event_type contributes at most 28 rows
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    byType.foreach { case (t, n) => assert(n <= 28, s"$t has $n rows") }
  }

  test("q_attribution_last_touch: purchase credit is complete and purchase never self-credits") {
    val rows = run("q_attribution_last_touch").collect()
    assert(rows.nonEmpty)
    val touches = rows.map(_.getString(0))
    assert(!touches.contains("purchase"), "purchase credited to itself")
    // every purchase event is attributed to exactly one channel ('none'
    // when the user had no prior non-purchase event)
    val totalPurchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == totalPurchases)
  }

  test("text_bpe_pairs: top-50 under total order, counts sane vs corpus token mass") {
    val rows = run("text_bpe_pairs").collect()
    assert(rows.length == 50)
    // strictly ordered by (n desc, a, b)
    val key = rows.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(key.sameElements(key.sorted), "top-50 not in (n desc, a, b) order")
    // adjacent-pair mass can't exceed total tokens - docs
    val docs = Tables.documents(spark, sfDir)
      .select(size(split(lower(col("text")), "\\s+")).as("n"))
      .agg(sum("n"), count(lit(1))).head()
    assert(rows.map(_.getLong(2)).sum <= docs.getLong(0) - docs.getLong(1))
  }

  test("q_ks_histogram: statistic in [0,1], matches a direct ECDF computation") {
    val row = run("q_ks_histogram").head()
    val ks = row.getDouble(0)
    assert(ks >= 0 && ks <= 1)
    // recompute KS naively on the driver from the raw values
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), floor(col("value")).cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val clicks = vals.filter(_._1 == "click").map(_._2)
    val purch = vals.filter(_._1 == "purchase").map(_._2)
    val bs = (clicks ++ purch).distinct.sorted
    val naive = bs.map { b =>
      math.abs(clicks.count(_ <= b).toDouble / clicks.length -
        purch.count(_ <= b).toDouble / purch.length)
    }.max
    assert(math.abs(ks - naive) < 1e-6, s"ks=$ks naive=$naive")
    assert(row.getLong(1) == clicks.length && row.getLong(2) == purch.length)
  }
}
