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
      // flag is defined exactly when z is, and matches |z| > 2 on the
      // SAME 4-dp-rounded z that is emitted — no boundary band to skip
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

  test("q_model_lift: deciles partition the corpus, lift averages to 1, rates consistent") {
    val rows = run("q_model_lift").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == totalDocs, "deciles must partition all docs")
    // base-rate-weighted mean of decile pos_rates equals the base rate:
    // sum(positives) / sum(n) == tp/tn, so sum(n*lift)/total == 1
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / totalDocs
    assert(math.abs(weighted - 1.0) < 0.01, s"n-weighted mean lift $weighted != 1")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-4)
    }
  }

  test("q_cov_matrix: symmetric, diagonal positive, matches driver-side covariance") {
    val rows = run("q_cov_matrix").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.size == 64)
    for (i <- 1L to 8L; j <- 1L to 8L) {
      assert(rows((i, j)) == rows((j, i)), s"cov($i,$j) asymmetric")
      if (i == j) assert(rows((i, i)) > 0, s"var($i) not positive")
    }
    // spot-check cov(1,2) against a driver-side computation
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(2).map(_.toDouble))
    val (xs, ys) = (vecs.map(_(0)), vecs.map(_(1)))
    val naive = xs.zip(ys).map { case (a, b) => a * b }.sum / xs.length -
      (xs.sum / xs.length) * (ys.sum / ys.length)
    assert(math.abs(rows((1L, 2L)) - naive) < 1e-4, s"cov(1,2) off: $naive")
  }

  test("q_weekly_corr: r in [-1,1], weeks are Mondays covering the fixture span") {
    val rows = run("q_weekly_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val c = r.getDouble(2)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"r=$c out of range")
      }
      assert(java.time.LocalDate.parse(r.getString(0)).getDayOfWeek ==
        java.time.DayOfWeek.MONDAY)
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, sfDir).filter(col("event_type").isin("click", "purchase"))
        .select(to_date(col("ts"))).distinct.count())
  }

  test("q_markov_transitions: rows form a stochastic matrix over observed transitions") {
    val rows = run("q_markov_transitions").collect()
    assert(rows.nonEmpty)
    // per-prev probabilities sum to ~1 (rounding at 4dp leaves <=0.001 slack)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.002, s"$prev rows sum to $s")
    }
    // total transition count = total events - one tail event per user
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct.count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("text_winnowing: selection density near 2/(w+1), bounds ordered, digest consistent") {
    val rows = run("text_winnowing").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ns) = (r.getLong(1), r.getLong(2))
      assert(ns >= 1 && ns <= nw, s"selected $ns outside [1, $nw]")
      assert(r.getLong(3) <= r.getLong(4), "sel_min > sel_max")
    }
    // winnowing selects ~2/(w+1) of windows in expectation (w=5 → 1/3);
    // allow wide slack, but catch select-everything / select-one bugs
    val density = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(density > 0.15 && density < 0.55, s"density $density implausible")
    // guarantee: two docs sharing a >= k+w-1 token run share a selected
    // hash. Construct the check from the fixture's own duplicate pair if
    // present: identical texts must have identical digests.
    val byText = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    val digests = rows.map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    byText.foreach { dup =>
      val ds = dup.map(_.getLong(0)).filter(digests.contains)
      if (ds.length > 1)
        assert(ds.map(digests).distinct.length == 1, "identical texts, different fingerprints")
    }
  }

  test("winnowSelect guarantee: docs sharing a k+w-1-token run share a selected hash") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def tokens(n: Int, prefix: String) = Seq.fill(n)(prefix + rnd.nextInt(1000))
    // implant the same 8-token run (k+w-1 = 8) at a random offset in
    // each doc: the MOSS theorem says every pair must share a fingerprint
    val shared = (1 to 8).map(i => s"run$i")
    val docs = (0 until 20).map { i =>
      (i.toLong,
        (tokens(rnd.nextInt(30), s"a${i}_") ++ shared ++
          tokens(rnd.nextInt(30), s"b${i}_")).mkString(" "))
    }.toDF("doc_id", "text")
    val sel = graft.ops.TextOps.winnowSelect(docs, "doc_id", "text")
      .select($"doc_id", $"sel").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sel.size == 20)
    for (Seq(x, y) <- sel.keys.toSeq.sorted.combinations(2))
      assert(sel(x).intersect(sel(y)).nonEmpty,
        s"docs $x,$y share an 8-token run but no fingerprint")
    // and disjoint-vocabulary docs share nothing
    val d2 = Seq((100L, tokens(40, "p_").mkString(" ")),
      (101L, tokens(40, "q_").mkString(" "))).toDF("doc_id", "text")
    val s2 = graft.ops.TextOps.winnowSelect(d2, "doc_id", "text")
      .select($"doc_id", $"sel").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(s2(100L).intersect(s2(101L)).isEmpty)
  }

  test("q_key_skew_report: internally consistent and matching a driver-side recount") {
    val r = run("q_key_skew_report").head()
    val counts = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(r.getLong(0) == counts.length)
    assert(r.getLong(1) == counts.map(_._2).sum)
    assert(r.getLong(2) == counts.map(_._2).max)
    val mean = r.getDouble(3)
    assert(math.abs(mean - counts.map(_._2).sum.toDouble / counts.length) < 1e-3)
    assert(math.abs(r.getDouble(6) - r.getLong(2) / mean) < 1e-3)
    assert(r.getLong(7) == math.ceil(r.getLong(2) / mean).toLong)
    // heaviest key, smallest key id on ties
    val maxN = counts.map(_._2).max
    assert(r.getLong(8) == counts.filter(_._2 == maxN).map(_._1).min)
  }

  test("q_pca_power: unit-norm eigenvector with small residual, eigenvalue dominates variances") {
    val rows = run("q_pca_power").collect()
    assert(rows.length == 8)
    val v = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    val lam = rows.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4, "loadings not unit norm")
    // recompute C from q_cov_matrix and check the eigen residual
    val c = run("q_cov_matrix").collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    val cv = Array.tabulate(8)(i => (0 until 8).map(j => c((i + 1, j + 1)) * v(j)).sum)
    val resid = math.sqrt(cv.zip(v).map { case (a, b) => val e = a - lam * b; e * e }.sum)
    assert(resid < 1e-3, s"||Cv - lambda v|| = $resid")
    // top eigenvalue of a PSD matrix dominates every diagonal entry
    (1 to 8).foreach(i => assert(lam >= c((i, i)) - 1e-6))
    assert(v(0) >= 0, "sign convention: first loading non-negative")
  }

  test("q_pca_project: label rows partition the corpus; projection variance tracks the eigenvalue") {
    val rows = run("q_pca_project").collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5),
        "mean outside [min, max]")
    }
    // pooled projection variance ~= top eigenvalue (variance along the
    // top component IS the eigenvalue; per-label pooling loses only the
    // between-label mean spread, so allow slack)
    val lam = run("q_pca_power").head().getDouble(2)
    val pooled = rows.map(r => (r.getLong(1) - 1) * math.pow(r.getDouble(3), 2)).sum /
      (total - rows.length)
    assert(pooled > 0.5 * lam && pooled < 1.5 * lam,
      s"pooled var $pooled vs eigenvalue $lam")
  }

  test("sim_ann_recall: recall in [0,1], k from exact top-k, perfect recall iff sets equal") {
    val rows = run("sim_ann_recall").collect()
    assert(rows.length == 20, "one row per query vector < 20")
    val exact = run("sim_cosine_topk").filter(col("query_id") < 20)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = run("sim_ann_ivf")
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val (q, k, hits, rec) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k == exact(q).size)
      assert(hits == exact(q).intersect(approx.getOrElse(q, Set.empty)).size,
        s"query $q: hits $hits != set intersection")
      assert(math.abs(rec - hits.toDouble / k) < 1e-4)
    }
  }

  test("q_countmin_probe: estimate dominates exact count for every probed key") {
    val rows = run("q_countmin_probe").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CM underestimated key ${r.getLong(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
    // sanity: at least one probe key actually occurs in the fixture
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("q_gini_revenue: matches a driver-side exact-cents recomputation") {
    val r = run("q_gini_revenue").head()
    val xs = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("xc"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = xs.length
    val sx = xs.sum
    val srx = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val gini = 2.0 * srx / (n.toDouble * sx) - (n + 1.0) / n
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - sx / 100.0) < 0.01)
    assert(math.abs(r.getDouble(2) - gini) < 1e-5, s"gini ${r.getDouble(2)} vs $gini")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1)
  }

  test("q_time_to_convert: positive ordered percentiles, converted bounded by clickers") {
    val r = run("q_time_to_convert").head()
    val (conv, p50, p90, mean) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(conv > 0)
    assert(p50 > 0 && p50 <= p90, "percentiles out of order")
    assert(mean > 0)
    val clickers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").select("user_id").distinct.count()
    assert(conv <= clickers, "more converters than clickers")
  }

  test("q_psi_drift: non-negative, zero iff identical distributions, counts partition purchases") {
    val r = run("q_psi_drift").head()
    assert(r.getDouble(3) >= 0, "PSI is a sum of non-negative KL-style terms")
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(1) + r.getLong(2) == purchases, "periods must partition purchases")
    assert(r.getLong(0) > 0)
    // PSI of a distribution against itself is exactly 0 (smoothing
    // preserves p == q): recompute with ref == cur == all purchases
    val h = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(floor(col("value") / 25).cast("long").as("bkt")).count()
      .collect().map(_.getLong(1))
    val nb = h.length
    val n = h.sum
    val self = h.map { c =>
      val p = (c + 1.0) / (n + nb); (p - p) * math.log(p / p)
    }.sum
    assert(self == 0.0)
  }

  test("q_ratio_to_report: shares sum to 1 per region, ranks dense from 1, revenue consistent") {
    val rows = run("q_ratio_to_report").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (region, rs) =>
      val shareSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"$region shares sum to $shareSum")
      assert(rs.map(_.getLong(4)).sorted.sameElements(1L to rs.length),
        s"$region ranks not 1..${rs.length}")
    }
    val total = rows.map(_.getDouble(2)).sum
    val expected = Tables.orders(spark, sfDir)
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))).head.getLong(0) / 100.0
    assert(math.abs(total - expected) < 0.5)
  }

  test("q_hourly_seasonality: cells cover the grid, counts total the events table") {
    val rows = run("q_hourly_seasonality").collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 7)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 23)
    }
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sfDir).count())
    assert(rows.length <= 168)
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
