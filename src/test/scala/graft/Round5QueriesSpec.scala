package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 additions: the classic TPC-H
  * multi-join shapes (Q7/Q8/Q10/Q18) and the SRP binary-code ANN ranker.
  * The oracle hash gate checks exact values; these pin the properties
  * that must survive any refactor. */
class Round5QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q7_volume_shipping: only the selected nation pair, both directions, in-window years") {
    val rows = run("q7_volume_shipping").collect()
    assert(rows.nonEmpty)
    val pair = Set("NATION_1", "NATION_2")
    rows.foreach { r =>
      val (s, c, y) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(pair(s) && pair(c) && s != c, s"unexpected nation pair ($s,$c)")
      assert(y == 1996 || y == 1997, s"year $y outside the ship-date window")
      assert(r.getDouble(4) > 0, "non-positive revenue")
    }
    // both trade directions must be present (the OR of the two orderings)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet.size == 2)
  }

  test("q8_market_share: shares are proper fractions over the full order-year span") {
    val rows = run("q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share outside [0,1]")
    }
    val years = rows.map(_.getInt(0)).toSeq
    assert(years == years.sorted && years.distinct == years)
  }

  test("q10_returned_items: top-20 by revenue, strictly ordered, returned revenue positive") {
    val rows = run("q10_returned_items").collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue not descending")
    assert(revs.forall(_ > 0))
  }

  test("q18_large_orders: every emitted order really exceeds the quantity threshold") {
    val rows = run("q18_large_orders").collect()
    assert(rows.nonEmpty)
    // recompute the qualifying set directly from the fixture
    val qualifying = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 300)
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(qualifying(r.getLong(1)), s"order ${r.getLong(1)} below threshold")
      assert(r.getLong(3) > 300, "sum_qty must exceed the HAVING threshold")
    }
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("sim_srp_hamming: 5 ranked neighbors per query, hamming monotone within 60 bits") {
    val rows = run("sim_srp_hamming").collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 20)
    byQuery.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5), s"ranks broken for query $qid")
      val hams = sorted.map(_.getInt(3))
      assert(hams.zip(hams.tail).forall { case (a, b) => a <= b },
        s"hamming not monotone in rank for query $qid: ${hams.toSeq}")
      assert(hams.forall(h => h >= 0 && h <= 60))
      assert(sorted.forall(_.getLong(2) != qid), "query returned itself")
    }
  }

  test("text_duplicate_spans: fractions well-formed; planted near-dup docs share spans") {
    val rows = run("text_duplicate_spans").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, shared, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && shared >= 0 && shared <= n)
      assert(math.abs(frac - shared.toDouble / n) < 1e-6)
    }
    // the corpus plants near-duplicate pairs (dedup_ngram_jaccard finds
    // them), so SOME document must share 8-gram spans across docs
    assert(rows.exists(_.getLong(2) > 0), "no cross-doc duplicate spans found")
  }

  test("text_unigram_logprob: probabilities are proper (negative log), token counts exact") {
    val rows = run("text_unigram_logprob").collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(rows.length == docs, "every document must be scored")
    rows.foreach { r =>
      // every unigram prob < 1 → mean log-prob strictly negative
      assert(r.getDouble(2) < 0, s"doc ${r.getLong(0)} has non-negative mean logprob")
      assert(r.getLong(1) > 0)
    }
    // token counts must agree with the independent per-row counter
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == expected(r.getLong(0))))
  }

  test("pipeline_train_mix: packing arithmetic exact; strictly a subset of the mixture sample") {
    val rows = run("pipeline_train_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nTok, nSeq, eff) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nDocs > 0 && nTok > 0)
      assert(nSeq == math.ceil(nTok / 512.0).toLong, "sequence count must be ceil(tokens/512)")
      assert(eff > 0 && eff <= 1.0, s"pack efficiency $eff outside (0,1]")
    }
    // composition sanity: the capstone filters MORE than the bare
    // mixture sample, so per-language kept counts can never exceed it
    val mixture = run("q_sample_mixture").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(1) <= mixture(lang),
        s"$lang: capstone kept ${r.getLong(1)} > mixture ${mixture(lang)}")
    }
  }

  test("sim_pq_adc: 5 ranked neighbors per query, ADC non-negative and monotone in rank") {
    val rows = run("sim_pq_adc").collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 20)
    byQuery.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      val adcs = sorted.map(_.getDouble(3))
      assert(adcs.forall(_ >= 0), s"negative ADC for query $qid")
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        s"ADC not monotone in rank for query $qid: ${adcs.toSeq}")
      assert(sorted.forall(_.getLong(2) != qid))
    }
  }

  test("q_time_resample: gapless hourly spine per user, interpolated values inside the bracket") {
    val rows = run("q_time_resample").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val hs = rs.map(_.getLong(1)).sorted
      // spine is contiguous from min to max hour
      assert(hs.last - hs.head + 1 == hs.length, s"user $uid spine has gaps")
      // endpoints are always known (never interpolated)
      val byH = rs.map(r => r.getLong(1) -> r).toMap
      assert(byH(hs.head).getInt(3) == 0 && byH(hs.last).getInt(3) == 0,
        s"user $uid spine endpoint interpolated")
    }
    // every interpolated value lies between its bracketing known values
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val knownIdx = sorted.zipWithIndex.filter(_._1.getInt(3) == 0).map(_._2)
      knownIdx.zip(knownIdx.tail).foreach { case (a, b) =>
        val (lo, hi) = {
          val x = sorted(a).getDouble(2); val y = sorted(b).getDouble(2)
          (math.min(x, y), math.max(x, y))
        }
        (a + 1 until b).foreach { i =>
          val v = sorted(i).getDouble(2)
          assert(v >= lo - 1e-9 && v <= hi + 1e-9,
            s"user $uid hour ${sorted(i).getLong(1)}: $v outside [$lo,$hi]")
        }
      }
    }
  }

  test("q_funnel_conversion: stages shrink monotonically, rates anchored at the top") {
    val rows = run("q_funnel_conversion").collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel stages must shrink: ${counts.toSeq}")
    assert(rows.head.getDouble(2) == 1.0)
    val rates = rows.map(_.getDouble(2))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b })
    // a real funnel, not a degenerate one: some users convert, not all
    assert(counts.last > 0 && counts.last < counts.head)
  }

  test("sim_srp_hamming: codes of identical vectors collide (hamming 0 to self)") {
    // the ranker excludes self-pairs, so check the underlying guarantee
    // at the query level: a query's hamming to its rank-1 neighbor is
    // bounded by the code width and the sign pattern is deterministic —
    // two runs produce identical codes (no RNG anywhere in the pipeline)
    val a = run("sim_srp_hamming").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val b = run("sim_srp_hamming").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(a.toSeq == b.toSeq, "SRP pipeline must be run-to-run deterministic")
  }
}
