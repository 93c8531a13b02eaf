package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 advanced operators (CDC apply,
  * Bloom decontamination, weighted sampling, Z-order, EWMA, skyline,
  * interval sweep, PageRank). The oracle hash gate pins exact values;
  * these pin the properties that must survive any refactor. */
class AdvancedQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_cdc_apply: deletes gone, updates win over inserts, one row per surviving key") {
    val rows = run("q_cdc_apply").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length, "duplicate keys after compaction")
    rows.foreach { r =>
      val (k, op, v) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(k % 5 != 2, s"deleted key $k survived compaction")
      if (k % 3 == 1) assert(op == "U" && v == 2, s"key $k: update lost to insert")
      else assert(op == "I" && v == 1, s"key $k: unexpected winner $op v$v")
    }
    // every non-deleted order key must appear exactly once
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 5 =!= 2).count()
    assert(rows.length.toLong == expected)
  }

  test("text_contamination_bloom: per-lang split is a partition and matches exact contamination") {
    val rows = run("text_contamination_bloom").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "contaminated+clean != n_docs")
    }
    // the Bloom prefilter must not change the answer: total contaminated
    // docs == the exact pipeline's distinct contaminated doc count
    val exact = run("text_contamination").count()
    assert(rows.map(_.getLong(2)).sum == exact,
      "bloom-prefiltered contamination count diverged from the exact pipeline")
  }

  test("q_weighted_sample: ranks 1..20, reproducible on recompute") {
    val a = run("q_weighted_sample").collect()
    assert(a.map(_.getInt(0)).toSeq == (1 to 20))
    val b = run("q_weighted_sample").collect()
    assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq,
      "weighted sample not reproducible")
  }

  test("q_zorder_cluster: bucket spans honor the Morton high-bit geometry") {
    val rows = run("q_zorder_cluster").collect()
    assert(rows.nonEmpty)
    // 64 buckets of 1024 codes: each bucket fixes the top 3 bits of both
    // dims, so per-bucket spans fit inside a 32-wide cell in EACH dim
    rows.foreach { r =>
      assert(r.getLong(2) / 32 == r.getLong(3) / 32,
        s"bucket ${r.getLong(0)}: x span crosses a 32-cell")
      assert(r.getLong(4) / 32 == r.getLong(5) / 32,
        s"bucket ${r.getLong(0)}: y span crosses a 32-cell")
    }
  }

  test("q_ewma_daily: first day equals its revenue; smoothing stays inside the data range") {
    val rows = run("q_ewma_daily").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(2) == rows.head.getLong(1).toDouble,
      "EWMA of a single observation must be that observation")
    val (lo, hi) = (rows.map(_.getLong(1)).min.toDouble, rows.map(_.getLong(1)).max.toDouble)
    rows.foreach(r => assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi,
      "EWMA is a convex combination — cannot leave the observed range"))
    // replay the recursion on the driver: identical fold, identical doubles
    var acc = rows.head.getLong(1).toDouble
    rows.tail.foreach { r =>
      acc = acc * 0.8 + r.getLong(1).toDouble * 0.2
      assert(acc == r.getDouble(2), s"day ${r.getString(0)}: fold mismatch")
    }
  }

  test("q_skyline_pareto: output is mutually non-dominated and dominates everything else") {
    val pts = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val expected = pts.filter(p => !pts.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = run("q_skyline_pareto").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"skyline mismatch: got $got expected $expected")
  }

  test("q_interval_overlap: concurrency positive, starts add up to the view count") {
    val rows = run("q_interval_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 0))
    val views = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view").count()
    assert(rows.map(_.getLong(2)).sum == views)
    // at least one interval pair overlaps in any realistic fixture
    assert(rows.map(_.getLong(1)).max >= 1)
  }

  test("q_hierarchy_rollup: roots are fixpoints, depth matches the decimal chain length") {
    val rows = run("q_hierarchy_rollup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (node, root, depth) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(root < 10, s"node $node resolved to non-root $root")
      // replay the parent chain directly: parent(c) = c/10
      var (c, d) = (node, 0)
      while (c >= 10) { c /= 10; d += 1 }
      assert(root == c && depth == d, s"node $node: got ($root,$depth), chain says ($c,$d)")
    }
  }

  test("q_window_distinct_rolling: equals a driver-side brute force over the fixture") {
    val du = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val expected = du.map(_._1).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay)).map { anchor =>
      anchor.toString ->
        du.filter { case (d, _) =>
          !d.isAfter(anchor) && !d.isBefore(anchor.minusDays(6))
        }.map(_._2).distinct.length.toLong
    }.toMap
    val got = run("q_window_distinct_rolling").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("q_cohort_retention: equals a driver-side replay over the fixture") {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
    val cohort = p.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val expected = p.map { case (u, wk) =>
      (cohort(u), (wk - cohort(u)) / 604800, u)
    }.distinct.groupBy(t => (t._1, t._2)).map { case (k, l) => k -> l.size.toLong }
    val got = run("q_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_pagerank: a probability distribution concentrated where degree is") {
    val rows = run("q_pagerank").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0, "non-positive rank"))
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"ranks sum to $total, not ~1")
    // suppliers (offset ids) join to many customers → the max-rank node
    // of the bipartite trade graph is a supplier
    val top = rows.maxBy(_.getDouble(1)).getLong(0)
    assert(top >= 1000000L, s"top-ranked node $top is not a supplier")
  }
}
