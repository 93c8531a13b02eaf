package graft

import org.apache.spark.sql.functions._

/** Plan-shape and semantic invariants for the adapted TPC-H wave
  * (Relational4Queries). The oracle gate checks exact values; these pin
  * the PLANS the scale claims in SCALE.md rest on — a refactor that
  * re-introduces a second fact scan in Q21 or loses Q19's pushed
  * disjunctions passes the oracle but fails here. */
class Relational4Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q21_sole_blame: one lineitem scan, one fact exchange") {
    val df = run("q21_sole_blame")
    df.collect() // materialize so AQE finalizes nothing mid-assert
    // keep only the AQE final plan — the string also echoes the initial
    // plan, which would double-count every node
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val lineitemScans = "Location.*lineitem".r.findAllIn(plan).length
    assert(lineitemScans === 1,
      s"decorrelation must not re-scan the fact ($lineitemScans scans):\n$plan")
    // exchanges: the orderkey repartition + the final tiny s_name agg —
    // a third one means the window or rollup stopped reusing the
    // orderkey partitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"expected <=2 hash exchanges (fact repartition + s_name agg), got $exchanges:\n$plan")
  }

  test("q21_sole_blame: every surviving supplier is the sole returner of a multi-supplier F order") {
    // recompute the invariant directly from the base tables
    val li = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("ret"))
    val perOrder = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("ret").as("nr"))
    val eligible = li.filter(col("ret") === 1L)
      .join(perOrder.filter(col("ns") >= 2 && col("nr") === 1), "l_orderkey")
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q21_sole_blame").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (name, n) =>
      assert(eligible.get(name).contains(n), s"$name: got $n, expected ${eligible.get(name)}")
    }
    // top-20 is the head of the eligible set by (numwait desc, name)
    val expectedHead = eligible.toSeq.sortBy { case (s, n) => (-n, s) }.take(got.length)
    assert(got.toSeq === expectedHead)
  }

  test("q19_disjunctive_filter: implied disjunctions pushed to BOTH scans") {
    val df = run("q19_disjunctive_filter")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // lineitem side: quantity range disjunction reaches the parquet reader
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey), Or("),
      s"lineitem scan lost its pushed disjunction:\n$plan")
    // part side: brand/size disjunction reaches the parquet reader
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(p_brand".r.findFirstIn(plan).nonEmpty,
      s"part scan lost its pushed brand filter:\n$plan")
  }

  test("q6_forecast_revenue: all three predicates pushed, no join, no shuffle") {
    val df = run("q6_forecast_revenue")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(("PushedFilters: \\[[^\\]]*" + c).r.findFirstIn(plan).nonEmpty,
        s"$c not pushed to the scan:\n$plan")
    }
    assert(!plan.contains("Join"), s"Q6 must not join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"global agg should use a single-partition exchange only:\n$plan")
  }

  test("q22_idle_balance: threshold matches the floored positive-balance average") {
    val cust = Tables.customer(spark, sfDir)
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg(floor(avg(col("c_acctbal")))).collect()(0).getLong(0)
    val open = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O").select("o_custkey")
    val expected = cust.filter(col("c_acctbal") > thresh)
      .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val got = run("q22_idle_balance").collect().map(_.getLong(1)).sum
    assert(got === expected && got > 0)
  }
}
