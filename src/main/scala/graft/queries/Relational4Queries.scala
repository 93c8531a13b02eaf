package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational wave: the remaining classic TPC-H templates,
  * adapted to the fixtures' reduced schema (no l_shipmode /
  * l_commitdate / l_receiptdate / partsupp — the equivalent predicate is
  * built from columns that exist). Each row in this file is a named
  * optimizer stress: full-scan conjunctive pushdown (Q6), fact-fact
  * CASE-sum (Q12), broadcast-dimension conditional ratio (Q14),
  * disjunctive OR-of-ANDs pushdown (Q19), the double-correlated
  * EXISTS / NOT EXISTS "sole blame" shape (Q21), and scalar-subquery +
  * anti-join (Q22).
  */
object Relational4Queries extends QueryRegistry {

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  // ---- Q6 forecast revenue: the purest pushdown test — no join at
  // all, three conjunctive predicates on one scan, one global sum. The
  // whole WHERE must reach the parquet reader as PushedFilters; at
  // 100 TB this is the difference between reading three row-group
  // stats-pruned columns and reading the table.
  private val q6 = NamedQuery(
    "q6_forecast_revenue",
    (spark, d) => Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(count(lit(1)).as("n"),
        Money.centsSum(col("l_extendedprice") * col("l_discount"))
          .as("revenue")),
    Some(s"""SELECT count(*) AS n,
        |  ${Money.centsSumSql("l_extendedprice * l_discount")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin))

  // ---- Q12 priority mix (adapted: l_linestatus stands in for the
  // missing l_shipmode): one fact-fact join, then per-group CASE-counts
  // splitting urgent from non-urgent order priorities — the
  // "conditional histogram after a join" template. Both CASE branches
  // come from ONE aggregation pass; the shipdate filter prunes the
  // lineitem scan before the shuffle.
  private val q12 = NamedQuery(
    "q12_priority_mix",
    (spark, d) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin))

  // ---- Q14 promo revenue share: conditional-sum ratio over a
  // broadcast dimension join — sum(CASE)/sum() in one pass, never a
  // self-join. The month filter stays on the fact scan; only matching
  // partkeys flow through the broadcast hash lookup.
  private val q14 = NamedQuery(
    "q14_promo_revenue",
    (spark, d) => {
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .join(broadcast(Tables.part(spark, d)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        // both sums in exact cents (Money rule 11): identical integers
        // divide to identical doubles, so only round(4)'s tie-break is
        // shared risk — not the summation order
        .agg(round(lit(100.0) *
          Money.centsSumRaw(when(col("p_type") === "PROMO", vol)
            .otherwise(lit(0.0))).cast("double") /
          Money.centsSumRaw(vol).cast("double"), 4).as("promo_share"))
    },
    Some(s"""SELECT round(100.0 *
        |    CAST(${Money.centsSumRawSql(
               "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS DOUBLE) /
        |    CAST(${Money.centsSumRawSql(
               "l_extendedprice * (1 - l_discount)")} AS DOUBLE), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin))

  // ---- Q19 disjunctive pushdown: OR of three (brand ∧ size ∧
  // quantity) conjunctions across BOTH join sides. Catalyst must (a)
  // keep the cross-side disjunction as the join residual, and (b)
  // derive the side-local implied filters (p_brand ∈ {...},
  // l_quantity ∈ [1,30]) so each scan still prunes — the classic test
  // that an optimizer doesn't give up on OR.
  private val q19 = NamedQuery(
    "q19_disjunctive_filter",
    (spark, d) => {
      val li = Tables.lineitem(spark, d)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val pt = broadcast(Tables.part(spark, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(pt, col("l_partkey") === col("p_partkey") && cond)
        .agg(count(lit(1)).as("n"),
          Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
    },
    Some(s"""SELECT count(*) AS n,
        |  ${Money.centsSumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  // ---- Q21 sole blame (adapted: l_returnflag = 'R' stands in for the
  // missing late-receipt predicate): suppliers whose line is the ONLY
  // returned one in a finished multi-supplier order. The textbook
  // formulation is a correlated EXISTS + NOT EXISTS over two extra
  // lineitem self-scans (and the naive decorrelation still scans the
  // fact twice — Spark plans no common-subtree sharing). Here the fact
  // is shuffled ONCE by l_orderkey; that single partitioning satisfies
  // the (l_orderkey, l_suppkey) rollup AND the per-order window that
  // replaces both correlated subqueries (n_suppliers, returns-count
  // over the rolled-up relation), so three logical passes collapse to
  // one scan + one exchange — verified in PLANS.md; at 100 TB the
  // EXISTS formulation's extra fact scans are the whole cost.
  private val q21 = NamedQuery(
    "q21_sole_blame",
    (spark, d) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("l_orderkey"))
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("returned"))
        .withColumn("n_supp", count(lit(1)).over(wOrd))
        .withColumn("n_ret", sum(col("returned")).over(wOrd))
        .filter(col("returned") === 1L && col("n_supp") >= 2 &&
          col("n_ret") === 1)
        .join(Tables.orders(spark, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(Tables.supplier(spark, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    },
    Some("""SELECT s_name, numwait FROM (
        |  SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |  FROM supplier
        |  JOIN (SELECT l_orderkey, l_suppkey,
        |          max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |            AS returned
        |        FROM lineitem GROUP BY 1, 2) l1
        |    ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  WHERE o_orderstatus = 'F' AND l1.returned = 1
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_returnflag = 'R')
        |  GROUP BY s_name)
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))

  // ---- Q22 idle balance (adapted: "no open order" replaces the
  // missing phone-prefix predicate — at sf≥0.01 every customer has
  // SOME order, so the classic never-ordered anti-join is vacuous):
  // rich customers with no in-flight business. Scalar subquery →
  // one-row broadcast cross join; NOT EXISTS → left-anti against the
  // filtered orders projection. Threshold goes through floor() so both
  // engines compare against the identical integer — a raw double
  // average is summation-order-dependent and would flap rows at the
  // boundary.
  private val q22 = NamedQuery(
    "q22_idle_balance",
    (spark, d) => {
      val cust = Tables.customer(spark, d)
      // the average inside floor() runs over exact cents (Money rule 11)
      // so the floored integer can never flap with summation order
      val thresh = cust.filter(col("c_acctbal") > 0)
        .agg(floor(Money.centsSum(col("c_acctbal")) / count(lit(1)))
          .as("bal_floor"))
      cust.crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("bal_floor"))
        .join(Tables.orders(spark, d)
          .filter(col("o_orderstatus") === "O")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_cust"),
          Money.centsSum(col("c_acctbal")).as("total_bal"))
        .orderBy("segment")
    },
    Some(s"""SELECT c_mktsegment AS segment, count(*) AS n_cust,
        |  ${Money.centsSumSql("c_acctbal")} AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT floor(${Money.centsSumSql("c_acctbal")}
        |                               / count(*))
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'O')
        |GROUP BY c_mktsegment
        |ORDER BY segment""".stripMargin))

  // ---- Q9 product profit (adapted: no partsupp, so supply cost is a
  // deterministic fraction of p_retailprice): profit per supplier
  // nation per year over parts matching a name pattern. The 5-relation
  // join with every dimension broadcast and the LIKE filter applied
  // inside the part broadcast subtree — the fact joins only surviving
  // partkeys.
  private val q9 = NamedQuery(
    "q9_product_profit",
    (spark, d) => {
      val redParts = Tables.part(spark, d)
        .filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supNation = Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(spark, d)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(spark, d)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        // exact-cents sum (Money, determinism rule 11): the double-sum
        // round-to-2dp form diverged by a cent at sf1
        .agg(Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("l_quantity") * col("p_retailprice")).as("profit"))
        .orderBy("nation", "o_year")
    },
    Some(s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  ${Money.centsSumSql(
             "l_extendedprice * (1 - l_discount) - 0.6 * l_quantity * p_retailprice")} AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin))

  // ---- Q13 order-count histogram: the distribution query — LEFT join
  // whose extra predicate lives in the ON clause (NOT pushable to a
  // WHERE: it must null-extend, not drop, customers whose only orders
  // are urgent), then a group-by OVER a group-by. The second aggregation
  // is over at most |customers| rows; only the first touches facts.
  private val q13 = NamedQuery(
    "q13_order_histogram",
    (spark, d) => {
      val perCust = Tables.customer(spark, d)
        .select(col("c_custkey"))
        .join(Tables.orders(spark, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority")),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
      perCust.groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(desc("n_cust"), desc("n_orders"))
    },
    Some("""SELECT n_orders, count(*) AS n_cust FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY n_orders
        |ORDER BY n_cust DESC, n_orders DESC""".stripMargin))

  // ---- Q16 supplier variety (adapted: lineitem is the part↔supplier
  // bridge in place of the missing partsupp): how many distinct
  // suppliers ship each (brand, size) bucket, excluding blacklisted
  // suppliers via NOT IN — the null-aware anti-join shape (sub-plan
  // result must be checked for NULLs before any row can pass; here the
  // column is non-nullable so Catalyst degrades it to a plain anti).
  // Expressed through spark.sql to exercise the SQL surface end-to-end.
  private val q16 = NamedQuery(
    "q16_supplier_variety",
    (spark, d) => {
      Tables.registerAll(spark, d)
      spark.sql(
        """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#1'
          |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          |  AND l_suppkey NOT IN
          |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)
    },
    Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin))

  override def all: Seq[NamedQuery] =
    Seq(q6, q9, q12, q13, q14, q16, q19, q21, q22)
}
