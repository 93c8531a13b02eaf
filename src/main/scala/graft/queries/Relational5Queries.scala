package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth relational wave — the last five classic TPC-H templates,
  * completing all 22 query shapes (adapted to the fixtures' reduced
  * schema: no partsupp, so the part↔supplier bridge is derived from
  * lineitem, as in Q16). Each is a distinct optimizer/algebra stress:
  *
  *   - Q2: correlated MIN subquery over an aggregated bridge —
  *     decorrelated to a per-part min WINDOW over that one relation
  *     (no second fact scan, no subtree read twice).
  *   - Q4: date-sliced EXISTS → left-semi join aggregated by priority.
  *   - Q11: group-HAVING against a global scalar of the SAME aggregate —
  *     the aggregate is computed once and broadcast back over itself.
  *   - Q15: a reused view (CTE referenced twice: rows + its max) —
  *     max-revenue supplier(s) with exact integer-cents arithmetic.
  *   - Q20: nested IN chains (parts-by-name → per-(part,supplier)
  *     volume share → supplier semi-join) — three levels of semi-joins.
  *
  * Cross-engine determinism: money sums go through per-row integer
  * cents (Money.quantizeCents — floor(x*100 + 0.5) AS BIGINT, the
  * round-half-up-via-floor quantizer) so aggregation order can never flap a
  * threshold/equality comparison; quantities are integral-valued
  * doubles (sums exact in IEEE); Q2's unit cost is a MIN over per-row
  * divisions (order-insensitive, bit-identical across engines).
  */
object Relational5Queries extends QueryRegistry {

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  /** Exact money arithmetic: per-row discounted price in integer cents
    * through THE shared quantizer (ops.Money.quantizeCents — one audited
    * definition). floor() of the identical IEEE product is bit-identical
    * in both engines, and integer sums are order-insensitive — so
    * thresholds (Q11) and equality against a max (Q15) can never flap. */
  private def revCents: Column =
    graft.ops.Money.quantizeCents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  // ---- Q2 min-cost regional supplier: for each qualifying part, the
  // EUROPE supplier(s) quoting the minimum unit cost. The textbook form
  // correlates a MIN subquery per part; here the aggregated bridge
  // (per-(part,supplier) min unit price from lineitem) is computed ONCE
  // and the correlation becomes a min-window + equality filter on that
  // same relation — no re-scan of the fact, no duplicated subtree. All
  // dimensions broadcast; the only big shuffle is the bridge groupBy on
  // (partkey, suppkey); the window exchange moves aggregated rows only.
  private val q2 = NamedQuery(
    "q2_min_cost_supplier",
    (spark, d) => {
      val parts = Tables.part(spark, d)
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val eurSupp = Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)
          .join(broadcast(Tables.region(spark, d)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      // r14 opt (guide §2.3: filter before the exchange): the broadcast
      // dimension joins sit BELOW the bridge aggregation, so only
      // lineitems of qualifying parts × EUROPE suppliers (~1% of rows)
      // reach the groupBy shuffle — filtering the aggregated bridge
      // afterwards shuffled the whole fact's (part, supplier) pairs to
      // then drop 99%. Identical relation: the filters are on the group
      // KEYS, so restricting rows before the keyed MIN restricts groups
      // and changes no surviving group's minimum; the carried dim
      // columns are functions of the keys (same group cardinality).
      val bridge = Tables.lineitem(spark, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("l_suppkey"),
          col("s_name"), col("s_acctbal"), col("n_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      // per-part regional minimum as a WINDOW over the aggregated+joined
      // relation: structurally one read of the bridge (a groupBy + join
      // back would reference the subtree twice and lean on exchange
      // reuse), and the window exchange carries only aggregated rows
      val wPart = Window.partitionBy(col("p_partkey"))
      bridge
        .withColumn("min_cost", min(col("cost")).over(wPart))
        .filter(col("cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost"))
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
        .limit(100)
    },
    Some("""WITH bridge AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, cost
        |FROM bridge
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND cost = (SELECT min(b2.cost) FROM bridge b2
        |              JOIN supplier s2 ON b2.l_suppkey = s2.s_suppkey
        |              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |              WHERE b2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin))

  // ---- Q4 order-priority check (adapted: a returned line stands in
  // for the missing late-receipt predicate): per-priority count of
  // quarter orders with at least one returned lineitem. EXISTS becomes
  // a left-semi join; the date slice prunes the orders scan BEFORE the
  // semi-join, and the lineitem side carries only (orderkey) through
  // the shuffle.
  private val q4 = NamedQuery(
    "q4_priority_check",
    (spark, d) => Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1997-07-01") &&
        col("o_orderdate") < ts("1997-10-01"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .join(Tables.lineitem(spark, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))

  // ---- Q11 important stock (adapted: per-part shipped value from the
  // two-nation supplier slice replaces partsupp value): parts whose
  // value exceeds 0.1% of the slice total. The HAVING-vs-global-scalar
  // shape: the SAME aggregate feeds both the rows and the threshold —
  // computed once, reduced to one row, broadcast back (never a second
  // fact pass). Integer-cents arithmetic makes the threshold exact.
  private val q11 = NamedQuery(
    "q11_important_stock",
    (spark, d) => {
      val natSupp = Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)
          .filter(col("n_name").isin("NATION_3", "NATION_7"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val vals = Tables.lineitem(spark, d)
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("p_key"))
        .agg(sum(revCents).as("value_cents"))
      val thresh = vals.agg(
        floor(sum(col("value_cents")) / lit(1000.0)).as("cut"))
      vals.crossJoin(broadcast(thresh))
        .filter(col("value_cents") > col("cut"))
        .select(col("p_key"), col("value_cents"))
        .orderBy(desc("value_cents"), asc("p_key"))
    },
    Some("""WITH vals AS (
        |  SELECT l_partkey AS p_key,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |                  AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN
        |    (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |     WHERE n_name IN ('NATION_3', 'NATION_7'))
        |  GROUP BY 1)
        |SELECT p_key, value_cents FROM vals
        |WHERE value_cents > (SELECT floor(sum(value_cents) / 1000.0) FROM vals)
        |ORDER BY value_cents DESC, p_key""".stripMargin))

  // ---- Q15 top supplier: quarterly revenue per supplier, return the
  // one(s) achieving the maximum. The classic tests view reuse — the
  // revenue relation is referenced twice (its rows and its max). Here
  // it is one aggregation whose one-row max is broadcast back; equality
  // against the max is exact because revenue is integer cents.
  private val q15 = NamedQuery(
    "q15_top_supplier",
    (spark, d) => {
      val rev = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1997-10-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revCents).as("total_revenue_cents"))
      val mx = rev.agg(max(col("total_revenue_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue_cents") === col("mx"))
        .join(broadcast(Tables.supplier(spark, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |                  AS BIGINT)) AS BIGINT) AS total_revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_cents
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin))

  // ---- Q20 part promotion (adapted: a supplier's 1997 volume share of
  // a part replaces the partsupp availability test): suppliers in a
  // nation slice who shipped >30% of some 'cold' part's annual volume.
  // Three nested IN levels collapse to: broadcast parts filter → one
  // (part,supplier) aggregation → per-part total via a window over the
  // SAME shuffle partitioning (groupBy l_partkey,l_suppkey then window
  // by l_partkey needs no second exchange) → distinct suppliers →
  // left-semi into the dimension. Quantities are integral doubles, so
  // the 30% share comparison is bit-deterministic.
  private val q20 = NamedQuery(
    "q20_part_promotion",
    (spark, d) => {
      val coldParts = Tables.part(spark, d)
        .filter(col("p_name").contains("cold"))
        .select(col("p_partkey"))
      val wPart = Window.partitionBy(col("l_partkey"))
      val excess = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(broadcast(coldParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("supp_qty"))
        .withColumn("part_qty", sum(col("supp_qty")).over(wPart))
        .filter(col("supp_qty") > lit(0.3) * col("part_qty"))
        .select(col("l_suppkey"))
        .distinct()
      Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)
          .filter(col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_5", "NATION_8"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_name")
    },
    Some("""SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_5','NATION_8')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM (
        |      SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty,
        |        sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
        |      FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01'
        |        AND l_partkey IN
        |          (SELECT p_partkey FROM part WHERE p_name LIKE '%cold%')
        |      GROUP BY 1, 2) t
        |    WHERE supp_qty > 0.3 * part_qty)
        |ORDER BY s_name""".stripMargin))

  override def all: Seq[NamedQuery] = Seq(q2, q4, q11, q15, q20)
}
