package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third relational wave: the classic TPC-H multi-join analytics shapes
  * that stress join ORDER and dimension broadcasting — volume shipping
  * between nation pairs (Q7), national market share (Q8), returned-item
  * revenue (Q10), and large-volume orders via a grouped HAVING semi-join
  * (Q18). Each is the canonical template for a 100 TB star-schema
  * report: fact table scanned once with pushed-down filters, every
  * dimension broadcast, aggregation partial map-side.
  */
object Relational3Queries extends QueryRegistry {

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  // ---- Q7 volume shipping: lineitem joined to BOTH ends of the trade
  // (supplier nation, customer nation), restricted to one nation pair.
  // The nation filter lands on the two broadcast dimension subtrees, so
  // the fact scan only keeps rows whose supplier survives the broadcast
  // hash lookup — no shuffle touches the full lineitem.
  private val q7 = NamedQuery(
    "q7_volume_shipping",
    (spark, d) => {
      val nat = Tables.nation(spark, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = Tables.supplier(spark, d)
        .join(broadcast(nat.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.customer(spark, d)
        .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"), col("cust_nation"))
      val li = Tables.lineitem(spark, d)
        .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(count(lit(1)).as("n"),
          Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year,
        |  CAST(count(*) AS BIGINT) AS n, ${Money.centsSumSql("volume")} AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
        |                       AND TIMESTAMP '1997-12-31')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  // ---- Q8 national market share: the 7-relation join. All five
  // dimension subtrees (region→nation→customer reachability as a
  // semi-join, PROMO parts, supplier nation) broadcast; the only
  // shuffles left are the lineitem⋈orders fact-fact join and the final
  // 7-group aggregation. The share is a ratio of two conditional sums
  // computed in ONE aggregation pass (no self-join).
  private val q8 = NamedQuery(
    "q8_market_share",
    (spark, d) => {
      val nat = Tables.nation(spark, d)
      val asiaKeys = nat
        .join(broadcast(Tables.region(spark, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val asiaCust = Tables.customer(spark, d)
        .join(broadcast(asiaKeys), col("c_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("c_custkey"))
      val promo = Tables.part(spark, d)
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val supN = Tables.supplier(spark, d)
        .join(broadcast(nat.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(spark, d)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        // both sums in exact cents (Money rule 11) so the ratio's inputs
        // are bit-identical across engines
        .agg(round(
          Money.centsSumRaw(when(col("supp_nation") === "NATION_5", vol)
            .otherwise(lit(0.0))).cast("double")
            / Money.centsSumRaw(vol).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(s"""SELECT o_year,
        |  round(CAST(${Money.centsSumRawSql(
             "CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")} AS DOUBLE)
        |        / CAST(${Money.centsSumRawSql("volume")} AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin))

  // ---- Q10 returned-item report: which customers returned the most
  // revenue in a quarter-ish window. Date filter pushes to the orders
  // scan, returnflag filter to the lineitem scan; the customer join
  // carries only surviving orders.
  private val q10 = NamedQuery(
    "q10_returned_items",
    (spark, d) => {
      val ord = Tables.orders(spark, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-07-01"))
      val li = Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name,
        |  ${Money.centsSumSql("l_extendedprice * (1 - l_discount)")} AS revenue, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin))

  // ---- Q18 large-volume orders: grouped-HAVING subquery driving a
  // semi-join. The qualifying-keys aggregation reuses the same
  // fact-table shuffle partitioning as the outer per-order aggregation;
  // the semi-join never widens rows, and AQE broadcasts the (tiny)
  // qualifying-key set at runtime. o_totalprice is emitted RAW — it's a
  // stored value, bit-identical in both engines, and round()'s half-way
  // tie-break rules differ cross-engine (COVERAGE.md rule 2).
  private val q18 = NamedQuery(
    "q18_large_orders",
    (spark, d) => {
      val li = Tables.lineitem(spark, d)
      val bigOrders = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
        .select(col("l_orderkey").as("big_orderkey"))
      Tables.orders(spark, d)
        .join(bigOrders, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"))
        .select(col("c_custkey"), col("o_orderkey"),
          col("o_totalprice").as("totalprice"), col("sum_qty"))
        .orderBy(desc("totalprice"), col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_custkey, o_orderkey, o_totalprice AS totalprice,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_custkey, o_orderkey, o_totalprice
        |ORDER BY totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin))

  val all: Seq[NamedQuery] = Seq(q7, q8, q10, q18)
}
