package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Breadth surface over the TPC-H-ish fixture tables (SURVEY.md §2.2):
  * scans, filters, equi/semi/anti joins, aggregations (incl. rollup/cube
  * and max_by), window functions, sorts/top-k, set ops, scalar string /
  * date / math functions. Each query is shaped for scale: filters push to
  * the parquet scan, small dimensions are broadcast, aggregations are
  * partial-aggregated map-side by Catalyst. */
object RelationalQueries extends QueryRegistry {

  // ---- Q1-style pricing summary: full-scan groupBy aggregation.
  // Map-side partial aggregation keeps the shuffle tiny (6 groups).
  private val q1 = NamedQuery(
    "q1_pricing_summary",
    (spark, d) => Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        Money.centsSum(col("l_extendedprice")).as("sum_base_price"),
        Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Money.centsMean(col("l_quantity")).as("avg_qty"),
        Money.centsMean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  ${Money.centsSumSql("l_extendedprice")} AS sum_base_price,
        |  ${Money.centsSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        |  ${Money.centsMeanSql("l_quantity")} AS avg_qty,
        |  ${Money.centsMeanSql("l_discount")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // ---- Multi-way star join with broadcast dimensions + top-k.
  private val q3 = NamedQuery(
    "q3_top_revenue_orders",
    (spark, d) => {
      val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(spark, d)
      val li = Tables.lineitem(spark, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Money.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority").as("orderpriority"), col("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_orderpriority AS orderpriority,
        |  ${Money.centsSumSql("l_extendedprice * (1 - l_discount)")} AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin))

  // ---- Semi + anti joins (EXISTS / NOT EXISTS): customers with open
  // orders but no F orders. left_semi/left_anti never widen rows, so the
  // build side stays small and broadcastable.
  private val semiAnti = NamedQuery(
    "q_semi_anti_customers",
    (spark, d) => {
      val cust = Tables.customer(spark, d)
      val ord = Tables.orders(spark, d)
      val open = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val finished = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
        .join(finished, cust("c_custkey") === finished("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin))

  // ---- Window functions: rank within partition + running frame.
  private val window = NamedQuery(
    "q_window_supplier_rank",
    (spark, d) => {
      val li = Tables.lineitem(spark, d)
      val bySupp = li.groupBy("l_suppkey", "l_returnflag")
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("qty"), col("l_suppkey"))
      bySupp
        .withColumn("rnk", row_number().over(w))
        .withColumn("running_qty",
          round(sum(col("qty")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter(col("rnk") <= 5)
        .orderBy("l_returnflag", "rnk")
    },
    Some("""SELECT * FROM (
        |  SELECT l_suppkey, l_returnflag, qty,
        |    row_number() OVER w AS rnk,
        |    round(sum(qty) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |  FROM (SELECT l_suppkey, l_returnflag, round(sum(l_quantity), 2) AS qty
        |        FROM lineitem GROUP BY l_suppkey, l_returnflag) s
        |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY qty DESC, l_suppkey)
        |) t WHERE rnk <= 5
        |ORDER BY l_returnflag, rnk""".stripMargin))

  val all: Seq[NamedQuery] = Seq(q1, q3, semiAnti, window)
}
