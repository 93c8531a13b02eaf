package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar-function breadth (SURVEY.md §2.2 "String fns" / "Date/math fns"
  * / "Array/map/JSON fns"). All whole-stage-codegen built-ins — these
  * queries are narrow (no shuffle except the final sort), so at cluster
  * scale they are pure map work over the parquet scan. */
object ScalarFuncQueries extends QueryRegistry {

  private val strings = NamedQuery(
    "q_string_funcs",
    (spark, d) => Tables.part(spark, d)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("pre"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        trim(col("p_type")).as("trimmed"),
        when(col("p_name").contains("green"), lit("g")).otherwise(lit("-")).as("has_green"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up, length(p_name) AS len,
        |  substr(p_name, 1, 5) AS pre,
        |  replace(p_name, ' ', '_') AS snake,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  trim(p_type) AS trimmed,
        |  CASE WHEN p_name LIKE '%green%' THEN 'g' ELSE '-' END AS has_green
        |FROM part ORDER BY p_partkey""".stripMargin))

  private val dates = NamedQuery(
    "q_date_funcs",
    (spark, d) => Tables.orders(spark, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val mathFns = NamedQuery(
    "q_math_funcs",
    (spark, d) => Tables.lineitem(spark, d)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(ln(col("l_extendedprice") + 1), 6).as("logn"),
        round(pow(col("l_discount"), 2), 8).as("disc_sq"),
        round(exp(col("l_discount")), 8).as("edisc"),
        round(greatest(col("l_tax"), col("l_discount")), 2).as("gt"),
        round(least(col("l_tax"), col("l_discount")), 2).as("lt"),
        floor(col("l_quantity")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        abs(col("l_quantity") - 25).cast("double").as("dist25"),
        pmod(col("l_orderkey"), lit(7)).as("m7"))
      .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice + 1), 6) AS logn,
        |  round(pow(l_discount, 2), 8) AS disc_sq,
        |  round(exp(l_discount), 8) AS edisc,
        |  round(greatest(l_tax, l_discount), 2) AS gt,
        |  round(least(l_tax, l_discount), 2) AS lt,
        |  floor(l_quantity) AS fl, ceil(l_quantity) AS ce,
        |  abs(l_quantity - 25) AS dist25,
        |  l_orderkey % 7 AS m7
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin))

  // events.props is a JSON string (TESTDATA.md) — JSON path extraction +
  // conditional logic; the reference's JSON ingestion (appV2.py:51-60)
  // is the same move at the config level.
  private val json = NamedQuery(
    "q_json_extract",
    (spark, d) => Tables.events(spark, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (get_json_object(col("props"), "$.k").cast("long") % 2 === 0).as("k_even"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.k') AS BIGINT) % 2 = 0 AS k_even
        |FROM events ORDER BY event_id""".stripMargin))

  // Array functions over the embedding vectors: size, element access,
  // slicing, higher-order transform/filter/aggregate — the same HOFs the
  // tagging pipeline and similarity search build on.
  private val arrays = NamedQuery(
    "q_array_funcs",
    (spark, d) => Tables.embeddings(spark, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).cast("double"), 6).as("sum_all"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("sumsq_8"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum_all,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  round(list_sum(list_transform(CAST(embedding[1:8] AS DOUBLE[]), x -> x * x)), 6) AS sumsq_8
        |FROM embeddings ORDER BY vec_id""".stripMargin))

  val all: Seq[NamedQuery] = Seq(strings, dates, mathFns, json, arrays)
}
