package graft.queries

import graft.Tables
import graft.ops.Money
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
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (several
      // linenumber-1 rows share an orderkey), so orderkey alone is not a
      // total order and the engines may interleave ties differently
      // (caught by the sf1 headroom gate). Ordering by every emitted
      // column makes the sequence deterministic regardless.
      .orderBy("l_orderkey", "sq", "disc_sq", "gt", "lt", "fl", "m7"),
    Some("""SELECT l_orderkey,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice + 1), 6) AS logn,
        |  round(pow(l_discount, 2), 8) AS disc_sq,
        |  round(exp(l_discount), 8) AS edisc,
        |  round(greatest(l_tax, l_discount), 2) AS gt,
        |  round(least(l_tax, l_discount), 2) AS lt,
        |  CAST(floor(l_quantity) AS BIGINT) AS fl,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |  abs(l_quantity - 25) AS dist25,
        |  l_orderkey % 7 AS m7
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey, sq, disc_sq, gt, lt, fl, m7""".stripMargin))

  // events.props is a JSON string (TESTDATA.md) — JSON path extraction +
  // conditional logic; the reference's JSON ingestion (appV2.py:51-60)
  // is the same move at the config level.
  private val json = NamedQuery(
    "q_json_extract",
    (spark, d) => Tables.events(spark, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        // schema-full parse of the same payload (from_json → struct)
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_struct"),
        (get_json_object(col("props"), "$.k").cast("long") % 2 === 0).as("k_even"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct,
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

  // Edit-distance near-dup over the (small) supplier dimension — the
  // textual-similarity primitive Levenshtein, bounded to an O(small²)
  // pair space (at scale this runs AFTER a blocking stage, never raw).
  // Broadcast kernel: the declarative self-join copies every joined row
  // before the distance filter (graft.ops.TextOps.allPairsLevenshteinLocal).
  private val editDistance = NamedQuery(
    "q_edit_distance",
    (spark, d) => {
      val s = Tables.supplier(spark, d).select(col("s_suppkey"), col("s_name"))
      graft.ops.TextOps.allPairsLevenshteinLocal(s, "s_suppkey", "s_name", 3)
        .orderBy("id1", "id2")
    },
    Some("""SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 3
        |ORDER BY id1, id2""".stripMargin))

  // Explicit outer-join semantics with NULL handling: customers and
  // their order counts, keeping order-less customers (coalesce to 0).
  private val outerJoins = NamedQuery(
    "q_outer_join_nulls",
    (spark, d) => {
      val perCust = Tables.orders(spark, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"),
          Money.centsSum(col("o_totalprice")).as("spend"))
      Tables.customer(spark, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"),
          col("n_orders").isNull.as("never_ordered"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(spend, 0.0) AS spend,
        |  n_orders IS NULL AS never_ordered
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    ${Money.centsSumSql("o_totalprice")} AS spend
        |  FROM orders GROUP BY o_custkey) t ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin))

  // Array set algebra over per-document token sets.
  private val arraySetOps = NamedQuery(
    "q_array_setops",
    (spark, d) => {
      val docs = Tables.documents(spark, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      docs.as("a").join(docs.as("b"),
          col("a.doc_id") + 1 === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"),
          size(array_intersect(col("a.ws"), col("b.ws"))).as("n_common"),
          size(array_union(col("a.ws"), col("b.ws"))).as("n_union"),
          size(array_except(col("a.ws"), col("b.ws"))).as("n_only_a"),
          array_join(slice(array_sort(array_intersect(col("a.ws"), col("b.ws"))), 1, 3), ",")
            .as("first_common"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS ws
        |            FROM documents WHERE doc_id < 50)
        |SELECT a.doc_id AS doc_id,
        |  CAST(len(list_intersect(a.ws, b.ws)) AS INT) AS n_common,
        |  CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS INT) AS n_union,
        |  CAST(len(list_filter(a.ws, x -> NOT list_contains(b.ws, x))) AS INT) AS n_only_a,
        |  array_to_string(list_sort(list_intersect(a.ws, b.ws))[1:3], ',') AS first_common
        |FROM t a JOIN t b ON a.doc_id + 1 = b.doc_id
        |ORDER BY doc_id""".stripMargin))

  // regexp_extract_all — the multi-match extraction primitive (entity /
  // pattern harvesting). The pattern sticks to the regex subset Java
  // (Spark) and RE2 (DuckDB) define identically: alternation, word
  // boundaries, no backrefs/lookaround. Per-row narrow map — no
  // shuffle until the final tiny ORDER BY.
  private val regexExtractAll = NamedQuery(
    "q_regexp_extract_all",
    (spark, d) => Tables.documents(spark, d)
      // pushable twin of the n_hits > 0 cut (size(regexp(null)) is null,
      // so a null text never survives it): lets the scan skip all-null
      // row groups instead of pushing nothing (PlanSweepSpec check 4)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        regexp_extract_all(col("text"),
          lit("\\b(data|query|spark|join)\\b"), lit(0)).as("hits"))
      .select(col("doc_id"),
        size(col("hits")).as("n_hits"),
        size(array_distinct(col("hits"))).as("n_distinct"),
        array_join(array_sort(array_distinct(col("hits"))), ",").as("terms"))
      .filter(col("n_hits") > 0)
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
        |  CAST(len(hits) AS INT) AS n_hits,
        |  CAST(len(list_distinct(hits)) AS INT) AS n_distinct,
        |  array_to_string(list_sort(list_distinct(hits)), ',') AS terms
        |FROM (SELECT doc_id,
        |        regexp_extract_all(text, '\b(data|query|spark|join)\b') AS hits
        |      FROM documents) t
        |WHERE len(hits) > 0
        |ORDER BY doc_id""".stripMargin))

  // ---- Blocked approximate string join (the scale path q_edit_distance's
  // comment promises): Gravano et al., VLDB'01 "Approximate String Joins
  // in a Database (Almost) for Free". Candidate pairs come from a char-
  // TRIGRAM inverted-index equi-join with the COUNT FILTER — ed(a,b) ≤ k
  // implies the pair shares ≥ max(|a|,|b|)−q+1−k·q q-grams (each edit
  // destroys ≤ q grams), and the join's Σ cₐ·c_b per pair only
  // overcounts the multiset intersection, so filtering on it never
  // loses a true pair — then exact Levenshtein verifies the survivors.
  // The bound degenerates (≤ 0) only when max(|a|,|b|) ≤ q−1+k·q = 8,
  // so pairs of SHORT strings route through the broadcast all-pairs
  // kernel over the (tiny) short subset instead; strings with |s| < q
  // have no grams at all, and any ed ≤ k partner of one is itself short
  // (|b| ≤ |a|+k < q+k ≤ 8), so the split loses nothing. The oracle
  // states the naive quadratic join; identical output, index-join cost.
  /** The %50-sampled part slice both ER queries resolve over. */
  private def erRel(spark: org.apache.spark.sql.SparkSession, d: String) =
    Tables.part(spark, d)
      .filter(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").as("id"), col("p_name").as("name"),
        length(col("p_name")).as("len"),
        Money.quantizeCents(col("p_retailprice")).as("cents"))

  /** Blocked near-pair builder shared by q_er_gram_blocked and
    * q_er_resolve: trigram count-filter candidates + Levenshtein verify,
    * broadcast all-pairs fallback for the short set (see the comment
    * above q_er_gram_blocked for the soundness argument). */
  private def erNearPairs(rel: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (q, k, shortMax) = (3, 2, 8) // shortMax = q-1+k*q
    // non-distinct trigrams: multiplicity feeds the count filter's
    // sound overcount (Σ ca·cb ≥ multiset intersection)
    val grams = rel.filter(col("len") >= q)
      .select(col("id"), col("len"), explode(expr(
        s"transform(sequence(1, length(name) - ${q - 1})," +
          s" i -> substring(name, i, $q))")).as("g"))
    val candidates = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k &&
          greatest(col("a.len"), col("b.len")) > shortMax)
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        greatest(col("a.len"), col("b.len")).as("mx"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= col("mx") - (q - 1) - k * q)
      .select("id1", "id2")
    val verified = candidates
      .join(rel.select(col("id").as("id1"), col("name").as("n1")), "id1")
      .join(rel.select(col("id").as("id2"), col("name").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        levenshtein(col("n1"), col("n2")).as("dist"))
      .filter(col("dist") <= k)
    val shortPairs = graft.ops.TextOps.allPairsLevenshteinLocal(
      rel.filter(col("len") <= shortMax), "id", "name", k)
    verified.unionByName(shortPairs)
  }

  private val erGramBlocked = NamedQuery(
    "q_er_gram_blocked",
    (spark, d) => erNearPairs(erRel(spark, d)).orderBy("id1", "id2"),
    Some("""SELECT a.p_partkey AS id1, b.p_partkey AS id2,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        | AND a.p_partkey % 50 = 0 AND b.p_partkey % 50 = 0
        | AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id1, id2""".stripMargin))

  // ---- ER capstone — golden-record resolution: near-pairs → connected
  // components (transitive closure of "is probably the same entity") →
  // one survivorship record per cluster (canonical name from the
  // min-id member, exact-cents average price across members; singletons
  // resolve to themselves). This is the MDM shape: the pair relation is
  // blocked (never quadratic), the component step is the repo's
  // pointer-doubling min-label propagation (O(log diameter) rounds),
  // and the golden-record rollup is one partial-aggregated shuffle on
  // the cluster label.
  private val erResolve = NamedQuery(
    "q_er_resolve",
    (spark, d) => {
      // pairs + the golden rollup both consume the slice: pin it, or the
      // gram explode and Levenshtein verify run once per consumer
      val rel = erRel(spark, d).localCheckpoint()
      val comp = graft.ops.Components.connectedComponents(
        erNearPairs(rel).select(col("id1").as("src"), col("id2").as("dst")))
      rel.join(comp.withColumnRenamed("id", "rid"),
          col("id") === col("rid"), "left")
        .select(col("id"), col("name"), col("cents"),
          coalesce(col("component"), col("id")).as("cluster"))
        .groupBy("cluster")
        .agg(count(lit(1)).cast("bigint").as("n_members"),
          min_by(col("name"), col("id")).as("canonical_name"),
          // RAW emit (rule 12): the mean of integer cents is a rational
          // that can land exactly on a 4dp half-boundary as clusters
          // grow; identical integers through the identical division
          // chain are bit-identical doubles, round() would diverge
          (sum(col("cents")).cast("double") / count(lit(1)) / 100.0)
            .as("avg_price"))
        .orderBy("cluster")
    },
    Some("""WITH RECURSIVE rel AS (
        |  SELECT p_partkey AS id, p_name AS name,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM part WHERE p_partkey % 50 = 0),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2 FROM rel a JOIN rel b
        |    ON a.id < b.id AND levenshtein(a.name, b.name) <= 2),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach(node, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
        |comp AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
        |lab AS (
        |  SELECT rel.id, rel.name, rel.cents,
        |    coalesce(comp.cluster, rel.id) AS cluster
        |  FROM rel LEFT JOIN comp ON rel.id = comp.node)
        |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
        |  arg_min(name, id) AS canonical_name,
        |  CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS avg_price
        |FROM lab GROUP BY cluster ORDER BY cluster""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(strings, dates, mathFns, json, arrays, editDistance, outerJoins,
      arraySetOps, regexExtractAll, erGramBlocked, erResolve)
}
