package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distribution statistics the earlier rounds lacked: exact interpolated
  * quantiles, ntile bucketing, and higher central moments
  * (skewness/kurtosis). The reference's only statistics are min/max/avg
  * implicit in its progress printout (appV2.py:186-190); these are the
  * quality-scoring distribution tools a 100 TB curation pipeline cuts
  * thresholds with (e.g. "drop the bottom decile by quality score").
  *
  * Scale notes: percentile() is a single-pass typed-aggregate per group
  * (partial+final merge, no sort-the-world); ntile shuffles only the
  * bucketed column; the moments query is two scans of one group's rows
  * (mean pass + centered pass) with map-side partial aggregation.
  *
  * Engine-portability: Spark `percentile` and DuckDB `quantile_cont`
  * both define the exact linearly-interpolated quantile at rank
  * (n-1)·q, so they agree to double precision. Spark/DuckDB skewness()
  * and kurtosis() do NOT share a definition (sample vs population
  * corrections — oracle-parity-rules), so the moments query computes the
  * population moments g1/g2 EXPLICITLY from normalized power sums —
  * identical arithmetic on both engines, one definition on both sides. */
object StatsQueries extends QueryRegistry {

  // Exact quartiles + p95 of extended price per return flag. The
  // aggregate is algebraic in the Spark sense (partial state = a digest
  // of observed values per group merged across partitions) — no global
  // sort, no window over the raw table.
  private val percentiles = NamedQuery(
    "q_percentile_cont",
    (spark, d) => Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.50)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // Decile bucketing of customers by account balance — ntile is the
  // canonical "cut the corpus into quality bands" primitive. Both
  // engines share ntile's definition (equal buckets, remainder spread
  // over the leading buckets); the ORDER BY carries the id tie-break so
  // equal balances land identically.
  //
  // TWO-PHASE global rank (the 100 TB shape — `ntile(10) OVER (ORDER BY
  // …)` would sort the corpus in ONE partition): phase 1 histograms the
  // rows on a coarse value bucket (floor of the balance — the bucket
  // count is bounded by the VALUE DOMAIN, not the row count) and turns
  // the tiny histogram into per-bucket rank offsets; phase 2 ranks
  // rows WITHIN their bucket (a partitioned window — every partition
  // sorts locally) and adds the broadcast offset. bucket order is
  // consistent with the (balance, id) total order, so offset + local
  // rank IS the global rank, and the ntile bucket is closed-form
  // arithmetic on that rank (first n%10 deciles get ⌈n/10⌉ rows).
  // The shape is factored as ops.Ranking.groupedRank/ntileFromRank and
  // reused by text_perplexity_buckets (per-language terciles).
  private val deciles = NamedQuery(
    "q_ntile_deciles",
    (spark, d) => {
      val cust = Tables.customer(spark, d).select(col("c_custkey"), col("c_acctbal"))
      graft.ops.Ranking.groupedRank(cust, Seq.empty, col("c_acctbal"),
          floor(col("c_acctbal")).cast("long"), Seq("c_custkey"))
        .withColumn("decile",
          graft.ops.Ranking.ntileFromRank(col("rank"), col("grp_n"), 10))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          round(min(col("c_acctbal")), 2).as("lo"),
          round(max(col("c_acctbal")), 2).as("hi"),
          graft.ops.Money.centsMean(col("c_acctbal")).as("mean_bal"))
        .orderBy("decile")
    },
    Some(s"""SELECT decile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS lo,
        |  round(max(c_acctbal), 2) AS hi,
        |  ${graft.ops.Money.centsMeanSql("c_acctbal")} AS mean_bal
        |FROM (SELECT c_custkey, c_acctbal,
        |        ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        |      FROM customer) t
        |GROUP BY decile ORDER BY decile""".stripMargin))

  // Population skewness g1 = E[z³] and excess kurtosis g2 = E[z⁴]−3 from
  // explicitly normalized power sums (z = (x−μ)/σ_pop): one definition,
  // same arithmetic, both engines — immune to the engines' different
  // built-in skewness/kurtosis sample corrections. Two-pass shape (mean
  // then centered moments) is the numerically-stable formulation; at
  // scale it is two map-side-combined aggregations over the same
  // partition-local data, and the broadcast of the 3-row moment table
  // back onto the group keys is free.
  private val moments = NamedQuery(
    "q_central_moments",
    (spark, d) => {
      val li = Tables.lineitem(spark, d)
      val mu = li.groupBy("l_returnflag")
        .agg(avg(col("l_extendedprice")).as("mu"),
          stddev_pop(col("l_extendedprice")).as("sigma"))
      li.join(broadcast(mu), "l_returnflag")
        .withColumn("z", (col("l_extendedprice") - col("mu")) / col("sigma"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(avg(pow(col("z"), 3)), 4).as("skew_g1"),
          round(avg(pow(col("z"), 4)) - 3.0, 4).as("kurt_g2"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (
        |  SELECT l_returnflag, avg(l_extendedprice) AS mu,
        |         stddev_pop(l_extendedprice) AS sigma
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  round(avg(pow((l_extendedprice - mu) / sigma, 3)), 4) AS skew_g1,
        |  round(avg(pow((l_extendedprice - mu) / sigma, 4)) - 3.0, 4) AS kurt_g2
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin))

  // Robust outlier detection: median absolute deviation with the
  // 1.4826 normal-consistency constant — the outlier filter that
  // survives the very outliers it hunts (3σ rules don't: extreme values
  // inflate σ and mask themselves). Three passes, each a
  // partial-aggregated groupBy with a tiny broadcast between — no
  // global sort at any step. Medians interpolate identically in both
  // engines; the threshold multiply is the same IEEE arithmetic on the
  // same doubles, so the outlier predicate lands identically.
  private val madOutliers = NamedQuery(
    "q_mad_outliers",
    (spark, d) => {
      val li = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val med = li.groupBy("l_returnflag")
        .agg(expr("median(l_extendedprice)").as("med"))
      val mad = li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(max(col("med")).as("med"),
          expr("median(abs(l_extendedprice - med))").as("mad"))
      li.join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("l_extendedprice") - col("med")) >
            col("mad") * 3.0 * 1.4826, 1L).otherwise(0L)).as("n_outliers"),
          round(max(col("med")), 4).as("med"),
          round(max(col("mad")), 4).as("mad"))
        .orderBy("l_returnflag")
    },
    Some("""WITH med AS (
        |  SELECT l_returnflag, median(l_extendedprice) AS med
        |  FROM lineitem GROUP BY l_returnflag),
        |mad AS (
        |  SELECT l.l_returnflag, max(med) AS med,
        |    median(abs(l_extendedprice - med)) AS mad
        |  FROM lineitem l JOIN med USING (l_returnflag)
        |  GROUP BY l.l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(l_extendedprice - med) > mad * 3.0 * 1.4826
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(max(med), 4) AS med,
        |  round(max(mad), 4) AS mad
        |FROM lineitem l JOIN mad USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin))

  // Shannon entropy of the language mix per source — the diversity
  // metric behind data-mixing decisions ("is this crawl slice
  // monolingual?"). Probabilities are exact integer ratios; the ln runs
  // on identical doubles in both engines and the per-group sum spans ≤
  // a handful of languages, so round(6) is far beyond the ulp noise.
  // One partial-aggregated shuffle on (source, lang), then a broadcast
  // of per-source totals back onto the tiny group relation.
  private val entropyMix = NamedQuery(
    "q_entropy_mix",
    (spark, d) => {
      val c = Tables.documents(spark, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      val t = c.groupBy("source").agg(sum(col("n")).as("tot"))
      c.join(broadcast(t), "source")
        .withColumn("p", col("n") / col("tot"))
        .groupBy("source")
        .agg(max(col("tot")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          round(-sum(col("p") * log(col("p"))), 6).as("entropy_nats"))
        .orderBy("source")
    },
    Some("""WITH c AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY source)
        |SELECT source, max(tot) AS n_docs, count(*) AS n_langs,
        |  round(-sum((n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE))), 6) AS entropy_nats
        |FROM c JOIN t USING (source)
        |GROUP BY source ORDER BY source""".stripMargin))

  // Exact mode and exact DISCRETE median (percentile_disc dual of
  // q_percentile_cont's interpolation): mode = arg-max of the value
  // histogram with a value tie-break, discrete median = the row at rank
  // ⌈n/2⌉ in value order. Both are rank selections with deterministic
  // tie-breaks — engine-portable where built-in mode() (arbitrary tie)
  // is not. The histogram aggregation collapses the rank window's input
  // to |distinct values| rows, so nothing global-sorts the raw table.
  private val modeDisc = NamedQuery(
    "q_mode_disc",
    (spark, d) => {
      val hist = Tables.lineitem(spark, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val byCount = Window.partitionBy("l_returnflag")
        .orderBy(desc("cnt"), asc("l_quantity"))
      val byValue = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      hist
        .withColumn("mode_rn", row_number().over(byCount))
        .withColumn("cum", sum(col("cnt")).over(byValue))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy("l_returnflag")))
        .groupBy("l_returnflag")
        .agg(
          max(when(col("mode_rn") === 1, col("l_quantity"))).as("mode_qty"),
          max(when(col("mode_rn") === 1, col("cnt"))).as("mode_n"),
          min(when(col("cum") >= ceil(col("total") / 2), col("l_quantity"))).as("median_disc"))
        .orderBy("l_returnflag")
    },
    Some("""WITH hist AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_quantity) AS mode_rn,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS total
        |  FROM hist)
        |SELECT l_returnflag,
        |  max(CASE WHEN mode_rn = 1 THEN l_quantity END) AS mode_qty,
        |  CAST(max(CASE WHEN mode_rn = 1 THEN cnt END) AS BIGINT) AS mode_n,
        |  min(CASE WHEN cum >= ceil(total / 2.0) THEN l_quantity END) AS median_disc
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // Pearson χ² independence test over the lang × source contingency
  // table — the categorical drift / association check a curation
  // pipeline runs between corpus slices. Scale shape: ONE cell
  // aggregation (cells bounded by the category-domain product, not row
  // count), margins re-aggregated from the tiny cell relation and
  // broadcast back; no second corpus pass, no window. Determinism:
  // expected counts are exact-integer products through one double
  // division, per-cell contributions are the identical IEEE sequence
  // both engines, and the χ² sum is an explicit fold over the
  // (lang, source)-ordered cell list — never an unordered SUM of
  // doubles. Cramér's V derives from the unrounded χ².
  private val chisq = NamedQuery(
    "q_chisq_independence",
    (spark, d) => {
      val docs = Tables.documents(spark, d)
      val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rm = cells.groupBy("lang").agg(sum(col("o")).as("rm"))
      val cm = cells.groupBy("source").agg(sum(col("o")).as("cm"))
      val tot = docs.agg(count(lit(1)).as("n"),
        countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"))
      // the COMPLETE r×c table, not just observed cells: Pearson χ²
      // sums over every (row, col) combination — an unobserved pair
      // still contributes its full expected count E = rm·cm/n as
      // (0−E)²/E = E. Building cells from groupBy alone silently
      // dropped those terms in BOTH engines (gate-blind, review r11);
      // the margin cross join is r×c rows — tiny by domain, never by
      // corpus.
      val grid = broadcast(rm).crossJoin(broadcast(cm))
      grid.join(cells, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(tot))
        // margins cast to double BEFORE the multiply: rm·cm in LONG
        // silently wraps past 2^63 at corpus scale (DuckDB's BIGINT
        // multiply would error instead — divergent). Each margin is an
        // exact double (< 2^53), so the IEEE product is the same value
        // the exact-integer product would round to.
        .withColumn("e", col("rm").cast("double") * col("cm") / col("n"))
        .withColumn("contrib",
          (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
        .groupBy("n", "r", "c")
        .agg(aggregate(
          transform(
            array_sort(collect_list(struct(col("lang"), col("source"),
              col("contrib")))),
            x => x.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("chi2_raw"))
        .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
          round(col("chi2_raw"), 6).as("chi2"),
          round(sqrt(col("chi2_raw") /
            (col("n") * least(col("r") - 1, col("c") - 1))), 6).as("cramers_v"))
    },
    Some("""WITH cells AS (SELECT lang, source, count(*) AS o
        |               FROM documents GROUP BY 1, 2),
        |rm AS (SELECT lang, sum(o) AS rm FROM cells GROUP BY 1),
        |cm AS (SELECT source, sum(o) AS cm FROM cells GROUP BY 1),
        |tot AS (SELECT count(*) AS n, count(DISTINCT lang) AS r,
        |               count(DISTINCT source) AS c FROM documents),
        |grid AS (SELECT lang, rm, source, cm FROM rm CROSS JOIN cm),
        |co AS (SELECT grid.lang, grid.source, n, r, c,
        |         (coalesce(o, 0) - (CAST(rm AS DOUBLE) * cm) / n)
        |           * (coalesce(o, 0) - (CAST(rm AS DOUBLE) * cm) / n)
        |           / ((CAST(rm AS DOUBLE) * cm) / n) AS contrib
        |       FROM grid LEFT JOIN cells USING (lang, source)
        |       CROSS JOIN tot),
        |s AS (SELECT n, r, c,
        |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list(contrib ORDER BY lang, source)), (a, b) -> a + b)
        |          AS chi2_raw
        |      FROM co GROUP BY 1, 2, 3)
        |SELECT n, (r - 1) * (c - 1) AS dof, round(chi2_raw, 6) AS chi2,
        |  round(sqrt(chi2_raw / (n * least(r - 1, c - 1))), 6) AS cramers_v
        |FROM s""".stripMargin))

  // AUC (Mann–Whitney) of a score against a binary label, computed
  // ENTIRELY from the score's value histogram — the model-eval shape at
  // corpus scale. auc = [#(pos>neg pairs) + ½·#(ties)] / (n⁺·n⁻); with
  // an integer-valued score the pair counts come from the domain-bounded
  // histogram (per-value positive/negative counts + a broadcast
  // histogram self-join for the strictly-below negative mass), so there
  // is no per-row rank, no global sort, no window anywhere — and the
  // arithmetic is EXACT integers (doubled to keep the ½-tie term
  // integral) until one final division. Label: lang='en'; score:
  // n_chars.
  private val aucRank = NamedQuery(
    "q_auc_rank",
    (spark, d) => {
      val docs = Tables.documents(spark, d)
      val hist = docs
        .groupBy(col("n_chars").as("v"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("p"),
          sum(when(col("lang") === "en", 0L).otherwise(1L)).as("q"))
      val below = hist.select(col("v").as("v2"), col("q").as("q2"))
      val joined = hist.as("h")
        .join(broadcast(below), col("v2") < col("v"), "left")
        .groupBy(col("v"), col("p"), col("q"))
        .agg(coalesce(sum(col("q2")), lit(0L)).as("q_below"))
      // rule 10 headroom: num2 ≈ 2·n⁺·n⁻ overflows LONG once each class
      // passes ~2.1e9 rows (and the per-row p·q_below product even
      // earlier) — Spark would wrap silently while DuckDB's HUGEINT
      // promotion stays exact. DECIMAL(38,0) per-term and in the
      // partials keeps the integer arithmetic exact at any scale; the
      // divisor runs in double (each factor < 2^53 exact).
      joined
        .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
          sum(col("p").cast("decimal(38,0)") * col("q_below") * 2
            + col("p").cast("decimal(38,0)") * col("q")).as("num2"))
        .select(col("n_pos"), col("n_neg"),
          (col("num2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg") * 2)).as("auc"))
    },
    Some("""WITH hist AS (SELECT n_chars AS v,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
        |         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS q
        |       FROM documents GROUP BY 1),
        |j AS (SELECT h.v, h.p, h.q,
        |        coalesce(sum(b.q), 0) AS q_below
        |      FROM hist h LEFT JOIN hist b ON b.v < h.v
        |      GROUP BY 1, 2, 3)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(q) AS BIGINT) AS n_neg,
        |  CAST(sum(CAST(p AS HUGEINT) * q_below * 2
        |           + CAST(p AS HUGEINT) * q) AS DOUBLE)
        |    / (CAST(sum(p) AS DOUBLE) * sum(q) * 2) AS auc
        |FROM j""".stripMargin))

  // ---- Smoothed target-mean encoding (feature engineering for ML
  // training tables — the "mean encoding with a Bayesian prior" of
  // Micci-Barreca, SIGKDD Expl. 2001): encode each (segment, nation)
  // categorical cell by its average order price shrunk toward the
  // global mean with an additive pseudo-count (m=10) — sparse cells
  // collapse to the prior, populous cells approach their raw mean.
  // All sums run in exact integer cents, so the only doubles are two
  // final divisions with identical op order on both engines (no FP
  // accumulation drift). Scale shape: one partial-aggregated shuffle
  // on the cell key, one broadcast one-row global aggregate; the fact
  // table is never sorted or windowed.
  private val targetEncoding = NamedQuery(
    "q_target_encoding",
    (spark, d) => {
      val cust = Tables.customer(spark, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val cells = Tables.orders(spark, d)
        .select(col("o_custkey"),
          graft.ops.Money.quantizeCents(col("o_totalprice")).as("cents"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("cs"))
        .localCheckpoint() // prior + per-cell output both read the cells
      // the global prior derives EXACTLY from the 125-row cell relation
      // (integer sums re-aggregate losslessly) — no second fact scan
      val g = cells.agg(sum(col("cs")).cast("double").as("gs"),
        sum(col("n_orders")).as("gn"))
      cells
        .crossJoin(broadcast(g))
        .select(col("c_mktsegment").as("segment"),
          col("c_nationkey").cast("bigint").as("nation"),
          col("n_orders").cast("bigint").as("n_orders"),
          // RAW emit (rule 12): the mean of integer cents is a rational
          // that lands exactly on 4dp half-boundaries for friendly cell
          // sizes (every odd cents sum at n=40), and the engines' round()
          // tie-breaks diverge there; identical integers through the
          // identical division chain are bit-identical doubles
          (col("cs").cast("double") / col("n_orders") / 100.0).as("raw_avg"),
          round((col("cs") + lit(10.0) * col("gs") / col("gn")) /
            (col("n_orders") + 10) / 100.0, 4).as("encoded"))
        .orderBy("segment", "nation")
    },
    Some("""WITH j AS (SELECT c_mktsegment AS segment,
        |    c_nationkey AS nation,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT CAST(sum(cents) AS DOUBLE) AS gs, count(*) AS gn FROM j)
        |SELECT segment, CAST(nation AS BIGINT) AS nation,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS raw_avg,
        |  round((sum(cents) + 10.0 * g.gs / g.gn) / (count(*) + 10) / 100.0, 4)
        |    AS encoded
        |FROM j CROSS JOIN g
        |GROUP BY segment, nation, g.gs, g.gn
        |ORDER BY segment, nation""".stripMargin))

  // ---- Benford first-digit audit: the distribution of the leading
  // digit of every order's price vs Benford's law log10(1 + 1/d) — the
  // classic synthetic-data / fraud smell test (a generated table rarely
  // obeys it; the gap per digit is the evidence an auditor reads).
  // Digit extraction goes through exact integer cents and STRING
  // truncation, not floating log10(price) — floor(log10(x)) at power-of-
  // ten boundaries is the one place the engines' libm could disagree,
  // while BIGINT→VARCHAR is identical everywhere. One narrow map + a
  // 9-row aggregate + a 9-row window: nothing here scales with the
  // table beyond the scan.
  private val benford = NamedQuery(
    "q_benford_digits",
    (spark, d) => {
      // percent-of-total via re-aggregation + one-row broadcast (the
      // q_ratio_to_report / q15 idiom — exchange reuse makes the total
      // free), NOT a window over (): an unpartitioned WindowExec is the
      // plan shape the sweep bans even over a 9-row relation
      val digits = Tables.orders(spark, d)
        .select(substring(graft.ops.Money.quantizeCents(col("o_totalprice"))
          .cast("string"), 1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      val total = digits.agg(sum(col("n_orders")).as("tot"))
      digits.crossJoin(broadcast(total))
        .withColumn("obs_pct", round(col("n_orders") / col("tot"), 6))
        .withColumn("exp_pct",
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
        .select(col("digit"), col("n_orders"), col("obs_pct"), col("exp_pct"))
        .orderBy("digit")
    },
    Some(s"""WITH digits AS (
        |  SELECT substr(CAST(${graft.ops.Money.quantizeCentsSql("o_totalprice")}
        |      AS VARCHAR), 1, 1) AS digit,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT digit, n_orders,
        |  round(n_orders / sum(n_orders) OVER (), 6) AS obs_pct,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_pct
        |FROM digits ORDER BY digit""".stripMargin))

  val all: Seq[NamedQuery] = Seq(percentiles, deciles, moments, madOutliers,
    entropyMix, modeDisc, chisq, aucRank, targetEncoding, benford)
}
