package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical monitoring + training-data diagnostics beyond the earlier
  * stats family: trailing-window anomaly detection, marketing-style
  * last-touch attribution, BPE-merge pair counting, and a histogram-exact
  * two-sample Kolmogorov–Smirnov test. These are the "is my corpus / my
  * pipeline drifting?" tools a 100 TB curation run keeps on a dashboard
  * (complementing q_chisq_independence and q_auc_rank).
  *
  * Scale notes:
  *   - anomaly z-score windows are PARTITIONED by event_type (the window
  *     never sees more than one type's day series);
  *   - attribution's carry-forward is partitioned by user_id — each task
  *     sorts one user's history, never the corpus;
  *   - BPE pair generation is row-local (slice+zip, no self-join) and the
  *     top-50 is a TakeOrderedAndProject (per-partition heap + merge, no
  *     global sort);
  *   - the KS CDF uses the windowless broadcast-histogram shape shared
  *     with ops.Ranking: the cumulative sums run over the value-DOMAIN-
  *     bounded histogram, never the raw rows, so there is no
  *     unpartitioned WindowExec anywhere in the family.
  */
object MlStatsQueries extends QueryRegistry {

  // Trailing-window z-score anomaly flags on the daily revenue series per
  // event type: a day is anomalous when it sits >2 sample-stddevs from
  // the mean of the preceding ≤7 days (min 3 for a usable stddev). The
  // daily sums are rounded BEFORE the window so both engines feed the
  // trailing aggregates identical doubles in identical frame order;
  // sigma=0 frames emit NULL z rather than a division blow-up.
  private val anomaly = NamedQuery(
    "q_anomaly_zscore",
    (spark, d) => {
      val daily = Tables.events(spark, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day_d"))
        .agg(round(sum("value"), 4).as("revenue"))
      val w = Window.partitionBy("event_type").orderBy("day_d")
        .rowsBetween(-7, -1)
      daily
        .withColumn("mu", avg("revenue").over(w))
        .withColumn("sigma", stddev("revenue").over(w)) // sample stddev
        .withColumn("trail_n", count(lit(1)).over(w))
        .filter(col("trail_n") >= 3)
        .withColumn("z",
          when(col("sigma") > 0,
            round((col("revenue") - col("mu")) / col("sigma"), 4)))
        .select(
          col("event_type"),
          date_format(col("day_d"), "yyyy-MM-dd").as("day"),
          col("revenue"),
          round(col("mu"), 4).as("mu"),
          round(col("sigma"), 4).as("sigma"),
          col("z"),
          when(col("sigma") > 0,
            when(abs((col("revenue") - col("mu")) / col("sigma")) > 2, 1L)
              .otherwise(0L)).as("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
        |  SELECT event_type, strftime(cast(ts AS DATE), '%Y-%m-%d') AS day,
        |         round(sum(value), 4) AS revenue
        |  FROM events GROUP BY 1, 2),
        |z AS (
        |  SELECT event_type, day, revenue,
        |    avg(revenue) OVER w AS mu, stddev_samp(revenue) OVER w AS sigma,
        |    count(*) OVER w AS trail_n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, revenue,
        |  round(mu, 4) AS mu,
        |  round(sigma, 4) AS sigma,
        |  CASE WHEN sigma > 0 THEN round((revenue - mu) / sigma, 4) END AS z,
        |  CASE WHEN sigma > 0 THEN
        |    (CASE WHEN abs((revenue - mu) / sigma) > 2 THEN 1 ELSE 0 END)
        |  END AS is_anomaly
        |FROM z WHERE trail_n >= 3 ORDER BY event_type, day""".stripMargin))

  // Last-touch attribution: each purchase credits the user's most recent
  // PRECEDING non-purchase event (IGNORE NULLS carry-forward over the
  // per-user history; first-session purchases with no prior touch fall
  // into 'none'). Revenue then rolls up by touch channel. Same
  // ignore-nulls navigation family as q_window_ignore_nulls, put to its
  // canonical product use.
  private val attribution = NamedQuery(
    "q_attribution_last_touch",
    (spark, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(spark, d)
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("purchases"),
          round(sum("value"), 2).as("revenue"))
        .orderBy("touch")
    },
    Some("""WITH t AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'none') AS touch, count(*) AS purchases,
        |       round(sum(value), 2) AS revenue
        |FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY touch""".stripMargin))

  // BPE merge-step pair counting: the inner loop of byte-pair-encoding
  // tokenizer training is "count every adjacent token pair, merge the
  // most frequent" (Sennrich et al., ACL 2016). One merge round over the
  // corpus: whitespace-tokenize, form adjacent pairs ROW-LOCALLY
  // (slice+arrays_zip — no positional self-join), partial-agg the counts
  // map-side, and take the top-50 pairs under a total (n DESC, a, b)
  // order. At 100 TB the pair generation stays embarrassingly parallel
  // and only (pair, count) partials shuffle.
  private val bpePairs = NamedQuery(
    "text_bpe_pairs",
    (spark, d) => {
      val toks = Tables.documents(spark, d)
        .select(expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')").as("ts"))
        .filter(size(col("ts")) >= 2)
      toks
        .select(
          slice(col("ts"), lit(1), size(col("ts")) - 1).as("sa"),
          slice(col("ts"), lit(2), size(col("ts")) - 1).as("sb"))
        .select(explode(arrays_zip(col("sa"), col("sb"))).as("p"))
        .groupBy(col("p.sa").as("a"), col("p.sb").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(50)
    },
    Some("""WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, len(ts)),
        |                i -> {'a': ts[i], 'b': ts[i+1]})) AS p
        |  FROM toks WHERE len(ts) >= 2)
        |SELECT p.a AS a, p.b AS b, count(*) AS n
        |FROM pairs GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 50""".stripMargin))

  // Histogram-exact two-sample Kolmogorov–Smirnov statistic between the
  // click and purchase value distributions: KS = max |F̂₁ − F̂₂| over the
  // observed-value buckets. Exact at integer-bucket resolution because
  // both ECDFs are step functions evaluated at every occupied bucket.
  // The cumulative sums use the windowless broadcast-histogram self-join
  // (ops.Ranking's shape): the join runs over the value-domain-bounded
  // histogram (~500 rows regardless of corpus size), so no unpartitioned
  // window and no corpus-wide sort — the same two-phase trick that makes
  // q_auc_rank and q_ntile_deciles scale.
  private val ksTest = NamedQuery(
    "q_ks_histogram",
    (spark, d) => {
      val h = Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(floor(col("value")).cast("long").as("b"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val h2 = h.select(col("b").as("b2"), col("c1").as("c1b"),
        col("c2").as("c2b"))
      val cum = h.join(broadcast(h2), col("b2") <= col("b"))
        .groupBy("b")
        .agg(sum("c1b").as("cum1"), sum("c2b").as("cum2"))
      val tot = h.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      cum.crossJoin(broadcast(tot))
        .agg(
          round(max(abs(
            col("cum1").cast("double") / col("n1") -
              col("cum2").cast("double") / col("n2"))), 6).as("ks"),
          max("n1").as("n1"), max("n2").as("n2"))
    },
    Some("""WITH h AS (
        |  SELECT cast(floor(value) AS BIGINT) AS b,
        |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |c AS (
        |  SELECT a.b, sum(b2.c1) AS cum1, sum(b2.c2) AS cum2
        |  FROM h a JOIN h b2 ON b2.b <= a.b GROUP BY a.b),
        |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h)
        |SELECT round(max(abs(cast(cum1 AS DOUBLE) / n1
        |                    - cast(cum2 AS DOUBLE) / n2)), 6) AS ks,
        |       cast(max(n1) AS BIGINT) AS n1, cast(max(n2) AS BIGINT) AS n2
        |FROM c, t""".stripMargin))

  override def all: Seq[NamedQuery] =
    Seq(anomaly, attribution, bpePairs, ksTest)
}
