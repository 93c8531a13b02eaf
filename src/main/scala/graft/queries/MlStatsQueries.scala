package graft.queries

import graft.Tables
import graft.ops.Money
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
  // daily sums run in exact cents (Money rule 11) so both engines feed
  // the trailing aggregates identical doubles in identical frame order;
  // sigma=0 frames emit NULL z rather than a division blow-up — but the
  // FLAG still fires when the day deviates from a constant trail.
  private val anomaly = NamedQuery(
    "q_anomaly_zscore",
    (spark, d) => {
      val daily = Tables.events(spark, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day_d"))
        .agg(Money.centsSum(col("value")).as("revenue"))
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
          // the flag derives from the SAME 4-dp z that is emitted, so a
          // row can never read z=2.0000 with is_anomaly=1 — output is
          // self-consistent at the rounding boundary by construction.
          // σ = 0 with a DEVIATING day is the most anomalous case of
          // all (infinite z): it flags 1 with z left NULL — both
          // engines previously NULLed the flag and the spike vanished
          // from any is_anomaly consumer (gate-blind, review r11).
          when(col("sigma") > 0,
            when(abs(col("z")) > 2, 1L).otherwise(0L))
            .when(col("sigma") === 0,
              when(col("revenue") =!= col("mu"), 1L).otherwise(0L))
            .as("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some(s"""WITH daily AS (
        |  SELECT event_type, strftime(cast(ts AS DATE), '%Y-%m-%d') AS day,
        |         ${Money.centsSumSql("value")} AS revenue
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
        |    (CASE WHEN abs(round((revenue - mu) / sigma, 4)) > 2 THEN 1 ELSE 0 END)
        |  WHEN sigma = 0 THEN
        |    (CASE WHEN revenue <> mu THEN 1 ELSE 0 END)
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
          Money.centsSum(col("value")).as("revenue"))
        .orderBy("touch")
    },
    Some(s"""WITH t AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'none') AS touch, count(*) AS purchases,
        |       ${Money.centsSumSql("value")} AS revenue
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
        // pushable twin of the size() filter below (a null text never
        // survives it): gives the scan an IsNotNull to skip row groups
        // with — the derived size(filter(split(...))) predicate alone is
        // opaque to the source (PlanSweepSpec check 4)
        .filter(col("text").isNotNull)
        .select(graft.ops.TextOps.lowerWords(col("text")).as("ts"))
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

  // Two-sample Kolmogorov–Smirnov statistic between the click and
  // purchase value distributions: KS = max |F̂₁ − F̂₂|. EXACT for the
  // 2-dp fixture values: buckets are CENTS (rule-11 rounding,
  // floor(v·100 + 0.5) — the former integer-bucket binning hid all
  // within-unit ECDF separation, so two disjoint distributions inside
  // one unit bucket scored ks = 0 in BOTH engines; gate-blind, review
  // r11). NULL values are excluded on both sides — they previously
  // inflated the denominators while never joining into any cumulative
  // sum, deflating both ECDFs identically. The cumulative sums use a
  // TWO-LEVEL blocked prefix: within-block histogram self-join
  // (≤ 1000-bucket blocks ⇒ bounded pairs) plus broadcast block-prefix
  // totals — domain-bounded at any corpus size, no unpartitioned
  // window, no corpus-wide sort, same family of tricks as q_auc_rank.
  private val ksTest = NamedQuery(
    "q_ks_histogram",
    (spark, d) => {
      val h = Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .groupBy(floor(col("value") * 100 + 0.5).cast("long").as("b"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
        // b ≥ 0 (values are non-negative money), so truncating div ==
        // floor div == DuckDB's // — the block keys agree
        .withColumn("blk", expr("b div 1000"))
        .localCheckpoint() // read by 3 consumers below
      val h2 = h.select(col("blk").as("blk2"), col("b").as("b2"),
        col("c1").as("c1b"), col("c2").as("c2b"))
      val within = h.join(h2,
          col("blk") === col("blk2") && col("b2") <= col("b"))
        .groupBy("blk", "b")
        .agg(sum("c1b").as("w1"), sum("c2b").as("w2"))
      val blockTot = h.groupBy("blk")
        .agg(sum("c1").as("s1"), sum("c2").as("s2"))
      val bt2 = blockTot.select(col("blk").as("blkb"),
        col("s1").as("s1b"), col("s2").as("s2b"))
      val prefix = blockTot.join(broadcast(bt2), col("blkb") < col("blk"), "left")
        .groupBy("blk")
        .agg(sum("s1b").as("p1"), sum("s2b").as("p2"))
      val cum = within.join(broadcast(prefix), "blk")
        .select(col("b"),
          (col("w1") + coalesce(col("p1"), lit(0L))).as("cum1"),
          (col("w2") + coalesce(col("p2"), lit(0L))).as("cum2"))
      val tot = h.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      cum.crossJoin(broadcast(tot))
        .agg(
          round(max(abs(
            col("cum1").cast("double") / col("n1") -
              col("cum2").cast("double") / col("n2"))), 6).as("ks"),
          max("n1").as("n1"), max("n2").as("n2"))
    },
    Some("""WITH h AS (
        |  SELECT cast(floor(value * 100 + 0.5) AS BIGINT) AS b,
        |         cast(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS blk,
        |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT a.blk, a.b, sum(b2.c1) AS w1, sum(b2.c2) AS w2
        |  FROM h a JOIN h b2 ON b2.blk = a.blk AND b2.b <= a.b
        |  GROUP BY 1, 2),
        |bt AS (SELECT blk, sum(c1) AS s1, sum(c2) AS s2 FROM h GROUP BY 1),
        |p AS (
        |  SELECT a.blk, sum(b2.s1) AS p1, sum(b2.s2) AS p2
        |  FROM bt a LEFT JOIN bt b2 ON b2.blk < a.blk GROUP BY 1),
        |c AS (
        |  SELECT w.b, w1 + coalesce(p1, 0) AS cum1, w2 + coalesce(p2, 0) AS cum2
        |  FROM w JOIN p USING (blk)),
        |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h)
        |SELECT round(max(abs(cast(cum1 AS DOUBLE) / n1
        |                    - cast(cum2 AS DOUBLE) / n2)), 6) AS ks,
        |       cast(max(n1) AS BIGINT) AS n1, cast(max(n2) AS BIGINT) AS n2
        |FROM c, t""".stripMargin))

  // Decile lift/gains table for the hashed linear classifier
  // (ops.TextOps.hashClassifierMargin — the SAME model
  // text_hash_classifier scores): rank docs by score DESC, cut into
  // deciles, and compare each decile's positive rate (docs ≥300 chars as
  // the stand-in ground truth) to the base rate. The global ranking goes
  // through ops.Ranking's two-phase histogram shape — no unpartitioned
  // ntile window ever sees the corpus; the bucket key is the score's
  // fixed-point truncation (monotone in -score).
  private val modelLift = NamedQuery(
    "q_model_lift",
    (spark, d) => {
      // pin the scored relation: groupedRank references its input from
      // four subtrees (histogram, offsets, totals, final join) and the
      // md5-fold margin is an expensive expression Catalyst would
      // re-inline into every one (same trap as TextOps.shingles' note —
      // measured 6.3 s vs 2.0 s at sf0.1). The pinned relation is three
      // narrow columns per doc.
      val scored = Tables.documents(spark, d)
        .select(col("doc_id"), col("n_chars"),
          classifierMargin(col("text")).as("margin"))
        .select(col("doc_id"),
          round(lit(1.0) / (lit(1.0) + exp(negate(col("margin")))), 6).as("score"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("pos"))
        .localCheckpoint()
      val ranked = graft.ops.Ranking.groupedRank(
        scored, Seq.empty, negate(col("score")),
        floor(negate(col("score")) * 1000).cast("long"), Seq("doc_id"))
        .withColumn("decile",
          graft.ops.Ranking.ntileFromRank(col("rank"), col("grp_n"), 10)
            .cast("long"))
      val tot = scored.agg(sum("pos").as("tp"), count(lit(1)).as("tn"))
      ranked.groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("pos").as("positives"))
        .crossJoin(broadcast(tot))
        // raw-emit ratios (rule 12): exact ints through one identical
        // division chain — a round() would desync boundary rationals
        .select(col("decile"), col("n"), col("positives"),
          (col("positives").cast("double") / col("n")).as("pos_rate"),
          ((col("positives").cast("double") / col("n")) /
            (col("tp").cast("double") / col("tn"))).as("lift"))
        .orderBy("decile")
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wt AS (SELECT doc_id,
        |    ((('0x' || substr(md5(CAST(
        |        ('0x' || substr(md5(w), 1, 15))::BIGINT % 1024
        |      AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000) / 1000.0 AS wv
        |  FROM tok),
        |m AS (SELECT doc_id, avg(wv) AS margin FROM wt GROUP BY doc_id),
        |s AS (SELECT m.doc_id, round(1.0 / (1.0 + exp(-margin)), 6) AS score,
        |        CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS pos
        |      FROM m JOIN documents d USING (doc_id)),
        |r AS (SELECT pos,
        |        ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile FROM s),
        |t AS (SELECT sum(pos) AS tp, count(*) AS tn FROM s)
        |SELECT cast(decile AS BIGINT) AS decile, cast(count(*) AS BIGINT) AS n,
        |  cast(sum(pos) AS BIGINT) AS positives,
        |  cast(sum(pos) AS DOUBLE) / count(*) AS pos_rate,
        |  (cast(sum(pos) AS DOUBLE) / count(*))
        |    / (cast(max(tp) AS DOUBLE) / max(tn)) AS lift
        |FROM r, t GROUP BY decile ORDER BY decile""".stripMargin))

  // Covariance matrix of the first 8 embedding dimensions — the input
  // relation of a PCA / whitening step, computed relationally: pairs are
  // generated ROW-LOCALLY (double posexplode of the sliced vector, 64
  // rows per vec — no self-join on vec_id), E[x·y] partial-aggregates
  // map-side, and the 8-row mean relation broadcasts back twice. At
  // 100 TB the only shuffle is the 64-group aggregate's partials; a d×d
  // gram at larger d is the same shape with d² bounded by the DIMENSION,
  // not the corpus.
  private val covMatrix = NamedQuery(
    "q_cov_matrix",
    (spark, d) => covRelation(spark, d)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        round(col("cov"), 5).as("cov"), col("n"))
      .orderBy("i", "j"),
    Some("""WITH p AS (
        |  SELECT r1.i AS i, r2.i AS j,
        |         cast(embedding[r1.i] AS DOUBLE) AS x,
        |         cast(embedding[r2.i] AS DOUBLE) AS y
        |  FROM embeddings, range(1, 9) r1(i), range(1, 9) r2(i)),
        |mu AS (
        |  SELECT r.i AS i, avg(cast(embedding[r.i] AS DOUBLE)) AS m
        |  FROM embeddings, range(1, 9) r(i) GROUP BY 1),
        |g AS (SELECT p.i, p.j, avg((x - mi.m) * (y - mj.m)) AS cov,
        |             count(*) AS n
        |      FROM p JOIN mu mi ON mi.i = p.i JOIN mu mj ON mj.i = p.j
        |      GROUP BY p.i, p.j)
        |SELECT i, j, round(cov, 5) AS cov, cast(n AS BIGINT) AS n
        |FROM g ORDER BY i, j""".stripMargin))

  // Per-week Pearson correlation between the daily click and purchase
  // revenue series — "are my engagement and conversion metrics moving
  // together this week?". The correlation is assembled EXPLICITLY from
  // the five power sums (n·Σxy − ΣxΣy over the √ of the variance
  // products) on pre-rounded daily values: one definition, identical
  // arithmetic both engines — immune to corr() implementation drift.
  // Degenerate weeks (zero variance in either series) emit NULL.
  private val weeklyCorr = NamedQuery(
    "q_weekly_corr",
    (spark, d) => {
      // determinism rule 11: the daily money sums are EXACT integer
      // cents (order-independent), not round(sum(double), 4). Pearson r
      // is invariant under the positive scaling dollars→cents, so the
      // output is the same relation — but every moment below is now a
      // sum/product of exact integers, and the double arithmetic starts
      // only at the final r formula from bit-identical inputs in both
      // engines.
      val daily = Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          graft.ops.Money.centsSumRaw(
            when(col("event_type") === "click", col("value")).otherwise(0.0)).as("x"),
          graft.ops.Money.centsSumRaw(
            when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("y"))
      // Pearson r via power sums kept in EXACT integer arithmetic
      // (decimal(38,0) — the daily x/y are exact cents) all the way
      // through the n·Sxx − Sx² subtraction, with ONE double conversion
      // for the final division/sqrt. The former all-double pipeline was
      // the textbook catastrophic-cancellation form: at large
      // near-constant daily revenues Sx² exceeds 2⁵³ and the subtraction
      // can flip the positivity guard or corrupt r past the 4-dp
      // rounding — identically in both engines (gate-blind, review
      // r11; the oracle mirrors with HUGEINT). Variances are ≥ 0 by
      // Cauchy–Schwarz, exactly, so the guard tests each factor.
      val wk = daily
        .groupBy(date_format(date_trunc("week", col("day")), "yyyy-MM-dd").as("week"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      val nD = col("cnt").cast("decimal(38,0)")
      val vx = nD * col("sxx") - col("sx") * col("sx")
      val vy = nD * col("syy") - col("sy") * col("sy")
      val num = nD * col("sxy") - col("sx") * col("sy")
      wk.select(col("week"), col("cnt").as("n"),
          when(vx > 0 && vy > 0,
            round(num.cast("double") /
              sqrt(vx.cast("double") * vy.cast("double")), 4)).as("r"))
        .orderBy("week")
    },
    Some(s"""WITH daily AS (
        |  SELECT cast(ts AS DATE) AS day,
        |    ${graft.ops.Money.centsSumRawSql(
               "CASE WHEN event_type = 'click' THEN value ELSE 0 END")} AS x,
        |    ${graft.ops.Money.centsSumRawSql(
               "CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS y
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |wk AS (
        |  SELECT strftime(date_trunc('week', day), '%Y-%m-%d') AS week,
        |         count(*) AS n,
        |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM daily GROUP BY 1),
        |v AS (
        |  SELECT week, n,
        |         n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |         n * sxy - sx * sy AS num
        |  FROM wk)
        |SELECT week, cast(n AS BIGINT) AS n,
        |  CASE WHEN vx > 0 AND vy > 0 THEN
        |    round(CAST(num AS DOUBLE) /
        |          sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 4)
        |  END AS r
        |FROM v ORDER BY week""".stripMargin))

  // First-order Markov transition matrix over each user's event-type
  // sequence: P(next | prev) with exact counts. The lead() runs in a
  // user-partitioned window (each task sorts one user's history), the
  // (prev, next) counts partial-aggregate map-side, and the per-prev
  // normalizing totals re-aggregate from the 25-row count relation —
  // the behavioral-model / session-simulation input at any scale.
  private val markov = NamedQuery(
    "q_markov_transitions",
    (spark, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val c = Tables.events(spark, d)
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("prev"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy("prev").agg(sum("n").as("tot"))
      c.join(broadcast(t), Seq("prev"))
        .select(col("prev"), col("nxt"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy("prev", "nxt")
    },
    Some("""WITH nx AS (
        |  SELECT event_type AS prev,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT prev, nxt, count(*) AS n
        |      FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.nxt, cast(c.n AS BIGINT) AS n,
        |  round(c.n * 1.0 / t.tot, 4) AS p
        |FROM c JOIN t USING (prev) ORDER BY prev, nxt""".stripMargin))

  // Join-key skew report — the diagnostic that DECIDES the engine's own
  // skew mitigations (q_salted_join's salt factor, AQE skew thresholds):
  // per-key cardinalities of the orders→customer join key, their
  // max/mean/p50/p99, the max/mean skew ratio, the ceil(ratio) salt
  // factor a salted repartition would use, and the heaviest key. One
  // count aggregate over the fact table, then a single-row rollup of the
  // key-cardinality relation (percentile is a merged typed-aggregate —
  // no sort of the key relation; the heaviest key is a lexicographic
  // struct-min, no window).
  private val keySkew = NamedQuery(
    "q_key_skew_report",
    (spark, d) => {
      val c = Tables.orders(spark, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n"))
      c.agg(
          count(lit(1)).as("n_keys"),
          sum("n").as("total"),
          max("n").as("max_n"),
          // raw-emit rational mean/ratio (rule 12): exact integer sums
          // through one identical division chain in both engines
          (sum("n").cast("double") / count(lit(1))).as("mean_n"),
          round(expr("percentile(n, 0.50)"), 4).as("p50"),
          round(expr("percentile(n, 0.99)"), 4).as("p99"),
          min(struct(negate(col("n")).as("nn"), col("k"))).getField("k")
            .as("top_key"))
        .select(col("n_keys"), col("total"), col("max_n"),
          col("mean_n"), col("p50"), col("p99"),
          (col("max_n") / col("mean_n")).as("skew_ratio"),
          ceil(col("max_n") / col("mean_n")).cast("long").as("salt_factor"),
          col("top_key"))
    },
    Some("""WITH c AS (SELECT o_custkey AS k, count(*) AS n
        |           FROM orders GROUP BY 1),
        |s AS (SELECT count(*) AS n_keys, sum(n) AS total, max(n) AS max_n,
        |        cast(sum(n) AS DOUBLE) / count(*) AS mean_n,
        |        round(quantile_cont(n, 0.50), 4) AS p50,
        |        round(quantile_cont(n, 0.99), 4) AS p99
        |      FROM c),
        |top AS (SELECT k AS top_key FROM (
        |          SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS rn
        |          FROM c) t
        |        WHERE rn = 1)
        |SELECT cast(n_keys AS BIGINT) AS n_keys, cast(total AS BIGINT) AS total,
        |  cast(max_n AS BIGINT) AS max_n, mean_n, p50, p99,
        |  max_n / mean_n AS skew_ratio,
        |  cast(ceil(max_n / mean_n) AS BIGINT) AS salt_factor,
        |  (SELECT top_key FROM top) AS top_key
        |FROM s""".stripMargin))

  // Distributed PCA, top component: the covariance matrix is computed
  // RELATIONALLY (same row-local pair expansion as q_cov_matrix), then
  // the d×d result — 64 doubles, bounded by the DIMENSION, never the
  // corpus — is collected and power-iterated on the driver (20 rounds,
  // each renormalized and rounded to 10 dp so both engines walk the
  // identical double lattice). This is the canonical distributed-PCA
  // split: the corpus-sized work (gram/cov accumulation) distributes as
  // map-side partials; the eigensolve is O(d²) driver arithmetic. The
  // oracle replays the SAME iteration as a recursive CTE. Sign is
  // oriented by the first loading; the eigenvalue is the Rayleigh
  // quotient vᵀCv of the converged vector.
  // round half-away-from-zero, matching DuckDB round() and Spark's
  // round() — Math.round would diverge on negative halves
  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Relational covariance of the first 8 embedding dims: row-local
    * double-posexplode pair expansion (64 rows per vec, no self-join),
    * map-side E[x·y] partials, 8-row mean relation broadcast back twice.
    * Returns (i, j, cov, n) with 1-based int dims and the UNROUNDED
    * covariance — each caller applies the rounding its oracle states.
    * Shared by q_cov_matrix and covAndTop (q_pca_power / q_pca_project). */
  private def covRelation(spark: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val v8 = Tables.embeddings(spark, d)
      // pushable twin of the explode-inferred size()/null guard (a null
      // embedding never reaches the posexplode): without it the scan
      // pushes nothing (PlanSweepSpec check 4)
      .filter(col("embedding").isNotNull)
      .select(expr("transform(slice(embedding, 1, 8), x -> cast(x as double))").as("v"))
    val mu = v8.select(posexplode(col("v")).as(Seq("i0", "x")))
      .groupBy((col("i0") + 1).as("i")).agg(avg("x").as("m"))
    val mj = mu.select(col("i").as("j"), col("m").as("mj"))
    // CENTERED accumulation E[(x−mᵢ)(y−mⱼ)] — the uncentered
    // E[xy] − E[x]E[y] form is the textbook cancellation hazard: with a
    // large common mean (un-normalized activations ~100±0.01) the
    // subtraction destroys most significant digits, identically in both
    // engines, and the rounded result feeds the PCA eigensolve
    // (gate-blind, review r11). The tiny mean relation broadcasts into
    // the row-local pair expansion BEFORE aggregation — same shuffle
    // shape (one 64-group aggregate), one extra map-side subtract.
    val g = v8.select(col("v"), posexplode(col("v")).as(Seq("i0", "x")))
      .select(col("i0"), col("x"), posexplode(col("v")).as(Seq("j0", "y")))
      .join(broadcast(mu), (col("i0") + 1) === col("i"))
      .join(broadcast(mj), (col("j0") + 1) === col("j"))
      .groupBy(col("i"), col("j"))
      .agg(avg((col("x") - col("m")) * (col("y") - col("mj"))).as("cov"),
        count(lit(1)).as("n"))
    g.select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
      col("cov"), col("n"))
  }

  /** The covariance matrix (8-dp rounded, dimension-bounded collect) and
    * its sign-oriented top eigenvector from 20 power iterations on the
    * 10-dp-rounded double lattice — shared by q_pca_power and
    * q_pca_project; the oracle replays the identical walk as a
    * recursive CTE. */
  private def covAndTop(spark: org.apache.spark.sql.SparkSession, d: String)
      : (Map[(Int, Int), Double], Array[Double]) = {
    val c = covRelation(spark, d)
      .select(col("i"), col("j"), round(col("cov"), 8).as("c"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val dim = 8
    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 20) {
      val raw = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c((i + 1, j + 1)) * v(j)).sum)
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      v = raw.map(x => rnd(x / nrm, 10))
    }
    val sgn = if (v(0) >= 0) 1.0 else -1.0
    (c, v.map(x => sgn * x))
  }

  private val pcaPower = NamedQuery(
    "q_pca_power",
    (spark, d) => {
      import spark.implicits._
      val (c, v) = covAndTop(spark, d)
      val dim = v.length
      val lam = (for (i <- 0 until dim; j <- 0 until dim)
        yield v(i) * c((i + 1, j + 1)) * v(j)).sum
      (0 until dim).map(i => (i + 1L, rnd(v(i), 6), rnd(lam, 6)))
        .toDF("dim", "loading", "eigenvalue")
        .orderBy("dim")
    },
    Some("""WITH RECURSIVE
        |p AS (
        |  SELECT r1.i AS i, r2.i AS j,
        |         cast(embedding[r1.i] AS DOUBLE) AS x,
        |         cast(embedding[r2.i] AS DOUBLE) AS y
        |  FROM embeddings, range(1, 9) r1(i), range(1, 9) r2(i)),
        |mu AS (
        |  SELECT r.i AS i, avg(cast(embedding[r.i] AS DOUBLE)) AS m
        |  FROM embeddings, range(1, 9) r(i) GROUP BY 1),
        |cov AS (
        |  SELECT p.i, p.j, round(avg((x - mi.m) * (y - mj.m)), 8) AS c
        |  FROM p JOIN mu mi ON mi.i = p.i JOIN mu mj ON mj.i = p.j
        |  GROUP BY p.i, p.j),
        |it AS (
        |  SELECT 0 AS t, i,
        |    CASE WHEN i = 1 THEN cast(1.0 AS DOUBLE)
        |         ELSE cast(0.0 AS DOUBLE) END AS v
        |  FROM range(1, 9) r(i)
        |  UNION ALL
        |  SELECT t + 1, i, round(raw / nrm, 10) AS v FROM (
        |    SELECT t, i, raw, sqrt(sum(raw * raw) OVER ()) AS nrm FROM (
        |      SELECT it.t AS t, cov.i AS i, sum(cov.c * it.v) AS raw
        |      FROM it JOIN cov ON cov.j = it.i
        |      WHERE it.t < 20
        |      GROUP BY it.t, cov.i) a) b),
        |top AS (SELECT i, v FROM it WHERE t = 20),
        |ray AS (
        |  SELECT sum(t1.v * cov.c * t2.v) AS lam
        |  FROM top t1 JOIN cov ON cov.i = t1.i JOIN top t2 ON t2.i = cov.j)
        |SELECT cast(top.i AS BIGINT) AS dim,
        |  round(CASE WHEN s.v1 >= 0 THEN top.v ELSE -top.v END, 6) AS loading,
        |  round((SELECT lam FROM ray), 6) AS eigenvalue
        |FROM top CROSS JOIN (SELECT v AS v1 FROM top WHERE i = 1) s
        |ORDER BY dim""".stripMargin))

  // The 100 TB half of PCA: project every embedding onto the broadcast
  // top component (a pure row-local dot product — the eigenvector rides
  // into the executors as 8 literals; zero joins, zero shuffles until
  // the per-label rollup) and profile the projection per label. This is
  // the whitening/feature-extraction step a curation pipeline runs after
  // q_pca_power, at corpus scale. The oracle recomputes the identical
  // eigenvector in its recursive CTE and projects via a cross join with
  // the 8-row vector relation.
  private val pcaProject = NamedQuery(
    "q_pca_project",
    (spark, d) => {
      val (_, v) = covAndTop(spark, d)
      val vLit = v.map(x => s"cast($x as double)").mkString("array(", ", ", ")")
      Tables.embeddings(spark, d)
        .select(col("label"), round(expr(
          s"""aggregate(zip_with(transform(slice(embedding, 1, 8),
             |            x -> cast(x as double)), $vLit, (a, b) -> a * b),
             |  cast(0 as double), (s, t) -> s + t)""".stripMargin), 8).as("proj"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("proj"), 5).as("mean_proj"),
          round(stddev("proj"), 5).as("sd_proj"),
          round(min("proj"), 5).as("min_proj"),
          round(max("proj"), 5).as("max_proj"))
        .orderBy("label")
    },
    Some("""WITH RECURSIVE
        |p AS (
        |  SELECT r1.i AS i, r2.i AS j,
        |         cast(embedding[r1.i] AS DOUBLE) AS x,
        |         cast(embedding[r2.i] AS DOUBLE) AS y
        |  FROM embeddings, range(1, 9) r1(i), range(1, 9) r2(i)),
        |mu AS (
        |  SELECT r.i AS i, avg(cast(embedding[r.i] AS DOUBLE)) AS m
        |  FROM embeddings, range(1, 9) r(i) GROUP BY 1),
        |cov AS (
        |  SELECT p.i, p.j, round(avg((x - mi.m) * (y - mj.m)), 8) AS c
        |  FROM p JOIN mu mi ON mi.i = p.i JOIN mu mj ON mj.i = p.j
        |  GROUP BY p.i, p.j),
        |it AS (
        |  SELECT 0 AS t, i,
        |    CASE WHEN i = 1 THEN cast(1.0 AS DOUBLE)
        |         ELSE cast(0.0 AS DOUBLE) END AS v
        |  FROM range(1, 9) r(i)
        |  UNION ALL
        |  SELECT t + 1, i, round(raw / nrm, 10) AS v FROM (
        |    SELECT t, i, raw, sqrt(sum(raw * raw) OVER ()) AS nrm FROM (
        |      SELECT it.t AS t, cov.i AS i, sum(cov.c * it.v) AS raw
        |      FROM it JOIN cov ON cov.j = it.i
        |      WHERE it.t < 20
        |      GROUP BY it.t, cov.i) a) b),
        |top AS (
        |  SELECT i, CASE WHEN s.v1 >= 0 THEN it0.v ELSE -it0.v END AS v
        |  FROM (SELECT i, v FROM it WHERE t = 20) it0
        |  CROSS JOIN (SELECT v AS v1 FROM it WHERE t = 20 AND i = 1) s),
        |proj AS (
        |  SELECT e.vec_id, e.label,
        |    round(sum(cast(e.embedding[top.i] AS DOUBLE) * top.v), 8) AS proj
        |  FROM embeddings e CROSS JOIN top
        |  GROUP BY e.vec_id, e.label)
        |SELECT label, cast(count(*) AS BIGINT) AS n,
        |  round(avg(proj), 5) AS mean_proj,
        |  round(stddev_samp(proj), 5) AS sd_proj,
        |  round(min(proj), 5) AS min_proj, round(max(proj), 5) AS max_proj
        |FROM proj GROUP BY label ORDER BY label""".stripMargin))

  // Count–Min sketch (Cormode & Muthukrishnan '05) with md5-derived
  // hashes (engine-portable, COVERAGE.md determinism rules): depth 3 ×
  // width 1024 counters built in ONE pass over the fact table (the
  // 3×-row explode partial-aggregates map-side into ≤ 3·1024 counters —
  // sketch size is independent of the corpus), then 10 keys probed
  // (estimate = min over rows of the key's counter). The CM guarantee —
  // estimate ≥ exact, overshoot bounded by collisions — is pinned by
  // both the oracle and the spec. At 100 TB the sketch is what you
  // build when even the per-key count relation is too big to keep.
  private val countMin = NamedQuery(
    "q_countmin_probe",
    (spark, d) => {
      val depth = 3
      val width = 1024
      def bucket(dc: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        graft.ops.TextOps.md5Long(
          concat(dc.cast("string"), lit("#"), k.cast("string"))) % width
      val cnt = Tables.orders(spark, d)
        .select(col("o_custkey"),
          explode(array((0 until depth).map(lit): _*)).as("d"))
        .groupBy(col("d"), bucket(col("d"), col("o_custkey")).as("b"))
        .agg(count(lit(1)).as("n"))
      val probes = spark.range(1, 11).select(col("id").as("k"))
        .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("d"))
        .select(col("k"), col("d"), bucket(col("d"), col("k")).as("b"))
      val est = probes.join(broadcast(cnt), Seq("d", "b"), "left")
        .groupBy("k")
        .agg(min(coalesce(col("n"), lit(0L))).as("cm_est"))
      val exact = Tables.orders(spark, d)
        .filter(col("o_custkey").between(1, 10))
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("exact_n"))
      est.join(exact, Seq("k"), "left")
        .select(col("k").as("custkey"),
          coalesce(col("exact_n"), lit(0L)).as("exact_n"), col("cm_est"))
        .orderBy("custkey")
    },
    Some("""WITH cnt AS (
        |  SELECT r.d AS d,
        |    ('0x' || substr(md5(r.d || '#' || o_custkey), 1, 15))::BIGINT % 1024 AS b,
        |    count(*) AS n
        |  FROM orders CROSS JOIN range(0, 3) r(d)
        |  GROUP BY 1, 2),
        |probes AS (SELECT p.k AS k FROM range(1, 11) p(k)),
        |pb AS (
        |  SELECT probes.k, r.d,
        |    ('0x' || substr(md5(r.d || '#' || probes.k), 1, 15))::BIGINT % 1024 AS b
        |  FROM probes CROSS JOIN range(0, 3) r(d)),
        |est AS (
        |  SELECT pb.k, min(coalesce(cnt.n, 0)) AS cm_est
        |  FROM pb LEFT JOIN cnt ON cnt.d = pb.d AND cnt.b = pb.b
        |  GROUP BY pb.k),
        |ex AS (
        |  SELECT o_custkey AS k, count(*) AS exact_n FROM orders
        |  WHERE o_custkey BETWEEN 1 AND 10 GROUP BY 1)
        |SELECT est.k AS custkey, cast(coalesce(ex.exact_n, 0) AS BIGINT) AS exact_n,
        |  cast(est.cm_est AS BIGINT) AS cm_est
        |FROM est LEFT JOIN ex ON ex.k = est.k
        |ORDER BY custkey""".stripMargin))

  // Gini coefficient of customer revenue concentration — the inequality
  // metric behind "what share of the corpus do the top sources own?".
  // G = 2·Σ(rankᵢ·xᵢ)/(n·Σx) − (n+1)/n over ascending-rank revenues.
  // Revenue is summed in EXACT integer cents (no FP accumulation — the
  // q_target_encoding determinism rule) and the global rank goes through
  // ops.Ranking's windowless two-phase histogram shape, so nothing sorts
  // the corpus and every sum is order-independent until the one final
  // division.
  private val gini = NamedQuery(
    "q_gini_revenue",
    (spark, d) => {
      val rev = Tables.orders(spark, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("xc"))
      graft.ops.Ranking.groupedRank(rev, Seq.empty, col("xc"),
          floor(col("xc") / 100000).cast("long"), Seq("k"))
        .agg(count(lit(1)).as("n"),
          // DECIMAL(38) partials: Σxc and Σ(rank·xc) both exceed int64
          // well below 100 TB scale (Σ(rank·xc) ≈ (n/2)·Σx); DECIMAL(38)
          // matches the headroom of the oracle's HUGEINT sums, and the
          // final division converts exact integers to double identically
          // in both engines
          sum(col("xc").cast("decimal(38,0)")).as("sx"),
          sum(col("rank").cast("decimal(19,0)") *
            col("xc").cast("decimal(19,0)")).as("srx"))
        .select(col("n"),
          round(col("sx").cast("double") / 100.0, 2).as("total_revenue"),
          round(lit(2.0) * col("srx").cast("double") /
            (col("n") * col("sx").cast("double")) -
            (col("n") + 1.0) / col("n"), 6).as("gini"))
    },
    Some("""WITH rev AS (
        |  SELECT o_custkey AS k,
        |         sum(cast(round(o_totalprice * 100, 0) AS BIGINT)) AS xc
        |  FROM orders GROUP BY 1),
        |r AS (SELECT xc, row_number() OVER (ORDER BY xc, k) AS rn FROM rev),
        |s AS (SELECT count(*) AS n, sum(xc) AS sx, sum(rn * xc) AS srx FROM r)
        |SELECT cast(n AS BIGINT) AS n, round(sx / 100.0, 2) AS total_revenue,
        |  round(2.0 * srx / (n * sx) - (n + 1.0) / n, 6) AS gini
        |FROM s""".stripMargin))

  // Conversion latency: per user, the delay from FIRST click to the
  // first purchase strictly after it, profiled as p50/p90/mean.
  // Two keyed aggregates + one broadcast-scale join on user_id — the
  // product-analytics companion to q_funnel_conversion (which counts
  // stage reach; this measures its speed). Deltas are EXACT INTEGER
  // MICROSECONDS (unix_micros / epoch_us — no floating point anywhere
  // before the percentile): an even-count median of 3-dp-rounded
  // second deltas sat exactly on a round-half boundary where the two
  // engines' interpolation formulas differ by an ulp (observed at
  // sf0.1); integer inputs make the p50 midpoint exactly k.0/k.5 in
  // both engines and the 1-dp output a no-op round.
  private val timeToConvert = NamedQuery(
    "q_time_to_convert",
    (spark, d) => {
      val ev = Tables.events(spark, d)
      val fc = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("c"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fc, Seq("user_id"))
        .filter(col("ts") > col("c"))
        .groupBy("user_id").agg(min(col("ts")).as("p"))
      fp.join(fc, Seq("user_id"))
        .select((unix_micros(col("p")) - unix_micros(col("c"))).as("delta_us"))
        .agg(count(lit(1)).as("converted"),
          round(expr("percentile(delta_us, 0.50)"), 1).as("p50_us"),
          round(expr("percentile(delta_us, 0.90)"), 1).as("p90_us"),
          // raw-emit (rule 12): exact integer µs sum / count, one chain
          (sum("delta_us").cast("double") / count(lit(1))).as("mean_us"))
    },
    Some("""WITH fc AS (SELECT user_id, min(ts) AS c FROM events
        |            WHERE event_type = 'click' GROUP BY 1),
        |fp AS (SELECT e.user_id, min(e.ts) AS p
        |       FROM events e JOIN fc ON fc.user_id = e.user_id AND e.ts > fc.c
        |       WHERE e.event_type = 'purchase' GROUP BY 1),
        |dl AS (SELECT epoch_us(fp.p) - epoch_us(fc.c) AS delta_us
        |       FROM fp JOIN fc ON fc.user_id = fp.user_id)
        |SELECT cast(count(*) AS BIGINT) AS converted,
        |  round(quantile_cont(delta_us, 0.50), 1) AS p50_us,
        |  round(quantile_cont(delta_us, 0.90), 1) AS p90_us,
        |  cast(sum(delta_us) AS DOUBLE) / count(*) AS mean_us
        |FROM dl""".stripMargin))

  // Population Stability Index — the industry-standard model-monitoring
  // drift score (banking scorecard lineage), complementing q_ks_histogram
  // (max ECDF gap) with the full-distribution Σ(p−q)·ln(p/q) between the
  // month's two halves. Laplace-smoothed bucket shares (+1/(n+B)) keep
  // ln() finite on one-sided buckets deterministically — no ε tuning.
  // Scale shape: one conditional-sum histogram over the corpus (value-
  // domain-bounded), a single-row totals broadcast, and a 15-row fold;
  // PSI > 0.25 is the conventional "investigate the upstream data" alarm.
  // The ref/cur boundary is DERIVED from the data (midpoint of the
  // purchase date span, integer day arithmetic both engines share) —
  // a hard-coded date would silently empty one period if the fixture's
  // time span ever moved. A 0-1 day span still empties the reference
  // half even with the derived split, so an empty period NULLs the
  // score outright (n_ref/n_cur stay emitted): Laplace smoothing would
  // otherwise keep a period-free "PSI" plausible-looking while it
  // measured distance to uniform noise.
  private val psi = NamedQuery(
    "q_psi_drift",
    (spark, d) => {
      val ev = Tables.events(spark, d)
        .filter(col("event_type") === "purchase")
        .select(col("value"), to_date(col("ts")).as("dte"))
      val split = ev.agg(date_add(min("dte"),
        floor(datediff(max("dte"), min("dte")) / 2).cast("int")).as("split_d"))
      val h = ev.crossJoin(broadcast(split))
        .groupBy(floor(col("value") / 25).cast("long").as("bkt"))
        .agg(
          sum(when(col("dte") < col("split_d"), 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("dte") >= col("split_d"), 1L).otherwise(0L)).as("c_cur"))
      val t = h.agg(count(lit(1)).as("nb"), sum("c_ref").as("n_ref"),
        sum("c_cur").as("n_cur"))
      h.crossJoin(broadcast(t))
        .select(col("nb"), col("n_ref"), col("n_cur"),
          ((col("c_ref") + 1.0) / (col("n_ref") + col("nb"))).as("p"),
          ((col("c_cur") + 1.0) / (col("n_cur") + col("nb"))).as("q"))
        .groupBy("nb", "n_ref", "n_cur")
        .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi_raw"))
        // an EMPTY period is not drift, it is no data: when the purchase
        // span is 0-1 days the derived midpoint empties the reference
        // half, and the Laplace-smoothed fold would emit a plausible,
        // alarm-range "PSI vs uniform noise" in BOTH engines (gate-blind,
        // review r11) — exactly the failure the derived boundary was
        // meant to prevent. NULL the score instead; n_ref/n_cur stay
        // emitted so the dashboard shows WHY.
        .select(col("nb").as("n_buckets"), col("n_ref"), col("n_cur"),
          when(col("n_ref") > 0 && col("n_cur") > 0, col("psi_raw"))
            .as("psi"))
    },
    Some("""WITH ev AS (
        |  SELECT value, cast(ts AS DATE) AS dte
        |  FROM events WHERE event_type = 'purchase'),
        |sp AS (
        |  SELECT min(dte) + CAST(floor(date_diff('day', min(dte), max(dte)) / 2)
        |                         AS INTEGER) AS split_d
        |  FROM ev),
        |b AS (
        |  SELECT cast(floor(value / 25) AS BIGINT) AS bkt,
        |    CASE WHEN ev.dte < sp.split_d
        |         THEN 'ref' ELSE 'cur' END AS period
        |  FROM ev, sp),
        |h AS (
        |  SELECT bkt,
        |    sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS c_ref,
        |    sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS c_cur
        |  FROM b GROUP BY 1),
        |t AS (SELECT count(*) AS nb, sum(c_ref) AS n_ref,
        |             sum(c_cur) AS n_cur FROM h),
        |s AS (
        |  SELECT h.bkt,
        |    (h.c_ref + 1.0) / (t.n_ref + t.nb) AS p,
        |    (h.c_cur + 1.0) / (t.n_cur + t.nb) AS q
        |  FROM h, t)
        |SELECT cast((SELECT nb FROM t) AS BIGINT) AS n_buckets,
        |  cast((SELECT n_ref FROM t) AS BIGINT) AS n_ref,
        |  cast((SELECT n_cur FROM t) AS BIGINT) AS n_cur,
        |  CASE WHEN (SELECT n_ref FROM t) > 0 AND (SELECT n_cur FROM t) > 0
        |       THEN round(sum((p - q) * ln(p / q)), 6) END AS psi
        |FROM s""".stripMargin))

  // Ratio-to-report: each nation's share of its region's revenue plus
  // its in-region rank — the classic OLAP percent-of-total idiom.
  // Exact-cents sums (rule 10), dims broadcast onto the fact scan, and
  // both the share denominator and the rank run over the 25-row nation
  // relation (re-aggregated totals join + a region-partitioned window
  // over ≤ |nations| rows — never the fact table).
  private val ratioToReport = NamedQuery(
    "q_ratio_to_report",
    (spark, d) => {
      val rev = Tables.orders(spark, d)
        .join(broadcast(Tables.customer(spark, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(spark, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(spark, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val tot = rev.groupBy(col("region").as("tregion"))
        .agg(sum("cents").as("rc"))
      val w = Window.partitionBy("region")
        .orderBy(desc("cents"), col("nation"))
      rev.join(broadcast(tot), col("tregion") === col("region"))
        .select(col("region"), col("nation"),
          round(col("cents") / 100.0, 2).as("revenue"),
          round(col("cents").cast("double") / col("rc"), 6).as("share"),
          rank().over(w).cast("long").as("rnk"))
        .orderBy("region", "rnk", "nation")
    },
    Some("""WITH rev AS (
        |  SELECT n.n_name AS nation, r.r_name AS region,
        |    sum(cast(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT region AS tregion, sum(cents) AS rc FROM rev GROUP BY 1)
        |SELECT rev.region, rev.nation,
        |  round(rev.cents / 100.0, 2) AS revenue,
        |  round(cast(rev.cents AS DOUBLE) / tot.rc, 6) AS share,
        |  rank() OVER (PARTITION BY rev.region
        |               ORDER BY rev.cents DESC, rev.nation) AS rnk
        |FROM rev JOIN tot ON tot.tregion = rev.region
        |ORDER BY region, rnk, nation""".stripMargin))

  // Hour-of-day × ISO-day-of-week seasonality profile — the traffic
  // heatmap behind capacity planning and anomaly baselines (the
  // companion q_anomaly_zscore would deseasonalize with). One partial-
  // aggregated rollup; the output is bounded at 7×24 rows forever.
  // ISO day parity: Spark weekday() is 0=Monday, DuckDB isodow is
  // 1=Monday — weekday+1 aligns them exactly.
  // avg is the raw exact-cents mean (Money rule 12): round(avg(double))
  // is order-dependent and flipped a 4-dp boundary at sf1 between two
  // identical runs — exact integer sums through one identical division
  // chain are bit-identical doubles in both engines, nothing to round.
  private val seasonality = NamedQuery(
    "q_hourly_seasonality",
    (spark, d) => Tables.events(spark, d)
      .groupBy((expr("weekday(ts)") + 1).cast("long").as("dow"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Money.centsMean(col("value")).as("avg_value"))
      .orderBy("dow", "hr"),
    Some(s"""SELECT isodow(ts) AS dow, cast(hour(ts) AS INT) AS hr,
        |  cast(count(*) AS BIGINT) AS n,
        |  ${graft.ops.Money.centsMeanSql("value")} AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin))

  /** Margin of the shared hashed classifier on raw text (tokenize, then
    * ops.TextOps.hashClassifierMargin). */
  private def classifierMargin(text: org.apache.spark.sql.Column) =
    graft.ops.TextOps.hashClassifierMargin(graft.ops.TextOps.words(text))

  // ---- RFM segmentation: quartile-code every customer on Recency
  // (days since last order, vs the corpus max date), Frequency (order
  // count) and Monetary (exact lifetime cents), segment = the
  // concatenated quartile code "rfm" — the classic customer-value
  // grid a marketing warehouse cuts campaigns with. Scale shape: the
  // three global quartiles run through Ranking.groupedRank (histogram
  // ranking — value-domain-bounded histograms + bucket-partitioned
  // local sorts; NO unpartitioned ntile window anywhere); each rank is
  // totally ordered by (metric, custkey) so quartile boundaries are
  // deterministic. Money is exact integer cents (Money.quantizeCents,
  // DECIMAL(38,0) partials — rule 11).
  private val rfmSegments = NamedQuery(
    "q_rfm_segments",
    (spark, d) => {
      val o = Tables.orders(spark, d)
      val cust = o.groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(Money.quantizeCents(col("o_totalprice")).cast("decimal(38,0)"))
            .cast("long").as("monetary_cents"))
      val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
      // pin the customer-bounded base ONCE; the three chained ranks stay
      // LAZY (r14 opt — was a localCheckpoint barrier per rank): each
      // rank's multi-consumer subtrees (histogram + totals) aggregate
      // over the CHECKPOINTED BASE via groupedRank's histDf parameter,
      // so nothing re-executes an earlier rank's window, and the main
      // chain (base → 3 × [two broadcast joins + bucket-partitioned
      // window]) is one consumer per level — one AQE job instead of
      // four driver-synchronized barriers (35 single-task stages,
      // 2.5 s wall for 1.1 s executor time, r14 StageProfile).
      val base = cust.crossJoin(broadcast(anchor))
        .withColumn("recency",
          datediff(col("anchor").cast("date"), col("last_order").cast("date"))
            .cast("long"))
        .localCheckpoint()
      val ranked = Seq(
        ("recency", col("recency"), "r"),
        ("frequency", col("frequency"), "f"),
        ("monetary_cents", floor(col("monetary_cents") / 1000000L).cast("long"), "m"))
        .foldLeft(base) { case (df, (value, bucket, p)) =>
          graft.ops.Ranking.groupedRank(df, Seq.empty, col(value), bucket,
            Seq("cust"), s"${p}_rank", s"${p}_n", histDf = base)
        }
      def quart(p: String) = graft.ops.Ranking
        .ntileFromRank(col(s"${p}_rank"), col(s"${p}_n"), 4).cast("string")
      ranked
        .withColumn("segment", concat(quart("r"), quart("f"), quart("m")))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("monetary_cents").cast("decimal(38,0)"))
            .cast("long").as("monetary_cents"))
        .orderBy("segment")
    },
    Some(s"""WITH cust AS (
        |  SELECT o_custkey AS cust, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(sum(${Money.quantizeCentsSql("o_totalprice")}) AS BIGINT)
        |      AS monetary_cents
        |  FROM orders GROUP BY 1),
        |base AS (
        |  SELECT cust, frequency, monetary_cents,
        |    datediff('day', CAST(last_order AS DATE),
        |      CAST((SELECT max(o_orderdate) FROM orders) AS DATE)) AS recency
        |  FROM cust),
        |q AS (
        |  SELECT cust, monetary_cents,
        |    ntile(4) OVER (ORDER BY recency, cust) AS r_q,
        |    ntile(4) OVER (ORDER BY frequency, cust) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary_cents, cust) AS m_q
        |  FROM base)
        |SELECT concat(r_q, f_q, m_q) AS segment,
        |  count(*) AS n_customers,
        |  CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents
        |FROM q GROUP BY 1 ORDER BY segment""".stripMargin))

  override def all: Seq[NamedQuery] =
    Seq(anomaly, attribution, bpePairs, ksTest,
      modelLift, covMatrix, weeklyCorr, markov, keySkew, pcaPower, pcaProject, countMin, gini, timeToConvert, psi,
      ratioToReport, seasonality, rfmSegments)
}
