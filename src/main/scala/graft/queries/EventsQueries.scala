package graft.queries

import graft.Tables
import graft.ops.Money
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming-equivalent batch queries over `events` (SURVEY.md §2.2
  * "Streaming"): tumbling / sliding / session windows, watermark-style
  * keyed dedup, an as-of join, and frame-based moving aggregates. Batch
  * mode keeps every one DuckDB-oracle-checkable; graft.streaming.Streams
  * runs the same shapes as true Structured Streaming (ScalaTest-verified
  * against these batch results). Window starts are emitted as epoch
  * seconds — engine-portable, no timestamp formatting drift. */
object EventsQueries extends QueryRegistry {

  // Tumbling 1-hour window: Spark's window() origin is epoch-aligned UTC,
  // i.e. floor(epoch/3600)*3600 — mirrored literally in the oracle.
  private val tumbling = NamedQuery(
    "q_window_tumbling",
    (spark, d) => Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Money.centsSum(col("value")).as("total"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type"),
    Some(s"""SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
        |  event_type, count(*) AS n, ${Money.centsSumSql("value")} AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))

  // Sliding 1-hour window every 30 min: each event lands in exactly two
  // windows; the oracle expands them with unnest([0,1]).
  private val sliding = NamedQuery(
    "q_window_sliding",
    (spark, d) => Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col("n"))
      .orderBy("window_start"),
    Some("""SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - k * 1800 AS window_start,
        |  count(*) AS n
        |FROM events, unnest([0, 1]) AS t(k)
        |GROUP BY 1 ORDER BY window_start""".stripMargin))

  // Session windows (30-min gap) per user: Spark session_window semantics
  // are start = first event, end = last event + gap; the oracle is the
  // classic gaps-and-islands rewrite. Boundary parity: Spark merges an
  // event at EXACTLY prev_ts + gap (UpdatingSessionsIterator starts a
  // new session only for start strictly past the current end), so the
  // oracle's inclusive `<= INTERVAL 30 MINUTE` is the faithful rewrite —
  // pinned by GateBlindnessSpec (the fixture's jittered timestamps never
  // exercise the boundary).
  private val session = NamedQuery(
    "q_window_session",
    (spark, d) => Tables.events(spark, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), Money.centsSum(col("value")).as("total"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"), col("n"), col("total"))
      .orderBy("user_id", "session_start"),
    Some(s"""WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS session_end,
        |  count(*) AS n, ${Money.centsSumSql("value")} AS total
        |FROM islands GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin))

  // Keyed dedup — batch shape of dropDuplicatesWithinWatermark: keep the
  // FIRST event per (user_id, event_type), deterministically.
  private val dedupKeyed = NamedQuery(
    "q_dedup_keyed",
    (spark, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(spark, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("first_ts"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS first_ts
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin))

  // As-of join: each purchase matched to the user's most recent prior
  // click. Composed from built-ins (union-free: one window pass with
  // IGNORE NULLS) rather than a custom join operator — a single sort
  // exchange on user_id at any scale.
  private val asof = NamedQuery(
    "q_asof_click_purchase",
    (spark, d) => {
      val ev = Tables.events(spark, d)
        .filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_ts"),
          unix_timestamp(col("last_click_ts")).as("click_ts"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts,
        |  CAST(floor(epoch(last_click_ts)) AS BIGINT) AS click_ts
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin))

  // Moving aggregate over a row frame + lag: per-user 4-event moving avg.
  // Exact-cents form (Money rule 11): round(avg(double)) over a frame is
  // the banned order-dependent pattern — windowed sums associate
  // differently per engine (Spark sequential fold vs DuckDB segment
  // tree), so the frame sum is Σ integer cents and the mean is emitted
  // RAW (rule 12). lag() is a single VALUE, not a sum — its round is safe.
  private val moving = NamedQuery(
    "q_moving_avg",
    (spark, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-3, 0)
      Tables.events(spark, d)
        .select(col("event_id"), col("user_id"),
          (graft.ops.Money.centsSumRaw(col("value")).over(wf).cast("double") /
            lit(100.0) / count(lit(1)).over(wf)).as("mov_avg"),
          round(lag(col("value"), 1).over(w), 2).as("prev_value"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 100.0
        |    / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mov_avg,
        |  round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value
        |FROM events ORDER BY event_id""".stripMargin))

  // Two-phase salted aggregation — the standard hot-key skew pattern:
  // phase 1 aggregates on (key, salt) spreading a hot key over 8
  // reducers; phase 2 merges the partials. Result identical to the
  // direct groupBy (the oracle), demonstrated on the 5-value event_type
  // key (each value is 'hot' relative to key cardinality).
  private val salted = NamedQuery(
    "q_salted_agg",
    (spark, d) => Tables.events(spark, d)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("event_type", "salt")
      // phase-1 partials already in exact cents (Money rule 11), so the
      // phase-2 merge is integer addition — salting cannot perturb it
      .agg(count(lit(1)).as("pn"), Money.centsSumRaw(col("value")).as("pv"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"),
        (sum(col("pv")).cast("double") / 100.0).as("total"))
      .orderBy("event_type"),
    Some(s"""SELECT event_type, count(*) AS n, ${Money.centsSumSql("value")} AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // Range join: equi-key on user plus a time-band predicate — each
  // signup matched to the same user's purchases within the following
  // hour. Spark plans equi+range as a hash/SMJ on user_id with the band
  // as a post-join filter; at scale the band would additionally be
  // bucketed by time to prune (the classic interval-join layout).
  private val rangeJoin = NamedQuery(
    "q_range_join_conversion",
    (spark, d) => {
      val ev = Tables.events(spark, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value"))
      signups.join(purchases,
          signups("user_id") === purchases("user_id") &&
            purchases("p_ts") >= signups("s_ts") &&
            purchases("p_ts") < signups("s_ts") + expr("INTERVAL 1 HOUR"),
          "left")
        .groupBy(col("signup_id"))
        .agg(count(col("p_ts")).as("n_purchases_1h"),
          // rule 11: exact-cents money sum (order-independent), not
          // round(sum(double), 2) — the r9 review found the WINDOWED
          // twins of this hazard too (q_moving_avg, q_window_range_frame:
          // Spark folds frames sequentially, DuckDB segment-trees them),
          // now also on the cents form
          coalesce(graft.ops.Money.centsSum(col("value")), lit(0.0)).as("spend_1h"))
        .orderBy("signup_id")
    },
    Some(s"""SELECT s.event_id AS signup_id,
        |  count(p.ts) AS n_purchases_1h,
        |  coalesce(${graft.ops.Money.centsSumSql("p.value")}, 0.0) AS spend_1h
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id
        |ORDER BY signup_id""".stripMargin))

  // Value-based RANGE frame: per-user rolling 30-minute sum keyed on
  // EVENT TIME, not row position (peers at the same epoch contribute
  // identically in both engines, so ties never desync the frame —
  // unlike ROWS frames under non-unique ordering). Exact-cents form
  // (Money rule 11): round(sum(double),2) over a frame was the last
  // banned money pattern left after the rule-11 sweep — Spark folds a
  // frame sequentially, DuckDB aggregates it through a segment tree, so
  // a frame whose true sum sits within an ulp of a half-cent boundary
  // rounds apart. Σ integer cents instead, dollars emitted RAW (rule 2).
  private val rangeFrame = NamedQuery(
    "q_window_range_frame",
    (spark, d) => {
      val epochS = floor(unix_timestamp(col("ts"))).cast("long")
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
        .rangeBetween(-1800L, 0L)
      Tables.events(spark, d)
        .select(col("event_id"), col("user_id"), epochS.as("epoch_s"), col("value"))
        .withColumn("rolling_30m",
          graft.ops.Money.centsSumRaw(col("value")).over(w).cast("double") /
            lit(100.0))
        .select(col("event_id"), col("user_id"), col("epoch_s"), col("rolling_30m"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, epoch_s,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / 100.0 AS rolling_30m
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value
        |      FROM events) t
        |ORDER BY event_id""".stripMargin))

  // IGNORE NULLS navigation: carry forward the last non-click value per
  // user (clicks are nulled) — the gap-fill primitive.
  private val ignoreNulls = NamedQuery(
    "q_window_ignore_nulls",
    (spark, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, d)
        .withColumn("v",
          when(col("event_type") =!= "click", round(col("value"), 2)))
        .withColumn("last_non_click", last(col("v"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("last_non_click"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_non_click
        |FROM (SELECT event_id, user_id, ts, event_type,
        |        CASE WHEN event_type <> 'click' THEN round(value, 2) END AS v
        |      FROM events) t
        |ORDER BY event_id""".stripMargin))

  // Salted JOIN (complement of q_salted_agg's salted aggregation): the
  // hot-key join fix when AQE can't help (e.g. the hot side feeds a
  // non-splittable stage). Fact rows get a deterministic salt
  // (l_orderkey % 8); the dimension is exploded ×8 so every (key, salt)
  // bucket joins locally — one hot key spreads over 8 reducers. Result
  // is IDENTICAL to the plain join, which is exactly what the oracle
  // checks (it runs the unsalted join).
  private val saltedJoin = NamedQuery(
    "q_salted_join",
    (spark, d) => {
      val salts = 8
      val fact = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          pmod(col("l_orderkey"), lit(salts)).as("salt"))
      // shuffle_hash hint: without it Spark BROADCASTS the exploded
      // dimension — building a |dim|×8-entry hash relation on the driver
      // (slow) and defeating the salt entirely (a broadcast join never
      // skews). The salted pattern only makes sense as a shuffle join:
      // each (key, salt) bucket lands on its own reducer.
      val dim = Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
        .hint("shuffle_hash")
      fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey") &&
            fact("salt") === dim("salt").cast("int"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Money.centsSum(col("l_extendedprice")).as("total"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, count(*) AS n,
        |  ${Money.centsSumSql("l_extendedprice")} AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // SCD type-2 dimension build: each user's purchase stream becomes
  // validity intervals [valid_from, valid_to) via lead(), with the open
  // interval (valid_to NULL) marking current state — the
  // change-data-capture materialization pattern. One window per user
  // partition; the shuffle carries only the filtered purchase rows.
  private val scd2 = NamedQuery(
    "q_scd2_user_state",
    (spark, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"), col("event_id"))
      Tables.events(spark, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("epoch_s"),
          round(col("value"), 2).as("state"))
        .select(col("user_id"), col("event_id"),
          col("epoch_s").as("valid_from"),
          lead(col("epoch_s"), 1).over(w).as("valid_to"),
          col("state"),
          lead(col("epoch_s"), 1).over(w).isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""SELECT user_id, event_id, epoch_s AS valid_from,
        |  lead(epoch_s, 1) OVER w AS valid_to, state,
        |  lead(epoch_s, 1) OVER w IS NULL AS is_current
        |FROM (SELECT user_id, event_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |        round(value, 2) AS state
        |      FROM events WHERE event_type = 'purchase' AND user_id < 50) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin))

  // ---- Time-series resampling with linear interpolation: regularize
  // each user's irregular event stream onto an hourly grid — the
  // classic sensor/metrics prep step (resample → interpolate → model).
  // Known hours carry the exact-cents mean at 6dp; missing hours interpolate
  // linearly between the bracketing knowns via IGNORE NULLS navigation
  // windows (the gap-fill pattern of q_window_ignore_nulls, upgraded
  // from hold-last to linear). The spine never leaves a user's
  // [min,max] hour, so both interpolation endpoints always exist. The
  // interpolation formula is pure IEEE +−×÷ over identical inputs
  // (rounded knowns, exact integer hours) and is emitted RAW per
  // COVERAGE rule 2. Scale: the spine explodes to |users|·|hours| rows
  // — bounded by the calendar, not the event volume — and both windows
  // run in one partition pass per user.
  private val resample = NamedQuery(
    "q_time_resample",
    (spark, d) => {
      val known = Tables.events(spark, d)
        .filter(col("user_id") < 5)
        .groupBy(col("user_id"), expr("unix_timestamp(ts) div 3600").as("h"))
        .agg(Money.centsMean(col("value")).as("v"))
        // read twice (spine bounds + the left join): pin so the events
        // scan + hourly aggregation cannot re-execute per branch
        .localCheckpoint()
      val spine = known.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
      val wPrev = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(known, Seq("user_id", "h"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("ph",
          last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nh",
          first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wNext))
        .select(col("user_id"), col("h"),
          when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("h") - col("ph")) / (col("nh") - col("ph")).cast("double"))
            .as("value_interp"),
          when(col("v").isNotNull, lit(0)).otherwise(lit(1)).as("interpolated"))
        .orderBy("user_id", "h")
    },
    Some(s"""WITH ev AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, value
        |  FROM events WHERE user_id < 5),
        |known AS (
        |  SELECT user_id, h, ${Money.centsMeanSql("value")} AS v
        |  FROM ev GROUP BY user_id, h),
        |bounds AS (
        |  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM known GROUP BY user_id),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM bounds),
        |joined AS (
        |  SELECT s.user_id, s.h, k.v,
        |    last_value(k.v IGNORE NULLS) OVER w_prev AS pv,
        |    last_value(CASE WHEN k.v IS NOT NULL THEN s.h END IGNORE NULLS)
        |      OVER w_prev AS ph,
        |    first_value(k.v IGNORE NULLS) OVER w_next AS nv,
        |    first_value(CASE WHEN k.v IS NOT NULL THEN s.h END IGNORE NULLS)
        |      OVER w_next AS nh
        |  FROM spine s LEFT JOIN known k USING (user_id, h)
        |  WINDOW
        |    w_prev AS (PARTITION BY s.user_id ORDER BY s.h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    w_next AS (PARTITION BY s.user_id ORDER BY s.h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, h,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) * (h - ph) / CAST(nh - ph AS DOUBLE) END
        |    AS value_interp,
        |  CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS interpolated
        |FROM joined
        |ORDER BY user_id, h""".stripMargin))

  // ---- Funnel conversion with attribution windows: the ordered
  // event-sequence shape (view → click within 24h → purchase within 72h
  // of the click). Spark has no MATCH_RECOGNIZE; the engine-portable
  // form is staged conditional aggregation — each stage is one
  // groupBy(user) over the events pre-filtered to its type, joined to
  // the previous stage's anchor timestamp. Every join key is user_id,
  // so all three stages reuse one shuffle partitioning; the stage
  // relations shrink monotonically (150 → 60 → 45 here). Timestamps
  // compare in exact integer microseconds (unix_micros ≡ epoch_us) —
  // no float time math anywhere.
  private val funnel = NamedQuery(
    "q_funnel_conversion",
    (spark, d) => {
      val ev = Tables.events(spark, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val v = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("tus"))).as("t_view"))
        .filter(col("t_view").isNotNull)
      // c is consumed TWICE (the purchase stage's join and its own stage
      // count) and its subtree holds the click⋈view join over the full
      // events scan: without a pin both consumers re-execute it (the
      // repeated-subtree sweep, PlanSweepSpec, caught this). One
      // materialized per-user relation replaces two fact-scan joins.
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("tus") > col("t_view") &&
          col("tus") <= col("t_view") + lit(86400L * 1000000L))
        .groupBy("user_id").agg(min(col("tus")).as("t_click"))
        .localCheckpoint()
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("tus") > col("t_click") &&
          col("tus") <= col("t_click") + lit(259200L * 1000000L))
        .groupBy("user_id").agg(min(col("tus")).as("t_purchase"))
      def stage(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      // WINDOW-FREE "first stage" reference: rate_vs_top divides by the
      // 1_view count, which is a one-row aggregate — broadcast it as a
      // cross join instead of a first() window over the 3 stage rows
      val top = v.agg(count(lit(1)).as("top_n"))
      stage("1_view", v)
        .unionByName(stage("2_click", c))
        .unionByName(stage("3_purchase", p))
        .crossJoin(broadcast(top))
        // RAW emit (rule 12): both counts are exact integers, so the
        // quotient is bit-identical in both engines — while round(…, 6)
        // would tie-break a half-boundary rational like 321/640
        // differently per engine
        .withColumn("rate_vs_top",
          col("n_users") / col("top_n").cast("double"))
        .drop("top_n")
        .orderBy("stage")
    },
    Some("""WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN tus END) AS t_view
        |  FROM ev GROUP BY user_id
        |  HAVING min(CASE WHEN event_type = 'view' THEN tus END) IS NOT NULL),
        |c AS (
        |  SELECT e.user_id, min(tus) AS t_click
        |  FROM ev e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND tus > t_view
        |    AND tus <= t_view + 86400::BIGINT * 1000000
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(tus) AS t_purchase
        |  FROM ev e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND tus > t_click
        |    AND tus <= t_click + 259200::BIGINT * 1000000
        |  GROUP BY e.user_id)
        |SELECT stage, n_users,
        |  n_users / CAST(first_value(n_users) OVER (
        |    ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS rate_vs_top
        |FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click', count(*) FROM c
        |  UNION ALL SELECT '3_purchase', count(*) FROM p) t
        |ORDER BY stage""".stripMargin))

  // ---- Gaps-and-islands: per-user consecutive-day activity streaks
  // via the difference-of-rankings idiom (day_number − row_number is
  // constant within a run of consecutive days). Complements
  // q_window_session (TIME-gap sessionization): islands are defined on
  // the integer day grid, and the whole computation is integer
  // arithmetic — no tolerance, no rounding. One keyed window + two
  // keyed aggregations, all partitioned by user_id; the distinct
  // (user, day) projection collapses the fact before the window ever
  // sorts.
  private val gapsIslands = NamedQuery(
    "q_gap_islands",
    (spark, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val days = Tables.events(spark, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      days
        .withColumn("grp",
          datediff(col("day"), lit("1995-01-01").cast("date")) -
            row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak_len"))
        .groupBy(col("user_id"))
        .agg(sum(col("streak_len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("streak_len")).as("longest_streak"))
        .orderBy("user_id")
    },
    Some("""WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |runs AS (
        |  SELECT user_id,
        |    datediff('day', DATE '1995-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, grp, count(*) AS streak_len
        |  FROM runs GROUP BY user_id, grp)
        |SELECT user_id,
        |  CAST(sum(streak_len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(max(streak_len) AS BIGINT) AS longest_streak
        |FROM streaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin))

  // Sequence pattern matching (the MATCH_RECOGNIZE family): count
  // STRICTLY CONSECUTIVE view→click→purchase triples per user — no
  // intervening event of any kind, unlike q_funnel_conversion's
  // windowed any-gap stages. lead()-chaining over the user-partitioned
  // event sequence is the relational compilation of a fixed-length
  // pattern: ONE shuffle on user_id, no joins, no state. Ordering ties
  // on ts are broken by event_id so both engines walk the identical
  // sequence. Variable-length patterns (A B+ C) compile to the
  // gaps-and-islands idiom (q_gap_islands) instead of lead-chains.
  private val patternTriples = NamedQuery(
    "q_pattern_triples",
    (spark, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("e1", lead(col("event_type"), 1).over(w))
        .withColumn("e2", lead(col("event_type"), 2).over(w))
        .filter(col("event_type") === "view" &&
          col("e1") === "click" && col("e2") === "purchase")
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS e1,
        |    lead(event_type, 2) OVER w AS e2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT count(*) AS n_triples, count(DISTINCT user_id) AS n_users
        |FROM seq
        |WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'""".stripMargin))

  // Cohort retention: users bucketed by FIRST-purchase week, activity =
  // distinct purchase weeks, cell = users from cohort c active at week
  // offset o — the product-analytics staple. Week truncation is ISO
  // Monday in both engines; offsets are exact integer week multiples so
  // the divide-then-cast is lossless. Two partial-aggregated shuffles
  // plus a user-keyed join of the cohort relation — which is one row
  // PER USER, so it is deliberately NOT broadcast-hinted (at scale a
  // per-user relation is exactly what must shuffle; AQE may still
  // broadcast it at fixture size). Only the output matrix is tiny.
  private val cohortRetention = NamedQuery(
    "q_cohort_retention",
    (spark, d) => {
      val p = Tables.events(spark, d).filter(col("event_type") === "purchase")
      val first = p.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val act = p.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      act.join(first, "user_id")
        .groupBy(unix_timestamp(col("cohort")).as("cohort_week"),
          ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort"))) / 604800)
            .cast("long").as("offset_weeks"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    },
    Some("""WITH first AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |  FROM events WHERE event_type = 'purchase')
        |SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_week,
        |  CAST((epoch(wk) - epoch(cohort)) / 604800 AS BIGINT) AS offset_weeks,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // The NEGATION pattern (A not-followed-by B): users whose first click
  // was never followed by a purchase within 72h — the abandoned-cart /
  // churn-risk query, and the pattern family funnels cannot express
  // (funnels count successes; this counts the ABSENCE of a successor).
  // Compiled to a windowed anti-join: first click per user (one
  // aggregation), left-anti against purchases constrained to the
  // attribution interval. Both sides shuffle once on user_id; the
  // interval predicate rides the join condition so no pair relation
  // materializes.
  private val abandoned = NamedQuery(
    "q_abandoned_funnel",
    (spark, d) => {
      val ev = Tables.events(spark, d)
      val firstClick = ev.filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("t_buy"))
      firstClick.join(purchases,
          col("user_id") === col("p_user") &&
            col("t_buy") > col("t_click") &&
            col("t_buy") <= col("t_click") + lit(72L * 3600 * 1000000),
          "left_anti")
        .select(col("user_id"), (col("t_click") / 1000000L).cast("long").as("click_epoch"))
        .orderBy("user_id")
    },
    Some("""WITH fc AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t_click
        |  FROM events WHERE event_type = 'click' GROUP BY user_id)
        |SELECT user_id,
        |  CAST(t_click // 1000000 AS BIGINT) AS click_epoch
        |FROM fc
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = fc.user_id
        |    AND epoch_us(p.ts) > fc.t_click
        |    AND epoch_us(p.ts) <= fc.t_click + CAST(72 AS BIGINT) * 3600 * 1000000)
        |ORDER BY user_id""".stripMargin))

  // Trailing 7-day distinct active users per day — COUNT(DISTINCT) OVER
  // a sliding frame, which neither Spark nor most engines support
  // directly (distinct is not decomposable over frames). The standard
  // rewrite: distinct (day, user) once, broadcast the tiny day spine,
  // fan each activity row into the ≤7 window anchors it serves, then
  // one distinct-aggregate per anchor. The fan-out is × window-days on
  // the ALREADY-deduplicated day×user relation — at 100 TB that
  // relation is |days|×|users|, orders smaller than the raw events; a
  // sketch (per-day HLL union) is the approximate alternative when even
  // that is too wide.
  private val rollingDistinct = NamedQuery(
    "q_window_distinct_rolling",
    (spark, d) => {
      val du = Tables.events(spark, d)
        // pushable twin of the join's inferred to_date(ts) IS NOT NULL
        // (a null ts never matches the range condition): without it the
        // scan pushes nothing (PlanSweepSpec check 4)
        .filter(col("ts").isNotNull)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val spine = du.select(col("day").as("anchor")).distinct()
      du.join(broadcast(spine),
          col("day") >= date_sub(col("anchor"), 6) && col("day") <= col("anchor"))
        .groupBy("anchor")
        .agg(countDistinct(col("user_id")).as("active_users_7d"))
        .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"),
          col("active_users_7d"))
        .orderBy("day")
    },
    Some("""WITH du AS (
        |  SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |spine AS (SELECT DISTINCT day AS anchor FROM du)
        |SELECT strftime(anchor, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS active_users_7d
        |FROM du JOIN spine
        |  ON du.day >= anchor - 6 AND du.day <= anchor
        |GROUP BY anchor ORDER BY day""".stripMargin))

  // ---- Changepoint scan (AMOC — "at most one changepoint"): for every
  // candidate split day t, the scaled two-sample mean-shift statistic
  // |mean(≤t) − mean(>t)|·√(n₁n₂/n) over the daily purchase-revenue
  // series; the argmax day is where the level shifted. This is the
  // window-expressible changepoint detector (a CUSUM recursion with its
  // max(0,·) clamp is not a window function in either engine). Scale
  // shape: raw events reduce to ONE (day, Σcents, n) row per day first
  // — the unpartitioned cumulative window then runs over the
  // calendar-bounded day series, never the events. Determinism: daily
  // sums are exact integer cents (Money rule 11), so both engines feed
  // the identical ints through the identical IEEE divide/sqrt chain;
  // round(4) absorbs nothing but the final emission.
  private val changepoint = NamedQuery(
    "q_changepoint_scan",
    (spark, d) => {
      val daily = Tables.events(spark, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day_d"))
        .agg(sum(Money.quantizeCents(col("value"))).as("s"),
          count(lit(1)).as("n"))
      // prefix sums via broadcast self-join of the calendar-bounded day
      // relation (the q_interval_overlap carry pattern) + grand totals
      // via re-aggregation and a one-row broadcast — no unpartitioned
      // WindowExec anywhere (PlanSweepSpec check 1), and the exchanges
      // under the three daily consumers are reused
      val cums = daily.as("a")
        .join(broadcast(daily.as("b")), col("b.day_d") <= col("a.day_d"))
        .groupBy(col("a.day_d").as("day_d"))
        .agg(sum(col("b.s")).as("s1"), sum(col("b.n")).as("n1"))
      val tot = daily.agg(sum(col("s")).as("st"), sum(col("n")).as("nt"))
      cums.crossJoin(broadcast(tot))
        .filter(col("n1") < col("nt")) // the last day splits nothing off
        .select(date_format(col("day_d"), "yyyy-MM-dd").as("day"),
          round(abs(col("s1") / col("n1") -
              (col("st") - col("s1")) / (col("nt") - col("n1"))) *
            sqrt(col("n1").cast("double") * (col("nt") - col("n1")) / col("nt")),
            4).as("split_stat"))
        .orderBy("day")
    },
    Some(s"""WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day_d,
        |    CAST(sum(${Money.quantizeCentsSql("value")}) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT day_d,
        |    sum(s) OVER (ORDER BY day_d) AS s1,
        |    sum(n) OVER (ORDER BY day_d) AS n1,
        |    sum(s) OVER () AS st,
        |    sum(n) OVER () AS nt
        |  FROM daily)
        |SELECT strftime(day_d, '%Y-%m-%d') AS day,
        |  round(abs(CAST(s1 AS DOUBLE) / n1 -
        |      CAST(st - s1 AS DOUBLE) / (nt - n1)) *
        |    sqrt(CAST(n1 AS DOUBLE) * (nt - n1) / nt), 4) AS split_stat
        |FROM c WHERE n1 < nt ORDER BY day""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(tumbling, sliding, session, dedupKeyed, asof, moving, salted, rangeJoin,
      rangeFrame, ignoreNulls, saltedJoin, scd2, resample, funnel, gapsIslands,
      patternTriples, cohortRetention, abandoned, rollingDistinct, changepoint)
}
