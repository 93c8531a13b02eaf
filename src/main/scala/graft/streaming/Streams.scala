package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.2 "Streaming" — absent from
  * the one-shot reference loop, appV2.py:165; part of the engine's
  * breadth). The same logical shapes as the batch EventsQueries —
  * tumbling/sliding/session windows, watermarked dedup — expressed as
  * streaming plans, plus arbitrary stateful processing via
  * mapGroupsWithState. StreamsSpec proves stream/batch equivalence by
  * running each over the fixture events and comparing to the batch
  * result (Spark's incremental execution of the SAME logical plan). */
object Streams {

  /** Raw parquet schema of the events table — ts is TIMESTAMP(MICROS)
    * isAdjustedToUTC=false on disk (TIMESTAMP_NTZ to Spark); readEvents
    * casts it to a session-UTC TIMESTAMP, mirroring Tables.events. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events parquet: at scale this is a
    * directory Spark tails for new files; `maxFilesPerTrigger` bounds
    * per-micro-batch work. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling 1-hour counts with a 1-hour watermark (late rows beyond the
    * watermark are dropped in append mode). Money totals use the exact-
    * cents sum (determinism rule 11) — incremental state accumulation
    * orders the partial sums differently from the batch dual, exactly
    * the order-dependence `round(sum(double), 2)` is vulnerable to. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Money.centsSum(col("value")).as("total"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n"))

  /** Streaming dedup on (user_id, event_type) within the watermark —
    * the streaming dual of the batch q_dedup_keyed. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  final case class UserStat(user_id: Long, n: Long, total: Double)

  /** Arbitrary stateful aggregation: running per-user count/sum kept in
    * GroupState across micro-batches (mapGroupsWithState, update mode).
    * The state object is tiny and partitioned by user — horizontal scale
    * is the number of distinct keys, not events. */
  def statefulUserStats(events: DataFrame): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0.0))
          val (n, tot) = rows.foldLeft((prev.n, prev.total)) {
            case ((c, s), (_, v)) => (c + 1, s + v)
          }
          val next = UserStat(user, n, tot)
          state.update(next)
          next
      }
  }

  final case class FunnelSnap(user_id: Long, t_view: Option[Long],
      t_click: Option[Long], t_purchase: Option[Long])
  final case class FunnelState(minView: Long, clicks: List[Long],
      buys: List[Long])

  /** Streaming funnel (view → click within wClick → purchase within wBuy
    * of the click) as a per-user state machine — the stateful-stream dual
    * of the batch q_funnel_conversion. Events arrive out of order within
    * and across micro-batches, so the state machine cannot finalize
    * stages eagerly: a late-arriving EARLIER view moves the whole
    * attribution window. The state therefore keeps the provable minimum:
    * the min view time plus only those click/purchase times that could
    * still be chosen under some FUTURE window — minView only ever
    * decreases, so clicks > minView + wClick (and purchases beyond
    * minView + wClick + wBuy) are discarded permanently; everything else
    * is a live candidate. Each batch re-derives the funnel from state
    * (an order-insensitive fold), emitting the user's current snapshot
    * in update mode; once all input is consumed the last snapshot per
    * user EQUALS the batch funnel (StreamsSpec proves it). State is
    * O(candidate events inside one attribution window) per user once a
    * view exists; for a user with NO view the lists are pruned against
    * the stream's watermark (candidates at or below it can never
    * attribute to a still-unseen view), so with a watermarked input —
    * the deploy shape — state is bounded for every user. Without a
    * watermark the no-view lists are necessarily unbounded (any view
    * may still arrive arbitrarily late); that is the unbounded-lateness
    * contract the caller chose, not a leak.
    *
    * LATE ROWS on a watermarked input are dropped INSIDE the fold:
    * FlatMapGroupsWithStateExec applies its built-in late-row filter
    * only under EventTimeTimeout (Spark 4.1.2 — same fact the
    * ewmaOrderedFold doc states), and this fold uses NoTimeout, so
    * Spark delivers watermark-late rows to the state function. The
    * no-view prune is sound only if they never enter it — a late VIEW
    * must not arrive after its candidate clicks/buys were pruned — so
    * every incoming event with t ≤ watermark is ignored explicitly,
    * the same filter a streaming aggregation would apply. Data that
    * respects its watermark (the contract the caller declared) loses
    * nothing; unwatermarked input drops and prunes nothing. */
  def funnelStages(events: DataFrame, wClick: Long, wBuy: Long): Dataset[FunnelSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    // ts rides along UNUSED by the fold: it is the (possibly)
    // watermarked attribute, and projecting it away would prune the
    // EventTimeWatermark node so getCurrentWatermarkMs throws even on
    // a watermarked stream
    events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(Long.MaxValue, Nil, Nil))
          // getCurrentWatermarkMs throws on an unwatermarked stream
          // (API contract) → wmUs = 0 → nothing is dropped or pruned
          val wmUs = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) * 1000L
          rows.foreach { case (_, ty, t, _) =>
            // explicit late-row drop (see Scaladoc): NoTimeout means
            // Spark did NOT filter these, and a late view entering
            // after the no-view prune would silently lose its funnel
            if (wmUs <= 0L || t > wmUs) ty match {
              case "view" =>
                if (t < st.minView) st = st.copy(minView = t)
              case "click" => st = st.copy(clicks = t :: st.clicks)
              case "purchase" => st = st.copy(buys = t :: st.buys)
              case _ => ()
            }
          }
          val v = st.minView
          if (v != Long.MaxValue) st = st.copy(
            clicks = st.clicks.filter(_ <= v + wClick),
            buys = st.buys.filter(_ <= v + wClick + wBuy))
          else {
            // NO VIEW ON FILE: the minView prune above never runs, so a
            // user that only ever clicks/buys (a bot, or a stream whose
            // views are sampled out) would grow these lists forever.
            // When the caller watermarked the stream, a candidate at or
            // below the watermark is dead state: any view still to
            // arrive has event time ABOVE the watermark W, a click
            // attributes only to a view v < t, so t ≤ W can never be
            // chosen (and purchases ride clicks, same bound). The
            // prune is self-consistent with the late-row drop above:
            // a view surviving that drop has t > watermark-at-arrival
            // ≥ watermark-now, so no pruned candidate could ever have
            // attributed to it. Unwatermarked input: wmUs = 0, prunes
            // nothing — unbounded-lateness semantics unchanged.
            if (wmUs > 0L) st = st.copy(
              clicks = st.clicks.filter(_ > wmUs),
              buys = st.buys.filter(_ > wmUs))
          }
          state.update(st)
          val tView = if (v == Long.MaxValue) None else Some(v)
          val tClick = tView.flatMap(tv =>
            st.clicks.filter(t => t > tv && t <= tv + wClick)
              .minOption)
          val tBuy = tClick.flatMap(tc =>
            st.buys.filter(t => t > tc && t <= tc + wBuy).minOption)
          FunnelSnap(user, tView, tClick, tBuy)
      }
  }

  final case class EwmaSnap(user_id: Long, n: Long, ewma: Double, n_late_dropped: Long)
  final case class EwmaState(ewma: Double, n: Long, frontier: Long,
      dropped: Long, buf: List[(Long, Double)])

  /** Streaming EWMA per user over event VALUES in EVENT-TIME order — the
    * stateful dual of the q_ewma_daily fold, and the harder streaming
    * shape: unlike the funnel (an order-insensitive fold) a recurrence
    * consumes its inputs in sequence, so out-of-order arrival cannot be
    * folded eagerly. The state machine buffers (ts, value) pairs and
    * COMMITS the prefix older than the current watermark into the
    * running recurrence (sorted by (ts, value) — the same deterministic
    * order the batch dual uses); everything younger stays buffered, so
    * state is O(events inside the watermark lag), not O(stream). Each
    * batch emits a snapshot that folds the buffered tail on top of the
    * committed accumulator WITHOUT committing it — once input is
    * exhausted the last snapshot per user equals the batch fold
    * bit-for-bit (same doubles, same order; StreamsSpec proves it).
    * mapGroupsWithState does NOT drop watermark-late input for us
    * (Spark only filters late rows under EventTimeTimeout), so
    * correctness is enforced against the COMMITTED FRONTIER: a row
    * behind it would rewrite history the recurrence has already
    * consumed, and is dropped and counted in `n_late_dropped`. This is
    * deliberately MORE accepting than a streaming aggregation's
    * watermark drop — a row that is late vs the watermark but whose
    * key has not yet committed past it still folds in at its correct
    * position (it lands in the pending buffer and commits in sorted
    * order) — and never less correct: only rows that physically cannot
    * enter the recurrence in order are refused. */
  def ewmaOrderedFold(events: DataFrame, alpha: Double,
                      watermarkDelay: String): Dataset[EwmaSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // the watermark-tagged ts column must flow INTO the grouped
      // Dataset — projecting it away (e.g. to unix_micros) prunes the
      // EventTimeWatermark node and getCurrentWatermarkMs throws
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(
            EwmaState(0.0, 0L, Long.MinValue, 0L, Nil))
          // enforce the frontier: rows at/behind the committed prefix
          // cannot enter the recurrence without corrupting its order
          rows.foreach { case (_, t, v) =>
            val i = t.toInstant
            val tus = i.getEpochSecond * 1000000L + i.getNano / 1000L
            if (tus < st.frontier) st = st.copy(dropped = st.dropped + 1)
            else st = st.copy(buf = (tus, v) :: st.buf)
          }
          def fold(e0: Double, n0: Long, xs: List[(Long, Double)]): (Double, Long) =
            xs.sorted.foldLeft((e0, n0)) { case ((e, n), (_, v)) =>
              (if (n == 0L) v else (1 - alpha) * e + alpha * v, n + 1)
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, hold) = st.buf.partition(_._1 < wmUs)
          if (ready.nonEmpty) {
            val (e, n) = fold(st.ewma, st.n, ready)
            // the frontier is the MAX COMMITTED EVENT TIME (+1 so an
            // exact tie — which the (ts, value) batch sort could place
            // BEFORE a committed row — still refuses), NOT the watermark:
            // advancing to the watermark would also refuse rows between
            // the two that could still fold in order-correctly after the
            // committed prefix, diverging from the batch dual on input
            // the contract promises to accept
            val maxCommitted = ready.iterator.map(_._1).max
            st = EwmaState(e, n, math.max(st.frontier, maxCommitted + 1),
              st.dropped, hold)
          }
          state.update(st)
          val (e, n) = fold(st.ewma, st.n, st.buf)
          EwmaSnap(user, n, e, st.dropped)
      }
  }

  final case class Milestone(user_id: Long, milestone: Long)

  /** Arbitrary stateful processing with MULTI-ROW emission
    * (flatMapGroupsWithState): emit an alert row each time a user's
    * running event COUNT crosses a multiple of 10. Counts are
    * commutative, so the emitted multiset is independent of row order
    * within and across micro-batches — the final table is exactly the
    * batch-derivable set {(user, 10k) : k ≤ ⌊n_user/10⌋}, which
    * StreamsSpec checks. The zero-or-more-rows-per-group shape is what
    * mapGroupsWithState cannot express (alerts, session-close events,
    * change-data emission). */
  def milestoneAlerts(events: DataFrame): Dataset[Milestone] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          ((prev / 10 + 1) to (next / 10)).iterator.map(k => Milestone(user, k * 10))
      }
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-(user, event_type) running counts through the Spark 4
    * `transformWithState` StatefulProcessor API — the successor to
    * mapGroupsWithState. What it adds, and why this operator uses it:
    * the per-user state here is a MAP keyed by event_type, and
    * `MapState` supports PER-ENTRY get/update against the state store —
    * with GroupState the whole map would deserialize + reserialize as
    * one blob per key per batch, which at a 100 TB key space (users ×
    * types) turns every micro-batch into a full-state rewrite. Only the
    * types touched in this batch are read or written, and only those
    * (user, type) pairs are emitted (update-mode change feed).
    * Requires the RocksDB state store provider (StreamsSpec sets it). */
  class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), TypeCount] {
    @transient private var counts:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, ty) =>
        val cur = touched.getOrElse(ty,
          if (counts.containsKey(ty)) counts.getValue(ty) else 0L)
        touched.update(ty, cur + 1L)
      }
      touched.foreach { case (ty, n) => counts.updateValue(ty, n) }
      touched.iterator.map { case (ty, n) => TypeCount(user, ty, n) }
    }
  }

  /** The transformWithState wrapper: counts per (user, event_type) as an
    * update-mode change feed; the last emitted row per pair equals the
    * batch groupBy count (StreamsSpec proves it). */
  def typeCountsTws(events: DataFrame): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class SessionClose(user_id: Long, session_start: Long, n: Long)

  /** Session-CLOSE detector through transformWithState EVENT-TIME TIMERS —
    * the StatefulProcessor capability neither mapGroupsWithState timeouts
    * nor `session_window` aggregation expresses cleanly: emit each
    * user's session exactly once, AT the moment the watermark proves the
    * 30-minute gap (append-mode "session ended" events feeding a
    * downstream alert/archival sink). Buffered event times live in a
    * `ListState` (per-entry appends — a micro-batch touching a user
    * appends its rows without rewriting the buffer, unlike a GroupState
    * blob); the registered timer sits at the EARLIEST pending close
    * instant (min over open sessions of last-event + gap), and
    * `handleExpiredTimer` splits the sorted buffer on the gap, emits
    * every session whose close instant the watermark has passed, keeps
    * the still-open tail, and re-arms. Spark filters watermark-late rows
    * before the processor in TimeMode.EventTime, so the buffer never
    * holds a row the emitted history already accounted for. State is
    * O(events inside the watermark lag + one open session) per user;
    * emitted sessions leave the store, so a year-long stream holds hours
    * of state. StreamsSpec proves the emitted set equals batch
    * `session_window` exactly once all input is behind the watermark. */
  class SessionCloseProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), SessionClose] {
    @transient private var buf:
      org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var armed:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[Long]("buf",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    /** Sorted buffer → maximal runs split where the inter-event gap
      * reaches `gapUs` (session_window's [start, last + gap) semantics:
      * an event AT the gap boundary opens a new session). */
    private def sessions(ts: Seq[Long]): Seq[Seq[Long]] = {
      val sorted = ts.sorted
      if (sorted.isEmpty) Nil
      else sorted.tail.foldLeft(List(List(sorted.head))) { (acc, t) =>
        if (t - acc.head.head < gapUs) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }.map(_.reverse).reverse
    }

    /** Re-arm the timer at the earliest pending close instant (session
      * close times only grow, so min over open sessions is the next
      * emission the watermark can unlock). */
    private def rearm(openSessions: Seq[Seq[Long]]): Unit = {
      val prev = if (armed.exists()) Some(armed.get()) else None
      val next = openSessions.map(s => (s.last + gapUs) / 1000 + 1).minOption
      if (prev != next) {
        prev.foreach(getHandle.deleteTimer)
        next.foreach(getHandle.registerTimer)
        next match {
          case Some(t) => armed.update(t)
          case None => armed.clear()
        }
      }
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionClose] = {
      rows.foreach { case (_, t) =>
        val i = t.toInstant
        buf.appendValue(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
      rearm(sessions(buf.get().toSeq))
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionClose] = {
      val wmUs = tv.getCurrentWatermarkInMs() * 1000L
      val (closed, open) = sessions(buf.get().toSeq)
        .partition(s => s.last + gapUs <= wmUs)
      if (open.isEmpty) buf.clear()
      else if (closed.nonEmpty) buf.put(open.flatten.toArray)
      armed.clear() // this timer just fired; rearm records the next one
      rearm(open)
      closed.iterator.map(s =>
        SessionClose(user, s.head / 1000000L, s.length.toLong))
    }
  }

  /** Append-mode feed of closed 30-minute-gap sessions per user: each
    * session surfaces exactly once, when the event-time watermark passes
    * its close instant. */
  def sessionCloseTws(events: DataFrame, watermarkDelay: String): Dataset[SessionClose] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionCloseProcessor(30L * 60 * 1000000),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Stream-static join: enrich the event stream with a static
    * dimension. NO forced broadcast hint: a user-keyed dimension is
    * proportional to the user universe, not a bounded vocabulary — at
    * corpus scale a `broadcast(dim)` hint would override Catalyst's
    * size guard and collect a corpus-proportional relation to the
    * driver every micro-batch (the exact fraction-fallacy class the r9
    * scale sweep removed from five batch queries). Catalyst still
    * broadcasts automatically whenever the dimension's stats fit
    * autoBroadcastJoinThreshold, which is the right call at every
    * scale. */
  def enrichWithStatic(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, Seq("user_id"), "left")

  /** Stream-STREAM inner join with an event-time interval: purchases
    * matched to the same user's clicks within the preceding hour. Both
    * sides are watermarked and the join condition bounds event time on
    * both sides, so state for either stream can be evicted once the
    * watermark passes — the only shape at which unbounded two-stream
    * joins are feasible (state is O(window), not O(stream)). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    p.join(c,
      p("user_id") === c("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(p("user_id"), col("purchase_id"), col("click_id"),
        unix_timestamp(col("purchase_ts")).as("purchase_epoch"),
        unix_timestamp(col("click_ts")).as("click_epoch"))
  }

  /** Stream-STREAM LEFT OUTER interval join — the semantics inner joins
    * cannot give: every click appears, purchases matched within the
    * following hour where they exist, NULLs where they do not. The
    * engine-level subtlety this exists to pin: an outer-join NULL row
    * can only be emitted once the watermark proves no matching purchase
    * can still arrive — so unmatched results trail the data by the
    * watermark delay, and a test must advance the watermark past the
    * tail (a sentinel late file) before the NULLs surface. Same state
    * bound as the inner join: both sides evicted as the watermark
    * passes the interval. */
  def clickPurchaseLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("user_id"), col("click_id"),
        unix_timestamp(col("click_ts")).as("click_epoch"),
        col("purchase_id"))
  }

  /** Streaming corpus ingest with CROSS-BATCH exact dedup — the
    * streaming twin of the batch `dedup_incremental` query: every
    * micro-batch dedupes within itself (min-doc_id keeper per text
    * hash), anti-joins the persistent hash LEDGER (16 B/doc parquet —
    * the only state the steady pipeline keeps), appends the surviving
    * docs to `outDir` and their hashes to `ledgerDir`. Re-ingesting a
    * text ever seen before is a no-op; the corpus is never re-deduped.
    * foreachBatch is the standard home for this kind of transactional
    * merge logic.
    *
    * `checkpointDir` is REQUIRED and must be durable: the batch_id-keyed
    * idempotent writes below are only safe because a restarted query
    * resumes from the checkpointed batchId. Without a checkpoint Spark
    * restarts at batchId 0 and the dynamic overwrite of partition
    * `batch_id=0` would DELETE the first run's docs and ledger hashes —
    * duplicates traded for silent data loss. Both sinks carry a
    * `batch_id` partition column by contract (downstream readers of
    * `outDir` see it; it doubles as ingest provenance). */
  def dedupIngest(docs: DataFrame, ledgerDir: String, outDir: String,
                  checkpointDir: String): StreamingQuery = {
    // fail fast on a legacy FLAT-layout sink (pre-batch_id appends):
    // writing batch_id=N subdirs next to root-level parquet files makes
    // the next read see leaves at two depths and throw "Conflicting
    // directory structures" mid-stream — wedging the query one batch
    // AFTER the misconfiguration. Surface it at start() instead.
    val hconf = docs.sparkSession.sparkContext.hadoopConfiguration
    for (dir <- Seq(outDir, ledgerDir)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val dfs = p.getFileSystem(hconf)
      if (dfs.exists(p)) {
        val flat = dfs.listStatus(p).filter(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
        require(flat.isEmpty,
          s"$dir holds flat (un-partitioned) parquet from a pre-batch_id " +
            s"layout — migrate it into a batch_id=<n> subdirectory (or point " +
            s"the sink at a fresh path) before starting dedupIngest")
      }
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // NULL text gets a per-doc surrogate key: md5(null) is null, and
        // null keys match nothing in the keeper self-join or the ledger
        // anti-join — such docs would VANISH from the corpus with no
        // error channel. SQL semantics (null ≠ null) say null texts
        // dedup against nothing, so each survives under its own key.
        val hashed = batch.withColumn("text_md5",
          coalesce(md5(col("text")),
            concat(lit("null:"), col("doc_id").cast("string"))))
        // within-batch keeper: deterministic min doc_id per hash. The
        // trailing dropDuplicates matters under at-least-once UPSTREAMS:
        // a producer retry can deliver the keeper row itself twice in
        // one micro-batch, and both copies match the (text_md5, doc_id)
        // keeper join — without the collapse they would BOTH land in
        // the corpus, permanently (the ledger stores only hashes, so
        // no later batch can evict them). Gate-blind by construction:
        // exactly one row per hash survives here, whatever arrived.
        val keepers = hashed.join(
            hashed.groupBy("text_md5").agg(min(col("doc_id")).as("doc_id")),
            Seq("text_md5", "doc_id"))
          .dropDuplicates("text_md5")
        val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
        val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // "ledger has prior data" must mean ACTUAL batch_id= partition
        // directories, not "any file": an EMPTY first micro-batch (a
        // stream started before data arrives) writes a _SUCCESS-only
        // root, and a bare listStatus.nonEmpty guard would then send the
        // next batch into spark.read.parquet on a partition-less
        // directory — an AnalysisException the checkpointed replay
        // reproduces forever, wedging the query.
        val ledgerHasData =
          fs.exists(ledgerPath) && fs.listStatus(ledgerPath).exists(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        val fresh =
          (if (ledgerHasData)
             // PRIOR batches only: a retry must not anti-join against its
             // own (possibly PARTIALLY committed) ledger partition — a
             // half-visible batch_id=N ledger would shrink the replayed
             // `fresh`, and the overwrite below would then replace the
             // complete batch_id=N docs partition with the subset whose
             // hashes had NOT landed: silent data loss. Excluding the
             // current batchId makes the replay recompute BOTH partitions
             // from scratch (partition pruning keeps the read cheap).
             keepers.join(
               spark.read.parquet(ledgerDir)
                 .filter(col("batch_id") =!= lit(batchId))
                 .select("text_md5"),
               Seq("text_md5"), "left_anti")
           else keepers)
            .localCheckpoint() // read twice below; also decouples from the batch source
        // foreachBatch is at-least-once: a retry after one of the two
        // writes succeeded would duplicate docs (or permanently
        // blacklist texts whose doc rows never landed). Key BOTH writes
        // by batch_id with dynamic partition overwrite — each replay
        // regenerates exactly its own two partitions in full from the
        // prior-batch ledger state, so every retry interleaving
        // converges to the same complete partitions.
        writeBatchPartition(fresh.drop("text_md5"), outDir, batchId)
        writeBatchPartition(fresh.select("text_md5"), ledgerDir, batchId)
      }
      .start()
  }

  /** Offline maintenance for [[dedupIngest]]'s hash ledger: fold every
    * `batch_id=N` partition into ONE consolidated `batch_id=-1` base.
    * A long-lived stream creates one ledger partition per micro-batch
    * forever — sub-minute triggers mean 10⁵–10⁶ tiny partition
    * directories per year, so every batch's anti-join pays an
    * O(#batches) driver-side listing that grows with stream age, and
    * `Maintenance.compactParquet` refuses partitioned roots by contract.
    * This is the ledger-shaped compactor: distinct hashes, one
    * partition, same atomic retire-and-swap posture as compactParquet.
    *
    * Run ONLY with the stream STOPPED and its last batch fully
    * committed (the same quiesced contract as compacting the doc sink).
    * Correctness across restart: real batchIds are non-negative, so the
    * anti-join's `batch_id =!= currentBatch` filter always keeps the
    * -1 base visible, and a replayed batch's dynamic overwrite touches
    * only its own non-negative partition — the base is never rewritten
    * by the stream. Repeated compactions fold the base into itself.
    * Returns (partitions before, distinct hashes). */
  def compactLedger(spark: SparkSession, ledgerDir: String): (Int, Long) = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no ledger at $ledgerDir")
    val parts = fs.listStatus(p).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    require(parts.nonEmpty, s"$ledgerDir holds no batch_id= partitions")
    val staging = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.compacting")
    val retired = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.pre-compact")
    require(!fs.exists(retired),
      s"$retired already exists — a previous compaction's rollback copy; " +
        "inspect and remove it before compacting again")
    if (fs.exists(staging)) fs.delete(staging, true) // dead prior attempt
    val consolidated = spark.read.parquet(ledgerDir)
      .select(col("text_md5")).distinct()
      .withColumn("batch_id", lit(-1L))
    consolidated.write.mode("overwrite")
      .partitionBy("batch_id").parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()
    require(fs.rename(p, retired),
      s"could not retire $ledgerDir — ledger untouched, staged copy at $staging")
    if (!fs.rename(staging, p)) {
      val rolledBack = fs.rename(retired, p)
      throw new IllegalStateException(
        if (rolledBack)
          s"could not swap staging into $ledgerDir — original rolled back, staging left at $staging"
        else
          s"could not swap staging into $ledgerDir AND rollback failed — ledger is at $retired")
    }
    (parts.length, n)
  }

  /** Per-window top-k ("trending") via the append-mode + rank-at-sink
    * pattern. A rank is not incrementally maintainable inside a
    * streaming aggregation — but it doesn't need to be: a watermarked
    * windowed count in APPEND mode emits every group of a window in the
    * single micro-batch whose watermark closes that window, so ranking
    * the appended rows per window inside foreachBatch is exact and
    * final. State is bounded by the watermark (closed windows are
    * evicted); the per-batch rank runs over |closed windows|·|types|
    * rows, never the stream.
    *
    * `checkpointDir` is REQUIRED and must be durable for the same reason
    * as [[dedupIngest]]: the batch_id-keyed idempotent write is only
    * safe while batchIds are monotonic — a checkpoint-less restart
    * re-begins at batchId 0 and its dynamic overwrite would DELETE the
    * first run's closed windows. */
  def trendingTypes(events: DataFrame, k: Int, outDir: String,
                    checkpointDir: String): StreamingQuery = {
    val counts = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"))
    counts.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_start")).orderBy(desc("n"), col("event_type"))
        // foreachBatch is at-least-once: a micro-batch whose sink write
        // finished but whose checkpoint commit didn't will RE-RUN on
        // restart. A bare append would duplicate the closed windows, so
        // the write is keyed by batch_id with dynamic partition
        // overwrite — the retry replaces exactly its own partition,
        // making the sink idempotent (the standard foreachBatch recipe).
        writeBatchPartition(
          batch.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k),
          outDir, batchId)
      }
      .start()
  }

  /** THE idempotent micro-batch sink write, shared by every foreachBatch
    * sink in this file: the rows land under `batch_id=<id>` with dynamic
    * partition overwrite, so an at-least-once replay replaces exactly
    * its own partition and nothing else. One implementation — the
    * committer options and partition-column contract cannot drift
    * between sinks. */
  private def writeBatchPartition(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** Row-local MinHash signature key shared by both near-dup filter
    * arms: THE batch kernel ([[graft.ops.TextOps.minhashVector]] — one
    * implementation, so the streaming keys can never drift from the
    * batch signatures) over 3-shingles, no shuffle. Docs under 3 words
    * have no shingles and get a per-row `short:<id>` key so a FILTER
    * never silently loses rows it cannot fingerprint. */
  private def sigKey(id: Long, text: String,
                     fam: Array[(Long, Long)]): String =
    graft.ops.TextOps.minhashVector(text, 3, fam)
      .map(_.mkString(",")).getOrElse(s"short:$id")

  /** Ingestion-time near-dup filter — the streaming arm of the dedup
    * north star: each arriving document's 16-hash MinHash signature
    * (row-local kernel, no shuffle) is its dedup key; the first doc
    * carrying a signature survives, later collisions drop.
    *
    * STATE IS UNBOUNDED here by SEMANTIC intent (ever-seen corpus dedup
    * = one state row per distinct signature forever). That is NOT the
    * declared scale path for ingestion: at 100 TB use either
    * [[nearDupFilterBounded]] (watermark horizon, state evicted as
    * event time passes — the config-first answer) or the foreachBatch
    * hash-ledger posture of `dedup_incremental` (the ever-seen set
    * lives in a compacted parquet ledger anti-joined per batch, not in
    * the state store). Keep this variant for finite replays and tests.
    *
    * That scope is enforced IN CODE, not just documented: starting this
    * on a STREAMING input requires the explicit opt-in conf
    * `spark.graft.nearDupFilter.unboundedState=true` — without it the
    * call throws at plan time, pointing at [[nearDupFilterBounded]], so
    * the ever-growing state store cannot be wired into a production
    * ingest silently. Batch inputs (the oracle arm) need no opt-in:
    * a batch dropDuplicates holds no cross-batch state. */
  def nearDupFilter(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (docs.isStreaming) {
      val optIn = spark.conf
        .getOption("spark.graft.nearDupFilter.unboundedState")
        .exists(_.equalsIgnoreCase("true"))
      require(optIn,
        "nearDupFilter keeps one state-store row per distinct signature " +
          "FOREVER — on an unbounded stream that is a state leak, not a " +
          "dedup. Use nearDupFilterBounded (watermark-horizon state) or " +
          "the dedup_incremental foreachBatch hash ledger for ingestion; " +
          "for a finite replay or test, opt in explicitly with " +
          "spark.graft.nearDupFilter.unboundedState=true.")
    }
    val fam = graft.ops.TextOps.minhashFamily(16).toArray
    // one TOTAL typed map (a stream cannot self-join its signature
    // relation back without event-time bounds): every row gets a key in
    // the same pass, short docs keyed by id. The text RIDES THROUGH —
    // a filter whose survivors lose their payload is useless to the
    // next stage, and in a stream there is no second chance to join it
    // back.
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      // a null doc_id cannot ride the non-nullable Long encoder — one
      // broken row must degrade to a drop (the SimilarityOps dirty-row
      // convention), not kill the long-running streaming query. Null
      // TEXT survives: minhashVector fingerprints it as None → short-key.
      .where(col("doc_id").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, text, sigKey(id, text, fam)) }
      }
      .toDF("doc_id", "text", "sig_key")
      .dropDuplicates("sig_key")
  }

  /** Bounded-state near-dup filter — the DECLARED ingestion-scale path.
    * Same row-local signature kernel, but the state store only retains
    * signatures inside the watermark horizon: a signature row is
    * evicted once `eventTimeCol` falls `delay` behind the stream's
    * frontier, so state size is bounded by (ingest rate × horizon)
    * instead of corpus cardinality. Duplicates arriving WITHIN the
    * horizon drop exactly like [[nearDupFilter]]; a re-submission after
    * the horizon passes again — that is the contract of a bounded
    * dedup window (the ever-seen semantics belong to the
    * `dedup_incremental` hash ledger, not the state store). */
  def nearDupFilterBounded(docs: DataFrame, eventTimeCol: String,
                           delay: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fam = graft.ops.TextOps.minhashFamily(16).toArray
    docs.select(col("doc_id").cast("long"), col("text").cast("string"),
        col(eventTimeCol).cast("timestamp").as("ingest_ts"))
      // same dirty-row rule as nearDupFilter: null id (or null event
      // time, which cannot be watermarked) drops instead of crashing
      .where(col("doc_id").isNotNull && col("ingest_ts").isNotNull)
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.map { case (id, text, ts) =>
          (id, text, ts, sigKey(id, text, fam))
        }
      }
      .toDF("doc_id", "text", "ingest_ts", "sig_key")
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("sig_key")
  }

  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    q.processAllAvailable()
    q
  }
}
