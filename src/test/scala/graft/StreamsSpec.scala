package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch equivalence: each streaming shape over the fixture events
  * must converge to the same result as the equivalent batch query once
  * all source data is processed. */
class StreamsSpec extends SparkSpec {

  // the file stream source tails a DIRECTORY (the deploy shape); stage the
  // fixture file into one
  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }
  private def batchEvents = Tables.events(spark, "/root/testdata/sf0.001")

  test("streaming tumbling window == batch window aggregation") {
    val q = Streams.runToMemory(
      Streams.tumblingCounts(Streams.readEvents(spark, path)),
      "stream_tumbling", OutputMode.Complete())
    try {
      val streamed = spark.table("stream_tumbling")
        .orderBy("window_start", "event_type").collect()
      val batch = batchEvents
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.ops.Money.centsSum(col("value")).as("total"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming session windows == batch session windows") {
    val q = Streams.runToMemory(
      Streams.sessionCounts(Streams.readEvents(spark, path)),
      "stream_sessions", OutputMode.Complete())
    try {
      val streamed = spark.table("stream_sessions")
        .orderBy("user_id", "session_start").collect()
      val batch = batchEvents
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
          col("n"))
        .orderBy("user_id", "session_start").collect()
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming dedup-within-watermark emits one row per key") {
    val q = Streams.runToMemory(
      Streams.dedupWithinWatermark(Streams.readEvents(spark, path)),
      "stream_dedup", OutputMode.Append())
    try {
      val streamed = spark.table("stream_dedup")
      val nKeys = batchEvents.select("user_id", "event_type").distinct().count()
      assert(streamed.count() === nKeys)
      assert(streamed.select("user_id", "event_type").distinct().count() === nKeys)
    } finally q.stop()
  }

  test("stream-static join enriches events with a broadcast dimension") {
    val dim = batchEvents.select("user_id").distinct()
      .withColumn("tier", when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val q = Streams.runToMemory(
      Streams.enrichWithStatic(
        Streams.readEvents(spark, path).select("event_id", "user_id"), dim),
      "stream_enriched", OutputMode.Append())
    try {
      val got = spark.table("stream_enriched")
      assert(got.count() === batchEvents.count())
      assert(got.filter(col("tier").isNull).count() === 0)
      assert(got.filter(col("user_id") % 2 === 0 && col("tier") =!= "even").count() === 0)
    } finally q.stop()
  }

  test("mapGroupsWithState running stats converge to batch groupBy") {
    val q = Streams.runToMemory(
      Streams.statefulUserStats(Streams.readEvents(spark, path)).toDF(),
      "stream_state", OutputMode.Update())
    try {
      // update mode emits one row per key per micro-batch — the LAST row
      // per key is the converged state
      val finalState = spark.table("stream_state")
        .withColumn("ord", monotonically_increasing_id())
        .groupBy("user_id").agg(max_by(struct(col("n"), col("total")), col("ord")).as("s"))
        .select(col("user_id"), col("s.n").as("n"),
          round(col("s.total"), 2).as("total"))
        .orderBy("user_id").collect()
      val batch = batchEvents.groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("user_id").collect()
      assert(finalState.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("transformWithState MapState change feed converges to batch groupBy (RocksDB store)") {
    // transformWithState requires the RocksDB state store provider; set
    // it for this query and restore so the rest of the suite keeps the
    // default HDFS-backed provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streams.runToMemory(
        Streams.typeCountsTws(Streams.readEvents(spark, path)).toDF(),
        "stream_tws", OutputMode.Update())
      try {
        // update-mode change feed: last emitted row per (user, type) is
        // the converged count
        val finalState = spark.table("stream_tws")
          .withColumn("ord", monotonically_increasing_id())
          .groupBy("user_id", "event_type")
          .agg(max_by(col("n"), col("ord")).as("n"))
          .orderBy("user_id", "event_type").collect()
        val batch = batchEvents.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("user_id", "event_type").collect()
        assert(finalState.toSeq === batch.toSeq)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time timers emit each closed session exactly once (RocksDB store)") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // time-ordered quantile slices: each micro-batch advances the
      // watermark past the previous slice, so earlier sessions close
      // MID-STREAM through timer expiry — the timer path runs four
      // times, not once at a final flush
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_sess_tws")
      val raw = spark.read.schema(Streams.eventsRawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
      // slice in the epoch-micros domain (ts on disk is TIMESTAMP_NTZ;
      // quantiles need a numeric column)
      val rawM = raw.withColumn("tsm", unix_micros(col("ts").cast("timestamp")))
      val qs = rawM.stat.approxQuantile("tsm", Array(0.25, 0.5, 0.75), 0.0)
      val bounds = Seq(Long.MinValue) ++ qs.map(_.toLong) ++ Seq(Long.MaxValue)
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        rawM.filter(col("tsm") >= lo && col("tsm") < hi).drop("tsm").coalesce(1)
          .write.mode("append").parquet(dir.toString)
      }
      val q = Streams.runToMemory(
        Streams.sessionCloseTws(Streams.readEvents(spark, dir.toString), "1 hour").toDF(),
        "stream_sess_tws", OutputMode.Append())
      try {
        q.processAllAvailable()
        val midStream = spark.table("stream_sess_tws").count()
        assert(midStream > 0, "no session closed before the end of input — timers untested")
        // a far-future sentinel (user -1) drags the watermark past every
        // real close instant; its own session stays open and unemitted
        val maxMicros = raw
          .agg(max(unix_micros(col("ts").cast("timestamp"))))
          .collect().head.getLong(0)
        Seq((-1L, maxMicros + 30L * 86400 * 1000000L, -1L, "view", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
          .coalesce(1).write.mode("append").parquet(dir.toString)
        q.processAllAvailable()
        val got = spark.table("stream_sess_tws").filter(col("user_id") >= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val expected = batchEvents
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
            col("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got.sorted === expected.sorted)
        assert(got.length === got.distinct.length, "a session was emitted twice")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("flatMapGroupsWithState emits one alert per count milestone (multi-row stateful)") {
    val q = Streams.runToMemory(
      Streams.milestoneAlerts(Streams.readEvents(spark, path)).toDF(),
      "stream_milestones", OutputMode.Append())
    try {
      val got = spark.table("stream_milestones")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = batchEvents.groupBy("user_id").count().collect()
        .flatMap { r =>
          val (u, n) = (r.getLong(0), r.getLong(1))
          (1L to n / 10).map(k => (u, k * 10))
        }.toSet
      assert(got === expected)
      assert(expected.nonEmpty) // the fixture actually exercises emission
    } finally q.stop()
  }

  test("foreachBatch sink writes micro-batches to parquet (the production sink shape)") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val q = Streams.readEvents(spark, path)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // arbitrary batch sink: parquet append keyed by batch id — at
        // scale this is where MERGE/upsert or exactly-once bookkeeping
        // lives
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(outDir)
      assert(written.count() === batchEvents.count())
      assert(written.columns.contains("batch_id"))
    } finally q.stop()
  }

  test("streaming ingest dedupes across micro-batches via the hash ledger") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ingest_src")
    val ledger = java.nio.file.Files.createTempDirectory("graft_ingest_ledger").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(name))
    }
    // batch 1: a within-batch duplicate (ids 1,2 same text)
    stage("a.parquet", Seq(1L -> "alpha text", 2L -> "alpha text", 3L -> "beta text"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    def start() = Streams.dedupIngest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      ledger, outDir, ckpt)
    val q = start()
    try {
      q.processAllAvailable()
      // batch 2: one repeat of batch 1, one new text, one internal dup
      stage("b.parquet", Seq(4L -> "alpha text", 5L -> "gamma text", 6L -> "gamma text"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
      // survivors: min-id keeper per first-seen text, nothing re-admitted
      assert(out === Seq(1L, 3L, 5L))
      val ledgerHashes = spark.read.parquet(ledger).collect().map(_.getString(0))
      assert(ledgerHashes.length === 3 && ledgerHashes.distinct.length === 3)
      // maintenance integration: the sink is batch_id-partitioned (the
      // idempotent-retry layout), so compaction targets one partition
      // directory at a time — compactParquet refuses a partitioned root
      // by contract. Stream STOPPED for this sink; content and the
      // dedup ledger are untouched by the rewrite
      q.stop()
      val part0 = new java.io.File(outDir).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.head
      val report = graft.ops.Maintenance.compactParquet(
        spark, s"$outDir/$part0", "doc_id")
      assert(report.filesAfter <= report.filesBefore && report.rows >= 1L)
      val recheck = spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
      assert(recheck === Seq(1L, 3L, 5L), "compaction changed sink content")
      // RESTART with the same durable checkpoint: batchIds must resume
      // past the processed batches, so the new batch's dynamic overwrite
      // lands in a FRESH batch_id partition — a restart that re-began at
      // batchId 0 would silently overwrite (delete) batch 1's docs and
      // ledger hashes, which is exactly what this pins against
      stage("c.parquet", Seq(7L -> "delta text", 8L -> "alpha text"))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val afterRestart = spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
      assert(afterRestart === Seq(1L, 3L, 5L, 7L),
        "restart must extend the corpus, not overwrite earlier batches")
      assert(spark.read.parquet(ledger).collect().map(_.getString(0))
        .distinct.length === 4)
    } finally q.stop()
  }

  test("dedupIngest survives an empty first micro-batch (stream up before data)") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_eb_src")
    val ledger = java.nio.file.Files.createTempDirectory("graft_eb_ledger").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_eb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eb_ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_eb_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(name))
    }
    // batch 0 carries ZERO rows: its dynamic-overwrite writes create a
    // _SUCCESS-only ledger root. The prior-ledger guard must read that as
    // "no prior data" — an any-file guard sent batch 1 into
    // spark.read.parquet on a partition-less directory, an
    // AnalysisException the checkpointed replay reproduces forever.
    stage("empty.parquet", Seq.empty)
    val q = Streams.dedupIngest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      ledger, outDir, ckpt)
    try {
      q.processAllAvailable()
      stage("a.parquet", Seq(1L -> "alpha text", 2L -> "alpha text", 3L -> "beta text"))
      q.processAllAvailable() // wedged here before the fix
      val out = spark.read.parquet(outDir).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(out === Seq(1L, 3L))
    } finally q.stop()
  }

  test("dedupIngest refuses a legacy flat-layout sink instead of wedging mid-stream") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_flat_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_flat_out").toString
    val ledger = java.nio.file.Files.createTempDirectory("graft_flat_led").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_flat_ckpt").toString
    // a pre-batch_id deployment: root-level parquet files, no partition dirs
    Seq(1L -> "old text").toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val e = intercept[IllegalArgumentException] {
      Streams.dedupIngest(stream, ledger, outDir, ckpt)
    }
    assert(e.getMessage.contains("pre-batch_id"))
  }

  test("streaming per-window top-k == batch rank over closed windows") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_trending").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_trending_ckpt").toString
    val q = Streams.trendingTypes(Streams.readEvents(spark, path), 2, outDir, ckpt)
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(outDir)
        .orderBy("window_start", "rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      // batch oracle: same count + rank, restricted to windows the final
      // watermark (max ts - 1h) closed — append mode emits only those
      val maxTs = batchEvents.agg(max(unix_timestamp(col("ts")))).head.getLong(0)
      val closed = (maxTs - 3600) / 3600 * 3600 // watermark, floored to window grid
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("window_start")).orderBy(desc("n"), col("event_type"))
      val batch = batchEvents
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n"))
        .filter(col("window_start") + 3600 <= closed)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .orderBy("window_start", "rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join == batch interval join") {
    val q = Streams.runToMemory(
      Streams.clickPurchaseJoin(
        Streams.readEvents(spark, path), Streams.readEvents(spark, path)),
      "stream_ss_join", OutputMode.Append())
    try {
      val streamed = spark.table("stream_ss_join")
        .orderBy("purchase_id", "click_id").collect()
      val c = batchEvents.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val batch = batchEvents.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"), col("value"))
        .join(c, col("user_id") === col("cu") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          unix_timestamp(col("purchase_ts")).as("purchase_epoch"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .orderBy("purchase_id", "click_id").collect()
      assert(streamed.nonEmpty)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly-once (file-source offsets + file-sink metadata log)") {
    // the production crash-recovery contract: a NEW query started on the
    // SAME checkpoint must skip everything the dead query committed and
    // pick up only files that arrived after — no row lost, none doubled.
    // Both halves matter: the source checkpoint holds the processed-file
    // log; the parquet sink's _spark_metadata commit log makes partially
    // written batches invisible to readers.
    val mk = () => java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (srcDir, outDir, ckptDir) = (mk(), mk(), mk())
    val raw = spark.read.schema(Streams.eventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val total = raw.count()
    def start() = spark.readStream
      .schema(Streams.eventsRawSchema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .start()
    raw.filter(col("event_id") % 2 === 0).write.mode("append").parquet(srcDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    raw.filter(col("event_id") % 2 === 1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() === total, "every event exactly once after restart")
    assert(out.select("event_id").distinct().count() === total,
      "no event processed twice across the restart")
  }

  // driver-side replica of the EWMA fold: same (ts, value) sort, same
  // IEEE arithmetic → the streaming result must match BIT-FOR-BIT
  private def ewmaBatchOracle(alpha: Double): Map[Long, (Long, Double)] =
    batchEvents
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, es) =>
        val sorted = es.map(e => (e._2, e._3)).sorted
        val ewma = sorted.drop(1).foldLeft(sorted.head._2) {
          case (e, (_, v)) => (1 - alpha) * e + alpha * v
        }
        u -> (es.length.toLong, ewma)
      }

  test("streaming ordered-fold EWMA == batch fold under shuffled arrival (nothing commits)") {
    // event_id slicing scatters each user's events across 4 micro-batches
    // in arbitrary time order; a 365-day watermark keeps every event
    // buffered, so the snapshot path must reproduce the recurrence alone
    val multiPath = {
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_ewma")
      val raw = spark.read.schema(Streams.eventsRawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
      (0 until 4).foreach { k =>
        raw.filter(col("event_id") % 4 === k).coalesce(1)
          .write.mode("append").parquet(dir.toString)
      }
      dir.toString
    }
    val q = Streams.runToMemory(
      Streams.ewmaOrderedFold(
        Streams.readEvents(spark, multiPath), 0.2, "365 days").toDF(),
      "stream_ewma_shuffled", OutputMode.Update())
    try {
      val got = lastSnapshotPerUser("stream_ewma_shuffled")
      assert(got === ewmaBatchOracle(0.2))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming ordered-fold EWMA == batch fold with advancing watermark (commit path)") {
    // time-ordered slices: each micro-batch advances the watermark past
    // the previous batch's events, so earlier prefixes genuinely COMMIT
    // into the recurrence and the buffer stays bounded by the lag
    val orderedPath = {
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_ewma_ord")
      val raw = spark.read.schema(Streams.eventsRawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
      val rawM = raw.withColumn("tsm", unix_micros(col("ts").cast("timestamp")))
      val qs = rawM.stat.approxQuantile("tsm", Array(0.25, 0.5, 0.75), 0.0)
      val bounds = Seq(Long.MinValue) ++ qs.map(_.toLong) ++ Seq(Long.MaxValue)
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        rawM.filter(col("tsm") >= lo && col("tsm") < hi).drop("tsm").coalesce(1)
          .write.mode("append").parquet(dir.toString)
      }
      dir.toString
    }
    val q = Streams.runToMemory(
      Streams.ewmaOrderedFold(
        Streams.readEvents(spark, orderedPath), 0.2, "1 hour").toDF(),
      "stream_ewma_ordered", OutputMode.Update())
    try {
      val got = lastSnapshotPerUser("stream_ewma_ordered")
      assert(got === ewmaBatchOracle(0.2))
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming EWMA drops (and counts) rows behind the committed frontier") {
    import spark.implicits._
    // time-ordered slices commit prefixes and advance the frontier …
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ewma_late")
    val raw = spark.read.schema(Streams.eventsRawSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val rawM = raw.withColumn("tsm", unix_micros(col("ts").cast("timestamp")))
    val qs = rawM.stat.approxQuantile("tsm", Array(0.5), 0.0)
    Seq((col("tsm") < qs(0).toLong), (col("tsm") >= qs(0).toLong)).foreach { pred =>
      rawM.filter(pred).drop("tsm").coalesce(1).write.mode("append").parquet(dir.toString)
    }
    val q = Streams.runToMemory(
      Streams.ewmaOrderedFold(
        Streams.readEvents(spark, dir.toString), 0.2, "1 hour").toDF(),
      "stream_ewma_late", OutputMode.Update())
    try {
      q.processAllAvailable()
      // … then a straggler lands BEHIND the frontier: it must be dropped
      // and counted, never folded out of order into the recurrence
      val victim = raw.select(min("user_id")).collect().head.getLong(0)
      val ancient = raw
        .agg(min(unix_micros(col("ts").cast("timestamp"))))
        .collect().head.getLong(0) - 10L * 86400 * 1000000L
      Seq((-99L, ancient, victim, "view", 999.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val last = spark.table("stream_ewma_late")
        .filter(col("user_id") === victim)
        .withColumn("ord", monotonically_increasing_id())
        .orderBy(desc("ord")).limit(1)
        .collect().head
      assert(last.getLong(3) === 1L, "late row not counted as dropped")
      val (expN, expE) = ewmaBatchOracle(0.2)(victim)
      assert(last.getLong(1) === expN && last.getDouble(2) === expE,
        "late row corrupted the recurrence instead of being dropped")
    } finally q.stop()
  }

  test("streaming near-dup filter: later signature collisions drop, short docs pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_neardup")
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    base.coalesce(1).write.mode("append").parquet(dir.toString)
    // batch arm of the same function = expected survivor count for slice 1
    val expected = Streams.nearDupFilter(base).count()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // the unbounded-state variant requires an explicit opt-in on
    // streaming input (VERDICT r10 #7) — without it, plan-time refusal
    // pointing at the bounded path, so a production ingest cannot wire
    // in the ever-growing state store by accident
    val refused = intercept[IllegalArgumentException] {
      Streams.nearDupFilter(stream)
    }
    assert(refused.getMessage.contains("nearDupFilterBounded"))
    spark.conf.set("spark.graft.nearDupFilter.unboundedState", "true")
    val q = try Streams.runToMemory(Streams.nearDupFilter(stream),
      "stream_neardup", OutputMode.Append())
    finally spark.conf.unset("spark.graft.nearDupFilter.unboundedState")
    try {
      q.processAllAvailable()
      assert(spark.table("stream_neardup").count() === expected)
      // a LATER micro-batch re-submits an existing text under a new id
      // (must drop against the signature state) plus a 2-word doc (no
      // shingles — must pass on its id key, never silently vanish)
      val dupText = base.orderBy("doc_id").limit(1).collect().head.getString(1)
      // plus dirty rows: a NULL text must pass on its short:<id> key
      // (minhashVector fingerprints null as None) and a NULL doc_id must
      // drop — neither may kill the long-running query
      Seq(Some(-5L) -> Some(dupText), Some(-6L) -> Some("one two"),
          Some(-7L) -> (None: Option[String]), (None: Option[Long]) -> Some("x y z w"))
        .map { case (id, t) => (id, t) }
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val ids = spark.table("stream_neardup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(-5L), "signature collision must be dropped")
      assert(ids.contains(-6L), "short doc must pass through")
      assert(ids.contains(-7L), "null-text doc must pass on its id key")
      // batch-2 survivors: the short doc AND the null-text doc; the dup
      // and the null-id row are dropped
      assert(spark.table("stream_neardup").count() === expected + 2)
    } finally q.stop()
  }

  test("bounded near-dup filter: dups drop within horizon, state evicts past it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = in.toDF.toDF("doc_id", "text", "ingest_ts")
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    // batch 1: 8 unique docs + 1 near-dup of textA + 1 short doc, all near t=0
    val uniques = (10L to 16L).map(i =>
      (i, s"unique document number $i with plenty of distinct words $i$i", ts(1)))
    in.addData(Seq((1L, textA, ts(0)), (2L, textA, ts(1)), (3L, "one two", ts(1))) ++ uniques: _*)
    val q = Streams.runToMemory(
      Streams.nearDupFilterBounded(df, "ingest_ts", "10 minutes"),
      "stream_neardup_bounded", OutputMode.Append())
    try {
      val ids1 = spark.table("stream_neardup_bounded")
        .select("doc_id").as[Long].collect().toSet
      assert(ids1.contains(1L), "first doc of a signature must survive")
      assert(!ids1.contains(2L), "within-horizon signature collision must drop")
      assert(ids1.contains(3L), "short doc must pass on its id key")
      assert(uniques.forall(u => ids1.contains(u._1)))
      // batch 2 advances the event-time frontier far past the horizon …
      in.addData((20L, "frontier advancing document with fresh words", ts(60)))
      q.processAllAvailable()
      // … so batch 3's re-submission of textA finds its state EVICTED:
      // it passes again — the bounded-horizon contract (ever-seen
      // semantics belong to the dedup_incremental hash ledger)
      in.addData((21L, textA, ts(61)))
      q.processAllAvailable()
      val ids3 = spark.table("stream_neardup_bounded")
        .select("doc_id").as[Long].collect().toSet
      assert(ids3.contains(21L),
        "signature re-submitted after the watermark horizon must pass again")
      // the state store only holds in-horizon signatures, not the
      // ever-seen corpus: 10 distinct keys were seen before the frontier
      // moved, but only the 2 recent ones may remain
      val p = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no state operator progress recorded"))
      val stateRows = p.stateOperators.head.numRowsTotal
      assert(stateRows <= 3,
        s"state must be bounded by the horizon, found $stateRows rows")
    } finally q.stop()
  }

  private def lastSnapshotPerUser(table: String): Map[Long, (Long, Double)] =
    spark.table(table)
      .withColumn("ord", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max_by(struct(col("n"), col("ewma")), col("ord")).as("s"))
      .collect().map { r =>
        val s = r.getStruct(1)
        r.getLong(0) -> (s.getLong(0), s.getDouble(1))
      }.toMap

  test("stream-stream LEFT OUTER interval join == batch left join once the watermark passes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_louter")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Streams.runToMemory(
      Streams.clickPurchaseLeftOuter(
        Streams.readEvents(spark, dir.toString), Streams.readEvents(spark, dir.toString)),
      "stream_louter", OutputMode.Append())
    try {
      q.processAllAvailable()
      // outer NULL rows cannot exist yet: the watermark still sits inside
      // the data. A far-future sentinel (click + purchase, user -1)
      // advances BOTH sides' watermarks past every real interval.
      val maxMicros = spark.read.schema(Streams.eventsRawSchema)
        .parquet(dir.resolve("events.parquet").toString)
        .agg(max(unix_micros(col("ts").cast("timestamp"))))
        .collect().head.getLong(0)
      val far = maxMicros + 30L * 86400 * 1000000L
      Seq((-1L, far, -1L, "click", 0.0, "{}"),
          (-2L, far, -1L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val got = spark.table("stream_louter").filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSet
      val c = batchEvents.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val p = batchEvents.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
      val expected = c.join(p,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
          "left")
        .select(col("user_id"), col("click_id"),
          unix_timestamp(col("click_ts")).as("click_epoch"), col("purchase_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got === expected)
      assert(got.exists(_._4.isEmpty), "no unmatched clicks — outer semantics unexercised")
      assert(got.exists(_._4.nonEmpty), "no matched clicks — join unexercised")
    } finally q.stop()
  }

  test("streaming funnel state machine == batch funnel, across out-of-order micro-batches") {
    // 4 interleaved slices → 4 files → 4 micro-batches; slicing by
    // event_id scatters each user's events (and their time order) across
    // batches, so late-arriving EARLIER views genuinely occur and the
    // state machine's window-rewind logic is exercised, not just replayed
    val multiPath = {
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_funnel")
      val raw = spark.read.schema(Streams.eventsRawSchema)
        .parquet("/root/testdata/sf0.001/events.parquet")
      (0 until 4).foreach { k =>
        raw.filter(col("event_id") % 4 === k).coalesce(1)
          .write.mode("append").parquet(dir.toString)
      }
      dir.toString
    }
    val (wClick, wBuy) = (86400L * 1000000L, 259200L * 1000000L)
    val q = Streams.runToMemory(
      Streams.funnelStages(Streams.readEvents(spark, multiPath), wClick, wBuy).toDF(),
      "stream_funnel", OutputMode.Update())
    try {
      val got = spark.table("stream_funnel")
        .withColumn("ord", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max_by(struct(col("t_view"), col("t_click"), col("t_purchase")),
          col("ord")).as("s"))
        .collect().map { r =>
          val s = r.getStruct(1)
          r.getLong(0) -> (Option(s.get(0)), Option(s.get(1)), Option(s.get(2)))
        }.toMap
      // driver-side batch oracle: order-insensitive min/window derivation
      val byUser = batchEvents
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(_._1)
      val expected = byUser.map { case (u, es) =>
        val tv = es.filter(_._2 == "view").map(_._3).minOption
        val tc = tv.flatMap(v =>
          es.filter(e => e._2 == "click" && e._3 > v && e._3 <= v + wClick)
            .map(_._3).minOption)
        val tb = tc.flatMap(c =>
          es.filter(e => e._2 == "purchase" && e._3 > c && e._3 <= c + wBuy)
            .map(_._3).minOption)
        u -> (tv.map(x => x: Any), tc.map(x => x: Any), tb.map(x => x: Any))
      }
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("watermarked funnel drops late rows explicitly — a late view cannot " +
      "arrive after its candidate clicks were pruned (ADVICE r11 #1)") {
    // The no-view prune discards clicks/buys at or below the watermark on
    // the theorem "any still-unseen view arrives ABOVE the watermark".
    // mapGroupsWithState under NoTimeout does NOT filter late input
    // (Spark only does so under EventTimeTimeout), so without the
    // explicit in-fold drop a watermark-late view WOULD enter after its
    // candidates were pruned, yielding a torn snapshot (view set, click
    // silently lost). Three hand-sequenced micro-batches build exactly
    // that schedule and assert the late view is refused outright.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_wm")
    val base = 946684800L * 1000000L // 2000-01-01, micros
    def stage(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.map { case (id, tUs, u, ty) => (id, tUs, u, ty, 0.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
        .coalesce(1).write.mode("append").parquet(dir.toString)
    val (wClick, wBuy) = (86400L * 1000000L, 259200L * 1000000L)
    val sec = 1000000L
    // batch 1: user 1 clicks+buys (no view yet); user 99 far ahead, so
    // the post-batch watermark (max ts − 10 min) passes user 1's events
    stage(Seq((1L, base + 1000 * sec, 1L, "click"),
      (2L, base + 1500 * sec, 1L, "purchase"),
      (3L, base + 100000 * sec, 99L, "view")))
    val q = Streams.runToMemory(
      Streams.funnelStages(
        Streams.readEvents(spark, dir.toString).withWatermark("ts", "10 minutes"),
        wClick, wBuy).toDF(),
      "stream_funnel_wm", OutputMode.Update())
    try {
      q.processAllAvailable()
      // batch 2: an on-time click for user 1 invokes its fold → the
      // no-view prune discards the batch-1 candidates (≤ watermark);
      // user 2 is the on-time control
      stage(Seq((4L, base + 101000 * sec, 1L, "click"),
        (5L, base + 100500 * sec, 2L, "view")))
      q.processAllAvailable()
      // batch 3: user 1's view arrives LATE (t ≪ watermark); user 2's
      // click is on time
      stage(Seq((6L, base + 500 * sec, 1L, "view"),
        (7L, base + 100600 * sec, 2L, "click")))
      q.processAllAvailable()
      val last = spark.table("stream_funnel_wm")
        .withColumn("ord", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max_by(struct(col("t_view"), col("t_click"), col("t_purchase")),
          col("ord")).as("s"))
        .collect().map { r =>
          val s = r.getStruct(1)
          r.getLong(0) -> (Option(s.get(0)), Option(s.get(1)), Option(s.get(2)))
        }.toMap
      // the late view was refused — NOT admitted as a torn (view, no
      // click) snapshot after its candidate click at base+1000s was
      // pruned; watermark semantics: the row is simply late
      assert(last(1L) === ((None, None, None)),
        s"late view must be dropped, got ${last(1L)}")
      // on-time control: watermark-respecting rows still fold normally
      assert(last(2L) ===
        ((Some(base + 100500 * sec), Some(base + 100600 * sec), None)))
      assert(last(99L)._1 === Some(base + 100000 * sec))
    } finally q.stop()
  }

  test("randomized crash-restart property: dedupIngest stays exactly-once " +
      "under kills after (and during) every batch, at sf0.1 volume") {
    // VERDICT r9 §next-7: the empty-first-batch wedge was found by
    // thought, not load — this drives the restart matrix with data. The
    // sf0.1 documents table (5 000 rows, real duplicate texts) arrives
    // as 10 staged files; after each one a seeded coin decides whether
    // the query survives, is stopped cleanly after the batch, or is
    // KILLED IMMEDIATELY after staging (stop() racing the in-flight
    // batch — the at-least-once replay path the batch_id-keyed dynamic
    // overwrite exists for). The invariant under EVERY schedule: the
    // sink equals the deterministic first-seen/min-id-keeper replay and
    // the ledger holds each hash exactly once.
    import spark.implicits._
    val mk = () => java.nio.file.Files.createTempDirectory("graft_crash").toString
    val (ledger, outDir, ckpt) = (mk(), mk(), mk())
    val srcDir = java.nio.file.Files.createTempDirectory("graft_crash_src")
    val all = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nBatches = 10
    val per = (all.length + nBatches - 1) / nBatches
    val batches = all.grouped(per).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stage(k: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_crash_stage").toString
      batches(k).toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      // ATOMIC placement: the query may be live-polling srcDir, and the
      // file source can list a half-copied file mid-copy. Stage under a
      // dot-prefixed name (the source ignores hidden files) and move
      // into place atomically — the contract file sources require.
      val tmpName = srcDir.resolve(f".b$k%02d.parquet.tmp")
      java.nio.file.Files.copy(part, tmpName)
      java.nio.file.Files.move(tmpName, srcDir.resolve(f"b$k%02d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def start() = Streams.dedupIngest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      ledger, outDir, ckpt)
    // driver-side replay of the declared semantics: within-batch keeper
    // = min doc_id per text hash; first batch to carry a hash wins
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash(id: Long, text: String): String =
      if (text == null) s"null:$id"
      else md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (b <- batches) {
      val keepers = b.groupBy { case (id, t) => hash(id, t) }
        .map { case (h, rows) => (h, rows.map(_._1).min) }
      for ((h, id) <- keepers.toSeq.sortBy(_._2) if !seen.contains(h)) {
        seen += h; expected += id
      }
    }
    val rng = new scala.util.Random(20260815)
    var q = start()
    try {
      for (k <- batches.indices) {
        stage(k)
        rng.nextInt(3) match {
          case 0 => // survive: just drain
            q.processAllAvailable()
          case 1 => // clean kill AFTER the batch
            q.processAllAvailable(); q.stop(); q = start()
          case _ => // kill DURING: stop races the in-flight batch, the
            // restart must replay it idempotently
            q.stop(); q = start(); q.processAllAvailable()
        }
      }
      q.processAllAvailable()
      val out = spark.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out === expected.sorted.toSeq,
        s"sink drifted from the replay oracle (${out.length} vs ${expected.length})")
      val hashes = spark.read.parquet(ledger).select("text_md5")
        .collect().map(_.getString(0)).toSeq
      assert(hashes.length === hashes.distinct.length,
        "a ledger hash landed twice across restarts")
      assert(hashes.toSet === seen.toSet, "ledger diverged from the oracle")
    } finally q.stop()
  }

  test("compactLedger folds the per-batch ledger into one base partition; " +
      "a resumed stream still dedups against folded hashes") {
    import spark.implicits._
    val mk = () => java.nio.file.Files.createTempDirectory("graft_lcomp").toString
    val (ledger, outDir, ckpt) = (mk(), mk(), mk())
    val srcDir = java.nio.file.Files.createTempDirectory("graft_lcomp_src")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_lcomp_stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val tmpName = srcDir.resolve(s".$name.tmp")
      java.nio.file.Files.copy(part, tmpName)
      java.nio.file.Files.move(tmpName, srcDir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def start() = Streams.dedupIngest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      ledger, outDir, ckpt)
    stage("a.parquet", Seq(1L -> "alpha", 2L -> "beta"))
    stage("b.parquet", Seq(3L -> "gamma", 4L -> "alpha"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val hashesBefore = spark.read.parquet(ledger)
      .select("text_md5").collect().map(_.getString(0)).sorted.toSeq
    val partsBefore = new java.io.File(ledger).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(partsBefore.length >= 2, s"need multiple batches, got $partsBefore")
    // quiesced compaction
    val (nParts, nHashes) = Streams.compactLedger(spark, ledger)
    assert(nParts === partsBefore.length && nHashes === hashesBefore.length)
    val partsAfter = new java.io.File(ledger).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq
    assert(partsAfter === Seq("batch_id=-1"), s"got $partsAfter")
    assert(spark.read.parquet(ledger).select("text_md5")
      .collect().map(_.getString(0)).sorted.toSeq === hashesBefore,
      "compaction must preserve the exact hash set")
    // resume: a repeat of a FOLDED text must stay excluded; new text lands
    stage("c.parquet", Seq(5L -> "alpha", 6L -> "delta"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L, 3L, 6L),
      s"folded hashes must still dedup after compaction, got $out")
    assert(spark.read.parquet(ledger).count() === 4,
      "base (alpha, beta, gamma) + the new batch's delta")
    // idempotent: compacting again folds the base into itself — after
    // clearing the first run's retained rollback copy, per the guard
    val l = new java.io.File(ledger)
    val retired = new java.io.File(l.getParentFile, s".${l.getName}.pre-compact")
    assert(retired.exists, "rollback copy must be retained")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(retired)
    val (p2, n2) = Streams.compactLedger(spark, ledger)
    assert(p2 === 2 && n2 === 4)
  }

  test("randomized crash-restart property: trendingTypes closed windows " +
      "emit exactly once under restarts") {
    import spark.implicits._
    val mk = () => java.nio.file.Files.createTempDirectory("graft_trend").toString
    val (outDir, ckpt) = (mk(), mk())
    val srcDir = java.nio.file.Files.createTempDirectory("graft_trend_src")
    // six hour-batches of synthetic events; the 1-hour watermark closes
    // hour h when hour h+1 arrives, so every batch both emits and opens
    val types = Seq("view", "click", "purchase", "refund")
    val rng0 = new scala.util.Random(7)
    val hours = (0 until 6).map { h =>
      (0 until 200).map { i =>
        val t = types(rng0.nextInt(types.length))
        (new java.sql.Timestamp(h * 3600000L + i * 1000L), t)
      }
    }
    def stage(k: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_trend_stage").toString
      hours(k).toDF("ts", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      // atomic placement, same reason as the dedupIngest property above
      val tmpName = srcDir.resolve(f".h$k%02d.parquet.tmp")
      java.nio.file.Files.copy(part, tmpName)
      java.nio.file.Files.move(tmpName, srcDir.resolve(f"h$k%02d.parquet"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    def start() = Streams.trendingTypes(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      k = 2, outDir, ckpt)
    val rng = new scala.util.Random(20260815)
    var q = start()
    try {
      for (k <- hours.indices) {
        stage(k)
        rng.nextInt(3) match {
          case 0 => q.processAllAvailable()
          case 1 => q.processAllAvailable(); q.stop(); q = start()
          case _ => q.stop(); q = start(); q.processAllAvailable()
        }
      }
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select("window_start", "event_type", "n", "rnk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      // exactly-once: each closed (window, type) pair appears once
      val pairs = got.map(t => (t._1, t._2)).toSeq
      assert(pairs.length === pairs.distinct.length,
        "a closed window emitted twice across restarts")
      // correctness: top-2 per closed window matches a batch replay
      val flat = hours.flatten
      val byWin = flat.groupBy(_._1.getTime / 3600000L * 3600)
      val closed = got.map(_._1).distinct.sorted
      for (ws <- closed) {
        val want = byWin(ws).groupBy(_._2).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (t, n) => (-n, t) }.take(2)
        val have = got.filter(_._1 == ws).sortBy(_._4)
          .map(t => (t._2, t._3)).toSeq
        assert(have === want, s"window $ws top-2 drifted")
      }
      assert(closed.nonEmpty, "no window ever closed — the property ran empty")
    } finally q.stop()
  }
}
