package graft

import graft.sources.SynthDocsSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV and JSON lines
  * roundtrips with explicit schemas, plus partitioned parquet writes with
  * partition pruning — the layout/compaction moves a 100 TB pipeline
  * depends on. */
class SourcesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("csv roundtrip with explicit schema and header") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("json-lines roundtrip preserves nested arrays") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    emb.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .json(dir)
    assert(back.count() === 50)
    val a = back.orderBy("vec_id").select("embedding").head.getSeq[Float](0)
    val b = emb.orderBy("vec_id").select("embedding").head.getSeq[Float](0)
    assert(a === b)
  }

  test("orc roundtrip with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("n_chars") > 500)
    assert(back.count() === docs.filter(col("n_chars") > 500).count())
    // ORC scans carry pushed filters like parquet ones
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("n_chars"))
  }

  test("corrupt file in a directory degrades gracefully with ignoreCorruptFiles") {
    // at 100 TB some files WILL be broken; the job must not die
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    docs.limit(100).write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-junk.parquet"),
      "this is not a parquet file".getBytes)
    val saved = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(dir).count() === 100)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("malformed JSON ingestion: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST dies") {
    // at 100 TB some upstream JSON WILL be garbage; mode choice decides
    // whether the pipeline quarantines, skips, or halts — all three must
    // behave predictably
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"doc_id": 1, "lang": "en"}
        |{"doc_id": 2, "lang": "de"}
        |{not json at all
        |{"doc_id": "NaN-ish", "lang": 7}
        |{"doc_id": 4, "lang": "fr"}""".stripMargin.getBytes)
    val schema = "doc_id LONG, lang STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(permissive.count() === 5)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 2,
        "both bad rows quarantined with their raw text")
      assert(permissive.filter(col("_corrupt_record").isNull)
        .agg(sum("doc_id")).head.getLong(0) === 7L)
    } finally permissive.unpersist()
    // DROPMALFORMED drops only syntactically-broken rows; the
    // type-mismatch row survives with nulled fields (Spark semantics —
    // PERMISSIVE's corrupt column is the stricter quarantine)
    val dropped = spark.read.schema("doc_id LONG, lang STRING")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 4)
    intercept[Exception] {
      spark.read.schema("doc_id LONG, lang STRING")
        .option("mode", "FAILFAST").json(dir).count()
    }
  }

  test("column pruning reaches the scan: 2-column projection reads a 2-column schema") {
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val narrow = lineitem.select("l_orderkey", "l_quantity")
    val scan = narrow.queryExecution.executedPlan.toString
    // the parquet ReadSchema must contain ONLY the projected columns
    val schemaLine = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_orderkey") && schemaLine.contains("l_quantity"))
    assert(!schemaLine.contains("l_extendedprice") && !schemaLine.contains("l_shipdate"))
  }

  test("partitioned parquet write + partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(one.count() === docs.filter(col("lang") === "en").count())
    // pruning proof: the scan's partition filters mention lang
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
  }

  // ---- graft-synth DataSourceV2 connector ----

  private def synth(rows: Int, partitions: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", partitions).load()

  private def synthScanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }.mkString("; ")

  test("graft-synth: short-name resolution, row count, deterministic content") {
    val df = synth(1000, 4)
    assert(df.count() === 1000)
    // content is a pure function of doc_id: stable across partitioning
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(col("doc_id"), col("text"), col("lang")).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    val a = fingerprint(synth(1000, 3))
    val b = fingerprint(synth(1000, 7))
    assert(a === b)
  }

  test("graft-synth: column pruning reaches the connector scan") {
    val df = synth(500, 4).select("doc_id", "lang")
    val desc = synthScanDesc(df)
    assert(desc.contains("cols=doc_id,lang"), s"scan was: $desc")
    assert(!desc.contains("text"), s"text should be pruned: $desc")
    assert(df.agg(countDistinct("lang")).head.getLong(0) === 5)
  }

  test("graft-synth: doc_id range filter prunes partitions at planning time") {
    // rows=1000 over 4 slices of 250; doc_id < 250 must plan exactly 1 task
    val df = synth(1000, 4).filter(col("doc_id") < 250)
    assert(df.count() === 250)
    val desc = synthScanDesc(df)
    assert(desc.contains("range=[0,250)"), s"scan was: $desc")
    assert(df.rdd.getNumPartitions === 1, "excluded slices must never be planned")
    // equality predicate collapses to a single-row range
    val one = synth(1000, 4).filter(col("doc_id") === 777L)
    assert(one.count() === 1)
    assert(synthScanDesc(one).contains("range=[777,778)"))
    // contradictory range plans zero tasks and returns zero rows
    val none = synth(1000, 4).filter(col("doc_id") > 900).filter(col("doc_id") < 100)
    assert(none.count() === 0)
  }

  test("graft-synth: residual filters still apply on top of pushed ranges") {
    val df = synth(1000, 4).filter(col("doc_id") >= 100 && col("doc_id") < 300 && col("lang") === "en")
    val expected = (100L until 300L).count(SynthDocsSource.lang(_) == "en")
    assert(df.count() === expected)
  }

  test("graft-synth: limit pushdown trims planned tasks to the limit") {
    // 1000 rows / 4 slices of 250; LIMIT 10 → only slice [0,10) planned
    val df = synth(1000, 4).limit(10)
    assert(df.count() === 10)
    assert(df.rdd.getNumPartitions === 1)
    assert(synthScanDesc(df).contains("range=[0,10)"))
    // limit must NOT be pushed through a residual (non-doc_id) filter
    val guarded = synth(1000, 4).filter(col("lang") === "en").limit(10)
    assert(guarded.count() === 10)
    assert(synthScanDesc(guarded).contains("range=[0,1000)"),
      "residual filter must block the limit push")
  }

  test("graft-synth: Long.MaxValue boundary literals push without overflow") {
    // `<= MaxValue` is always true: the unchecked v+1 wrapped hi to
    // MinValue and returned 0 rows; `> MaxValue` is always false: the
    // wrapped lo was a no-op and returned every row. Absorbed filters
    // are never re-checked by Spark, so both inversions were silent.
    assert(synth(1000, 4).filter(col("doc_id") <= Long.MaxValue).count() === 1000)
    assert(synth(1000, 4).filter(col("doc_id") > Long.MaxValue).count() === 0)
    assert(synth(1000, 4).filter(col("doc_id") === Long.MaxValue).count() === 0)
  }

  test("graft-synth and graft-sink options are case-insensitive (DSv2 contract)") {
    val upper = spark.read.format("graft-synth")
      .option("ROWS", 10).option("Partitions", 2).load()
    assert(upper.count() === 10, "ROWS must not be silently ignored")
    sources.GraftSinkRegistry.clear("case_run")
    synth(50, 2).write.format("graft-sink").option("NAME", "case_run")
      .mode("append").save()
    assert(sources.GraftSinkRegistry.committed("case_run").exists(_.rows == 50L),
      "NAME must route the audit to its run, not to 'default'")
  }

  test("graft-synth: ungrouped count(*) is answered from metadata alone") {
    val df = synth(1000000, 8)
    assert(df.count() === 1000000L)
    val agg = df.groupBy().count()
    assert(synthScanDesc(agg).contains("pushed_countstar=1000000"),
      s"was: ${synthScanDesc(agg)}")
    // composes with filter pushdown: the pushed range feeds the count
    val filtered = synth(1000000, 8).filter(col("doc_id") >= 250).groupBy().count()
    assert(filtered.head.getLong(0) === 999750L)
    assert(synthScanDesc(filtered).contains("pushed_countstar=999750"))
    // grouped aggregates refuse the push and scan normally
    val grouped = synth(1000, 4).groupBy("lang").count()
    assert(!synthScanDesc(grouped).contains("pushed_countstar"))
    assert(grouped.count() === 5)
  }

  // ---- graft-synth as a micro-batch streaming source ----

  test("graft-synth streaming: drains in rowsPerBatch batches to exact batch parity") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .writeStream.format("memory").queryName("synth_stream").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("synth_stream")
    assert(got.count() === 1000)
    assert(got.select("doc_id").distinct().count() === 1000, "no batch overlap")
    // identical content to the batch face of the same source
    def fp(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(col("doc_id"), col("text"), col("lang"), col("n_tokens")).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(fp(got) === fp(synth(1000, 4)))
    // 1000 rows at 300/trigger = 4 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) === 4)
  }

  test("graft-synth streaming: one-shot triggers drain the WHOLE source, not one batch") {
    // Trigger.Once hands down ReadAllAvailable and Trigger.AvailableNow
    // snapshots its target offset the same way — mapping every
    // non-ReadMaxRows limit to rowsPerBatch silently truncated one-shot
    // queries to 250 of 1000 rows (a successful-looking 75% data loss)
    for ((trigger, tag) <- Seq(
        org.apache.spark.sql.streaming.Trigger.Once() -> "once",
        org.apache.spark.sql.streaming.Trigger.AvailableNow() -> "availablenow")) {
      val name = s"synth_oneshot_$tag"
      val q = spark.readStream.format("graft-synth")
        .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 250)
        .load()
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(trigger)
        .start()
      try q.awaitTermination() finally q.stop()
      assert(spark.table(name).count() === 1000,
        s"$trigger must drain the full source")
    }
  }

  test("graft-synth admission: ReadMinRows members never cap a composite") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s = new graft.sources.SynthDocsStream(
      1000L, 4, 250L, graft.sources.SynthDocsSource.schema)
    val start = s.initialOffset()
    def end(limit: ReadLimit): Long =
      s.latestOffset(start, limit).asInstanceOf[graft.sources.SynthOffset].v
    // a real AvailableNow shape: {minRows, allAvailable} — the
    // non-row-bounding ReadMinRows must map to "no cap" inside the
    // composite, not demote the batch to rowsPerBatch
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1L, 0L), ReadLimit.allAvailable()))) === 1000L)
    // a bounding member still caps, and the most restrictive one wins
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1L, 0L), ReadLimit.maxRows(100L)))) === 100L)
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.maxRows(300L), ReadLimit.maxRows(100L)))) === 100L)
    // NO member bounds rows: default admission applies
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1L, 0L)))) === 250L)
    // NESTED all-non-bounding composite must bubble up as no-cap, not
    // smuggle the default admission in as a fake bound next to an
    // explicit allAvailable
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.compositeLimit(Array(ReadLimit.minRows(1L, 0L))),
      ReadLimit.allAvailable()))) === 1000L)
    // ...but alone it still gets default admission at the top
    assert(end(ReadLimit.compositeLimit(Array(
      ReadLimit.compositeLimit(Array(ReadLimit.minRows(1L, 0L)))))) === 250L)
  }

  test("graft-synth streaming: restart from checkpoint resumes, never re-emits") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_out").toString
    def run(rows: Int): Unit = {
      val q = spark.readStream.format("graft-synth")
        .option("rows", rows).option("partitions", 4).option("rowsPerBatch", 250)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run(600)  // first life: emits [0, 600)
    run(1200) // restart, source grew: must emit ONLY [600, 1200)
    val back = spark.read.parquet(out)
    assert(back.count() === 1200, "exactly-once across the restart")
    assert(back.select("doc_id").distinct().count() === 1200, "no re-emission")
    assert(back.agg(min("doc_id"), max("doc_id")).head ===
      org.apache.spark.sql.Row(0L, 1199L))
  }

  // ---- graft-sink DataSourceV2 write path ----

  test("graft-sink: two-phase commit aggregates per-task audit messages") {
    graft.sources.GraftSinkRegistry.clear("t_commit")
    val df = synth(1000, 4)
    df.write.format("graft-sink").option("name", "t_commit").mode("append").save()
    val stats = graft.sources.GraftSinkRegistry.committed("t_commit")
    assert(stats.nonEmpty, "commit must reach the registry")
    assert(stats.get.rows === 1000)
    assert(stats.get.tasks === 4, "one commit message per partition")
    assert(stats.get.bytes === 4 * 8 * 1000L)
    assert(graft.sources.GraftSinkRegistry.abortCount("t_commit") === 0)
  }

  test("graft-sink: repeated batch appends ACCUMULATE audit records (no overwrite)") {
    graft.sources.GraftSinkRegistry.clear("t_multi")
    synth(300, 2).write.format("graft-sink").option("name", "t_multi")
      .mode("append").save()
    synth(500, 2).write.format("graft-sink").option("name", "t_multi")
      .mode("append").save()
    val hist = graft.sources.GraftSinkRegistry.commitHistory("t_multi")
    assert(hist.map(_.rows) === Seq(300L, 500L), "oldest-first, both retained")
    assert(graft.sources.GraftSinkRegistry.committed("t_multi").map(_.rows)
      === Some(500L), "committed() surfaces the most recent")
    assert(graft.sources.GraftSinkRegistry.batchRows("t_multi") === 800L)
  }

  test("graft-sink: overwrite mode rides SupportsTruncate") {
    graft.sources.GraftSinkRegistry.clear("t_over")
    synth(100, 2).write.format("graft-sink").option("name", "t_over")
      .mode("overwrite").save()
    assert(graft.sources.GraftSinkRegistry.committed("t_over").map(_.rows) === Some(100L))
  }

  test("graft-sink streaming: per-epoch commits sum to the source total (connector-to-connector)") {
    graft.sources.GraftSinkRegistry.clear("t_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000).option("partitions", 4).option("rowsPerBatch", 300)
      .load()
      .writeStream.format("graft-sink").option("name", "t_stream")
      .option("checkpointLocation", ckpt).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val epochs = graft.sources.GraftSinkRegistry.committedEpochs("t_stream")
    assert(graft.sources.GraftSinkRegistry.streamedRows("t_stream") === 1000)
    assert(epochs.size === 4, s"300/trigger over 1000 rows = 4 epochs, got $epochs")
    assert(epochs.values.map(_.rows).toSeq.sorted === Seq(100L, 300L, 300L, 300L))
    assert(graft.sources.GraftSinkRegistry.abortCount("t_stream") === 0)
  }

  test("graft-sink: failed job aborts — no partial totals are committed") {
    graft.sources.GraftSinkRegistry.clear("t_abort")
    val poison = udf((id: Long) =>
      if (id == 777L) throw new RuntimeException("poison row") else id)
    val bad = synth(1000, 4).withColumn("doc_id", poison(col("doc_id")))
    intercept[Exception] {
      bad.write.format("graft-sink").option("name", "t_abort").mode("append").save()
    }
    assert(graft.sources.GraftSinkRegistry.committed("t_abort").isEmpty,
      "a failed write must never surface a commit")
    assert(graft.sources.GraftSinkRegistry.abortCount("t_abort") === 1)
  }
}
