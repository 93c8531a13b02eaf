package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector: a deterministic synthetic document corpus —
  * the engine's demonstration of Spark's full connector surface
  * (TableProvider → Table → ScanBuilder → Batch → PartitionReader) with
  * the two pushdowns that matter at 100 TB:
  *
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     materialize ONLY requested columns — a `select(count(*))` never
  *     synthesizes a byte of text;
  *   - **filter → partition pruning** (`SupportsPushDownFilters`):
  *     doc_id range predicates are absorbed into the scan, and
  *     `planInputPartitions` drops every id-range slice the predicate
  *     excludes — the source-side analogue of parquet row-group pruning:
  *     pruned partitions are never scheduled, not just filtered empty.
  *
  * Rows derive purely from doc_id (content hash-stable under any
  * `partitions` setting), mirroring how the fixture corpus is seeded —
  * at cluster scale `partitions` is the parallelism dial and each slice
  * is one task with zero skew by construction.
  *
  * Usage:
  *   spark.read.format("graft-synth")          // DataSourceRegister name
  *     .option("rows", 10000).option("partitions", 8).load()
  *
  * Schema: doc_id LONG, lang STRING, text STRING, n_tokens INT.
  * Counterpart of the reference's directory-scan source (appV2.py:132-137)
  * in connector form: the scan IS the generator, options are the bound
  * parameters (appV2.py:107-129's interactive binding, declarative).
  */
class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 contract: data-source options are case-INSENSITIVE — the raw
    // properties map is not, so .option("ROWS", …) would silently fall
    // back to the default through a direct lookup
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthDocsTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerBatch", 250L))
  }
}

object SynthDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  private val langs = Array("en", "zh", "es", "de", "fr")

  def lang(id: Long): String = langs((id % langs.length).toInt)

  /** Deterministic per-doc token count / text (content depends only on
    * the id — stable under any partitioning). */
  def nTokens(id: Long): Int = 5 + (id * 2654435761L % 28).toInt.abs

  def text(id: Long): String = {
    val n = nTokens(id)
    val sb = new java.lang.StringBuilder(8 * n)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append("w").append((id * 31 + i * 7) % 97)
      i += 1
    }
    sb.toString
  }
}

final class SynthDocsTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, partitions, rowsPerBatch)
}

final class SynthDocsScanBuilder(rows: Long, partitions: Int,
                                 rowsPerBatch: Long = 250L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var lo: Long = 0L          // inclusive doc_id lower bound
  private var hi: Long = rows        // exclusive doc_id upper bound
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SynthDocsSource.schema
  private var countStarAggs: Int = 0 // >0: completely-pushed COUNT(*) scan

  /** Absorb doc_id range predicates exactly (they tighten [lo, hi) and
    * need no re-evaluation); everything else stays residual for Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case IsNotNull("doc_id") => true // non-nullable: always true
      case _ => false
    }
    // v+1 saturates at Long.MaxValue: ids live in [0, rows) with
    // rows <= MaxValue, so `> MaxValue` is the empty range (lo pinned to
    // MaxValue >= hi) and `<= MaxValue` is a no-op — the unchecked
    // increment wrapped to MinValue and, because absorbed filters are
    // never re-checked by Spark, silently inverted both predicates
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    ours.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, succ(v))
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case _ => ()
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT n after fully-pushed filters tightens the id range itself —
    * Spark only offers the push when no residual filter sits between the
    * limit and the scan, so trimming [lo, lo+n) is exact. Declared
    * partially-pushed: Spark keeps its global Limit (partitions still
    * emit concurrently), but the source now plans at most
    * ceil(n / sliceWidth) tasks instead of `partitions`. */
  override def pushLimit(n: Int): Boolean = {
    hi = math.min(hi, lo + n)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** Ungrouped COUNT(*) is answered from the range arithmetic alone —
    * the connector analogue of parquet's metadata-only count: zero rows
    * synthesized, one task planned. Complete pushdown, so Spark consumes
    * the single returned row as the final aggregate. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[aggregate.CountStar])

  override def pushAggregation(agg: Aggregation): Boolean =
    if (supportCompletePushDown(agg)) {
      countStarAggs = agg.aggregateExpressions.length
      true
    } else false

  override def build(): Scan =
    if (countStarAggs > 0)
      new SynthCountScan(math.max(0L, hi - lo), countStarAggs)
    else new SynthDocsScan(rows, partitions, lo, hi, required, rowsPerBatch)
}

/** Metadata-only COUNT(*) answer: one partition, one row. */
final class SynthCountScan(count: Long, nAggs: Int) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nAggs).map(i =>
      StructField(s"count_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-synth pushed_countstar=$count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthSlice(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val c = count
    val n = nAggs
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(Seq.fill(n)(c))
      override def close(): Unit = ()
    }
  }
}

final class SynthDocsScan(rows: Long, partitions: Int,
                          lo: Long, hi: Long, required: StructType,
                          rowsPerBatch: Long = 250L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    // the pushed doc_id range travels into the stream: pushFilters
    // ABSORBS range predicates (they are not returned as residual), so
    // dropping lo/hi here would silently unfilter a streaming read if
    // Spark ever applies scan-level pushdown to micro-batch plans
    new SynthDocsStream(rows, partitions, rowsPerBatch, required, lo, hi)
  override def description(): String =
    s"graft-synth rows=$rows range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** One id-range slice per partition; slices wholly outside [lo, hi)
    * are NOT planned — the tasks never exist. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map(p => SynthSlice(math.max(p * per, lo),
        math.min(math.min((p + 1) * per, rows), hi)))
      .filter(s => s.start < s.end)
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

final case class SynthSlice(start: Long, end: Long) extends InputPartition

/** Streaming offset = exclusive doc_id high-water mark. */
final case class SynthOffset(v: Long) extends streaming.Offset {
  override def json(): String = v.toString
}

/** Micro-batch face of the same source: offsets ARE id ranges, so a
  * batch is a pure function of its (start, end] offsets — identical
  * rows on any replay, which is the whole exactly-once source contract.
  *
  * The stream keeps NO driver-side progress state. It implements
  * [[streaming.SupportsAdmissionControl]] and derives each batch's end
  * from the START offset Spark passes in — which after a restart is the
  * offset restored from the checkpoint — so resumption is correct by
  * construction. (The no-arg `latestOffset()` variant cannot express
  * this: a fresh instance would answer from a zeroed high-water mark,
  * BEHIND the committed offset, and corrupt batch planning — caught by
  * SourcesSpec's restart test.) `rowsPerBatch` is surfaced as the
  * default ReadLimit, the Kafka maxOffsetsPerTrigger analogue; Spark
  * may override it per trigger (Trigger.AvailableNow composes limits),
  * so the cap honors whatever limit is handed down. Column pruning
  * negotiated at plan time applies to every batch. */
final class SynthDocsStream(rows: Long, partitions: Int, rowsPerBatch: Long,
                            required: StructType,
                            filterLo: Long = 0L, filterHi: Long = Long.MaxValue)
    extends streaming.MicroBatchStream with streaming.SupportsAdmissionControl {

  // the streamed id range is [rangeLo, rangeHi): the source's row count
  // intersected with any pushed doc_id range — batches never plan rows
  // a pushed filter excluded
  private val rangeLo = math.max(0L, filterLo)
  private val rangeHi = math.min(rows, filterHi)

  override def initialOffset(): streaming.Offset = SynthOffset(rangeLo)
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    // clamp up too: a checkpoint written before a filter change could
    // restore an offset below the pushed lower bound
    val lo = math.max(start.asInstanceOf[SynthOffset].v, rangeLo)
    // honor the ACTUAL limit algebra, not just ReadMaxRows:
    // ReadAllAvailable is what Trigger.Once hands down and what the
    // AvailableNow wrapper uses to snapshot its target offset — mapping
    // it to rowsPerBatch made one-shot triggers silently truncate the
    // source to a single batch. A composite (AvailableNow composes
    // limits) takes its most restrictive row cap; members that don't
    // bound rows (ReadMinRows, ReadAllAvailable) impose no cap.
    // bound() answers only "does this limit BOUND rows, and to what?" —
    // Long.MaxValue means "imposes no cap" (ReadMinRows, or a composite
    // of nothing but such members, at ANY nesting depth). The default
    // admission (rowsPerBatch) is applied once at the TOP, never inside
    // the recursion: a nested all-non-bounding composite must bubble up
    // as no-cap, not smuggle the default in as if it were a real bound
    // ({composite[minRows], allAvailable} stays uncapped).
    def bound(l: streaming.ReadLimit): Long = l match {
      case m: streaming.ReadMaxRows => m.maxRows()
      case _: streaming.ReadAllAvailable => rangeHi - lo // explicit: all of it
      case c: streaming.CompositeReadLimit =>
        val bs = c.getReadLimits.map(bound).filter(_ != Long.MaxValue)
        if (bs.isEmpty) Long.MaxValue else bs.min
      case _ => Long.MaxValue // ReadMinRows etc.: not a cap
    }
    val cap = bound(limit) match {
      case Long.MaxValue => rowsPerBatch // nothing bounds rows: default admission
      case b => b
    }
    SynthOffset(math.min(rangeHi, lo + math.max(0L, cap)))
  }
  override def reportLatestOffset(): streaming.Offset = SynthOffset(rangeHi)

  override def deserializeOffset(json: String): streaming.Offset =
    SynthOffset(json.trim.toLong)
  override def commit(end: streaming.Offset): Unit = ()

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val lo = math.max(start.asInstanceOf[SynthOffset].v, rangeLo)
    val hi = math.min(end.asInstanceOf[SynthOffset].v, rangeHi)
    val per = math.max(1L, (hi - lo + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map(p => SynthSlice(lo + p * per, math.min(lo + (p + 1) * per, hi)))
      .filter(s => s.start < s.end)
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
  override def stop(): Unit = ()
}

final class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[SynthSlice]
    // per-column emitters bound ONCE per reader: pruned columns cost 0
    val emit: Array[Long => Any] = required.fieldNames.map {
      case "doc_id" => (id: Long) => id
      case "lang" => (id: Long) => UTF8String.fromString(SynthDocsSource.lang(id))
      case "text" => (id: Long) => UTF8String.fromString(SynthDocsSource.text(id))
      case "n_tokens" => (id: Long) => SynthDocsSource.nTokens(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = s.start - 1
      override def next(): Boolean = { id += 1; id < s.end }
      override def get(): InternalRow = {
        // index loop into a fresh values array: no per-row Seq/map
        // allocations in the scan's hot loop (the row itself must be
        // fresh — downstream operators may buffer it)
        val values = new Array[Any](emit.length)
        var i = 0
        while (i < emit.length) { values(i) = emit(i)(id); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
