package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** DataSourceV2 sink: an auditing blackhole demonstrating Spark's
  * two-phase batch commit protocol end-to-end — the part of the
  * connector surface a 100 TB pipeline leans on for exactly-once
  * writes:
  *
  *   - each task's [[DataWriter]] counts rows/bytes locally and ships
  *     them to the driver as its [[WriterCommitMessage]] — per-task
  *     state never touches shared mutable memory, exactly as it must on
  *     a 1000-executor cluster;
  *   - the driver-side [[BatchWrite.commit]] aggregates the messages
  *     ATOMICALLY into [[GraftSinkRegistry]]: a job that fails mid-write
  *     reaches [[BatchWrite.abort]] instead, and the registry never
  *     observes a partial total (speculative/retried task attempts are
  *     resolved by Spark before commit — one message per successful
  *     partition);
  *   - `SupportsTruncate` makes `mode("overwrite")` legal, so the sink
  *     slots into the same writer code paths as a real table.
  *
  * Usage:
  *   df.write.format("graft-sink").option("name", "run1")
  *     .mode("append").save()
  *   GraftSinkRegistry.committed("run1")   // Some(CommitStats(...))
  *
  * Counterpart of the reference's results sink (appV2.py:174-186 writes
  * one .txt per image, no atomicity): here the "write" is the audit
  * itself, and the commit point is explicit.
  */
class GraftSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // options are case-insensitive by DSv2 contract — a direct map
    // lookup would silently route .option("NAME", …) to "default"
    new GraftSinkTable(
      new CaseInsensitiveStringMap(properties).getOrDefault("name", "default"),
      schema)
  override def supportsExternalMetadata(): Boolean = true
}

/** Driver-side audit log, keyed by the sink's `name` option.
  *
  * BOUNDED by design: a streaming query with sub-second triggers
  * commits millions of epochs per week, and a registry that retains
  * every record grows the driver heap linearly with stream age — the
  * unbounded-driver-state hazard this repo hunts everywhere else. Per
  * name, the registry keeps (a) EXACT running totals (rows/commit
  * counts — counters, immune to eviction) and (b) a sliding window of
  * the most recent [[maxRetained]] per-commit / per-epoch records for
  * inspection. Epoch replay stays idempotent inside the window (a
  * re-committed epochId overwrites its record and never re-counts); a
  * replay of an epoch ALREADY EVICTED would re-count its rows, but a
  * replay only ever follows a just-failed commit — thousands of epochs
  * ago is not a reachable replay distance for Structured Streaming. */
object GraftSinkRegistry {
  final case class CommitStats(rows: Long, bytes: Long, tasks: Int)

  /** Per-name record-window size; totals are exact regardless. */
  val maxRetained = 4096

  private val commits = TrieMap.empty[String, List[CommitStats]]
  private val commitTotals = TrieMap.empty[String, (Long, Long)] // (nCommits, rows)
  private val aborts = TrieMap.empty[String, Int]
  private val epochs = TrieMap.empty[String, TrieMap[Long, CommitStats]]
  private val epochRows = TrieMap.empty[String, Long]

  private[sources] def recordCommit(name: String, s: CommitStats): Unit = {
    commits.updateWith(name) { l =>
      Some((s :: l.getOrElse(Nil)).take(maxRetained))
    }
    commitTotals.updateWith(name) { t =>
      val (n, r) = t.getOrElse((0L, 0L)); Some((n + 1, r + s.rows))
    }
  }
  private[sources] def recordAbort(name: String): Unit =
    aborts.updateWith(name) { n => Some(n.getOrElse(0) + 1) }
  private[sources] def recordEpoch(name: String, epochId: Long, s: CommitStats): Unit = {
    val m = epochs.getOrElseUpdate(name, TrieMap.empty)
    val replaced = m.put(epochId, s)
    // totals count each epoch once; an in-window replay replaces its
    // record and contributes the delta (normally zero — same stats)
    epochRows.updateWith(name) { r =>
      Some(r.getOrElse(0L) + s.rows - replaced.map(_.rows).getOrElse(0L))
    }
    // evict oldest epochs beyond the window (records only, never totals)
    while (m.size > maxRetained) m.keys.minOption.foreach(m.remove)
  }

  /** Most recent batch commit for `name`; recent history in commitHistory. */
  def committed(name: String): Option[CommitStats] =
    commits.get(name).flatMap(_.headOption)
  /** The most recent [[maxRetained]] batch commits for `name`, oldest
    * first; [[batchRows]]/[[commitCount]] stay exact beyond the window. */
  def commitHistory(name: String): Seq[CommitStats] =
    commits.get(name).map(_.reverse).getOrElse(Nil)
  /** Total rows across EVERY batch commit ever (exact counter). */
  def batchRows(name: String): Long =
    commitTotals.get(name).map(_._2).getOrElse(0L)
  /** Number of batch commits ever (exact counter). */
  def commitCount(name: String): Long =
    commitTotals.get(name).map(_._1).getOrElse(0L)
  def abortCount(name: String): Int = aborts.getOrElse(name, 0)
  /** The most recent [[maxRetained]] committed epochs. */
  def committedEpochs(name: String): Map[Long, CommitStats] =
    epochs.get(name).map(_.toMap).getOrElse(Map.empty)
  /** Total rows across EVERY committed epoch ever (exact counter). */
  def streamedRows(name: String): Long = epochRows.getOrElse(name, 0L)
  def clear(name: String): Unit = {
    commits.remove(name); commitTotals.remove(name)
    aborts.remove(name); epochs.remove(name); epochRows.remove(name)
  }
}

final class GraftSinkTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($name)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSinkWriteBuilder(name, info.schema())
}

final class GraftSinkWriteBuilder(name: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  // blackhole: truncation is a no-op, but accepting it enables overwrite
  override def truncate(): WriteBuilder = this
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftSinkBatchWrite(name, schema)
    override def toStreaming: streaming.StreamingWrite =
      new GraftSinkStreamingWrite(name, schema)
  }
}

/** Streaming face: the same per-task → driver commit protocol, with the
  * epoch id as the idempotence key. Structured Streaming may re-run a
  * micro-batch after a crash between sink commit and offset-log write;
  * keying the registry by epochId makes the replayed commit overwrite
  * its identical predecessor instead of double-counting — how every
  * exactly-once sink (file sink's _spark_metadata, JDBC upsert-by-epoch)
  * actually achieves the guarantee. */
final class GraftSinkStreamingWrite(name: String, schema: StructType)
    extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    val nFields = schema.length
    (partitionId: Int, _: Long, _: Long) =>
      new GraftSinkWriterFactory(nFields).createWriter(partitionId, 0L)
  }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: AuditMessage => m }
    GraftSinkRegistry.recordEpoch(name, epochId, GraftSinkRegistry.CommitStats(
      rows = ms.map(_.rows).sum, bytes = ms.map(_.bytes).sum, tasks = ms.length))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftSinkRegistry.recordAbort(name)
}

/** One message per successfully committed partition. */
final case class AuditMessage(rows: Long, bytes: Long) extends WriterCommitMessage

final class GraftSinkBatchWrite(name: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(schema.length)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: AuditMessage => m }
    GraftSinkRegistry.recordCommit(name, GraftSinkRegistry.CommitStats(
      rows = ms.map(_.rows).sum, bytes = ms.map(_.bytes).sum, tasks = ms.length))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkRegistry.recordAbort(name)
}

final class GraftSinkWriterFactory(nFields: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        var i = 0
        while (i < nFields) {
          // cheap width proxy: nulls are free, everything else its
          // UnsafeRow-ish footprint (exactness is not the audit's point)
          if (!record.isNullAt(i)) bytes += 8
          i += 1
        }
      }
      override def commit(): WriterCommitMessage = AuditMessage(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
