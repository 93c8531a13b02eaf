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

/** Driver-side audit log, keyed by the sink's `name` option. */
object GraftSinkRegistry {
  final case class CommitStats(rows: Long, bytes: Long, tasks: Int)
  // batch: EVERY commit is retained (newest first) — two appends to the
  // same name are two audit records, symmetric with the streaming
  // epochs map; `committed` surfaces the most recent for convenience
  private val commits = TrieMap.empty[String, List[CommitStats]]
  private val aborts = TrieMap.empty[String, Int]
  // streaming: one entry per committed epoch — idempotent on epoch
  // replay (a re-committed epochId overwrites with identical stats
  // rather than double-counting, the sink half of exactly-once)
  private val epochs = TrieMap.empty[String, TrieMap[Long, CommitStats]]

  private[sources] def recordCommit(name: String, s: CommitStats): Unit =
    commits.updateWith(name) { l => Some(s :: l.getOrElse(Nil)) }
  private[sources] def recordAbort(name: String): Unit =
    aborts.updateWith(name) { n => Some(n.getOrElse(0) + 1) }
  private[sources] def recordEpoch(name: String, epochId: Long, s: CommitStats): Unit =
    epochs.getOrElseUpdate(name, TrieMap.empty).put(epochId, s)

  /** Most recent batch commit for `name`; full history in commitHistory. */
  def committed(name: String): Option[CommitStats] =
    commits.get(name).flatMap(_.headOption)
  /** All batch commits for `name`, oldest first. */
  def commitHistory(name: String): Seq[CommitStats] =
    commits.get(name).map(_.reverse).getOrElse(Nil)
  /** Total rows across every batch commit (streamedRows' batch dual). */
  def batchRows(name: String): Long = commitHistory(name).map(_.rows).sum
  def abortCount(name: String): Int = aborts.getOrElse(name, 0)
  def committedEpochs(name: String): Map[Long, CommitStats] =
    epochs.get(name).map(_.toMap).getOrElse(Map.empty)
  def streamedRows(name: String): Long =
    committedEpochs(name).values.map(_.rows).sum
  def clear(name: String): Unit = {
    commits.remove(name); aborts.remove(name); epochs.remove(name)
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
