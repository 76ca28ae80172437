package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path with a real two-phase commit protocol —
  * the sink-side counterpart of [[SynthSource]]'s read connector, so
  * the engine exercises every DSv2 surface: read planning/pushdown
  * (SynthSource), and here `WriteBuilder → BatchWrite →
  * DataWriterFactory → DataWriter` with task-level commit messages and
  * a driver-side atomic commit.
  *
  * The protocol is the point (the reference's Finalizer is fire-and-
  * forget; real lakes need atomicity): every task BUFFERS its rows and
  * ships them only inside its `WriterCommitMessage`; nothing becomes
  * visible until the driver's `commit(messages)` installs all
  * partitions at once. A failed job (`abort`) leaves the table exactly
  * as it was — no torn writes from the tasks that did succeed
  * (SinkSpec pins this). `SupportsTruncate` maps `overwrite` onto
  * truncate-then-commit in the same atomic step.
  *
  * The backing store here is an in-process map (one JVM under
  * local[*]); at cluster scale the same protocol targets an external
  * object store — messages carry file manifests instead of rows and
  * `commit` publishes the manifest. The buffering/commit shape is
  * identical, which is exactly what the interface abstracts.
  */
class MemSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemSink.store.schema(MemSink.tableName(options))
      .getOrElse(throw new IllegalArgumentException(
        s"mem table '${MemSink.tableName(options)}' does not exist yet — write first"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(properties.getOrDefault("table", "default"), schema)
}

object MemSink {
  private[sources] def tableName(options: CaseInsensitiveStringMap): String =
    Option(options.get("table")).getOrElse("default")

  /** Committed state, keyed by table name. Rows are stored as copied
    * InternalRows next to their schema; install is synchronized so a
    * commit is all-or-nothing even with concurrent writers. */
  final class Store {
    private val tables = new ConcurrentHashMap[String, (StructType, Vector[InternalRow])]()
    def schema(name: String): Option[StructType] =
      Option(tables.get(name)).map(_._1)
    def rows(name: String): Vector[InternalRow] =
      Option(tables.get(name)).map(_._2).getOrElse(Vector.empty)
    def install(name: String, schema: StructType, rows: Vector[InternalRow],
        truncate: Boolean): Unit = tables.synchronized {
      val prev = if (truncate) Vector.empty else this.rows(name)
      tables.put(name, (schema, prev ++ rows))
    }
    def drop(name: String): Unit = tables.remove(name)
  }
  val store = new Store
}

final class MemTable(name: String, writeSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def schema: StructType =
    MemSink.store.schema(name).getOrElse(writeSchema)
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def name(): String = s"graft_mem($name)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemScan(name, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema(), truncate = false)
}

final class MemWriteBuilder(name: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = new MemWriteBuilder(name, schema, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, truncate)
  }
}

/** One buffered batch per task attempt; only the messages of the
  * attempts Spark declares successful reach `commit`. */
final case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

final class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSink.store.install(name, schema,
      messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toVector,
      truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      override def write(row: InternalRow): Unit = buf += row.copy()
      override def commit(): WriterCommitMessage = MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

final case class MemPartition(name: String) extends InputPartition

final class MemScan(name: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemPartition(name))
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows =
        MemSink.store.rows(partition.asInstanceOf[MemPartition].name).iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        cur = rows.next(); true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
