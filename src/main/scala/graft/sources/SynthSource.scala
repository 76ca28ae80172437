package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import graft.GraftQuery
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector — the Spark-idiomatic analog of the
  * reference engine's pluggable input stage (its Opener/Loader pair,
  * reference `interfaces.go:17-42`): the engine asks the source for
  * partitions and per-partition readers, and pushes work INTO it.
  *
  * The table is a deterministic arithmetic generator, which makes
  * every connector feature checkable end to end:
  *  - **partition planning**: [0, rows) splits into `parts` contiguous
  *    ranges, each read by an independent `PartitionReader` — the
  *    parallel-scan contract a 1000-executor cluster relies on;
  *  - **filter pushdown** (`SupportsPushDownFilters`): range
  *    predicates on `id` narrow the generated interval AT PLANNING
  *    TIME, so partitions outside the band are never created (the
  *    connector-side equivalent of parquet row-group pruning; pinned
  *    in SynthSourceSpec by partition count);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize only requested fields;
  *  - and the row formula is plain 64-bit arithmetic, so the DuckDB
  *    oracle reproduces the whole table from `range()` and sy01 gets a
  *    full hash check, custom connector and all.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SynthSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("label", StringType, nullable = false)))

  /** Knuth multiplicative mix mod a prime — overflow-free for any id
    * a test will use, and identical in DuckDB BIGINT arithmetic. */
  def valOf(id: Long): Long = (id * 2654435761L) % 1000003L
  def grpOf(id: Long): Long = id % 97L
  val SQL_VAL = "(id * 2654435761) % 1000003"
  val SQL_GRP = "id % 97"
}

final class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name: String = s"graft_synth($rows rows, $parts parts)"
  override def schema: StructType = SynthSource.SCHEMA
  override def capabilities: java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

final class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.SCHEMA

  /** Accept range predicates on `id` by narrowing [lo, hi); everything
    * else stays a post-scan filter. Accepted filters are also RETURNED
    * as residuals — the generator's narrowing is exact, but re-checking
    * above the scan is free and keeps the contract conservative. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.flatMap {
      case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); Some(f)
      case f @ GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); Some(f)
      case f @ LessThan("id", v: Long) => hi = math.min(hi, v); Some(f)
      case f @ LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); Some(f)
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); Some(f)
      case f @ IsNotNull("id") => Some(f) // nothing is null here
      case _ => None
    }
    filters // all filters re-checked above the scan
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SynthScan(rows, lo, math.max(lo, hi), parts, required)
}

final case class SynthPartition(start: Long, end: Long) extends InputPartition

final class SynthScan(rows: Long, lo: Long, hi: Long, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description: String = s"graft-synth [$lo, $hi) in <=$parts parts"

  /** Fixed-width chunks aligned on the ORIGINAL [0, rows) grid — like
    * a file source's fixed splits — each intersected with the pushed
    * band and dropped when the intersection is empty. A predicate
    * covering 1/parts of the id space therefore plans ONE partition
    * (pruning you can count), not `parts` slivers of a re-split band. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) Array.empty
    else {
      val width = math.max(1L, (rows + parts - 1) / parts)
      (0L until rows by width).iterator
        .map(s => SynthPartition(math.max(s, lo), math.min(s + width, hi)))
        .filter(p => p.end > p.start).toArray[InputPartition]
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

final class SynthReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthPartition(start, end) = partition
    new PartitionReader[InternalRow] {
      private var cur = start - 1
      override def next(): Boolean = { cur += 1; cur < end }
      override def get(): InternalRow = {
        val values: Array[Any] = cols.map {
          case "id" => cur
          case "grp" => SynthSource.grpOf(cur)
          case "val" => SynthSource.valOf(cur)
          case "label" => UTF8String.fromString("g" + SynthSource.grpOf(cur))
        }
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }

  /** Vectorized path: the scan hands whole-stage codegen 4096-row
    * `ColumnarBatch`es instead of one `InternalRow` per call — the
    * same contract Spark's own parquet reader serves, and why a
    * `ColumnarToRow` boundary appears above the scan in the plan
    * (pinned in SynthSourceSpec). Vectors are allocated once per
    * reader and refilled per batch, parquet-reader style. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val SynthPartition(start, end) = partition
    val CAP = 4096
    val schema = StructType(cols.map(c => SynthSource.SCHEMA(c)))
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(CAP, schema)
      private val batch = new ColumnarBatch(
        vectors.map(_.asInstanceOf[org.apache.spark.sql.vectorized.ColumnVector]))
      private var cur = start
      override def next(): Boolean = {
        if (cur >= end) return false
        val n = math.min(CAP.toLong, end - cur).toInt
        var i = 0
        while (i < n) {
          val id = cur + i
          var c = 0
          while (c < cols.length) {
            cols(c) match {
              case "id" => vectors(c).putLong(i, id)
              case "grp" => vectors(c).putLong(i, SynthSource.grpOf(id))
              case "val" => vectors(c).putLong(i, SynthSource.valOf(id))
              case "label" =>
                val b = ("g" + SynthSource.grpOf(id)).getBytes("UTF-8")
                vectors(c).putByteArray(i, b, 0, b.length)
            }
            c += 1
          }
          i += 1
        }
        cur += n
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

/** Registry face of the connector. */
object SynthQueries {
  /** Read through the custom connector with a pushed id-band predicate
    * and aggregate per group. The oracle regenerates the identical
    * table from DuckDB's `range()` — a full cross-engine hash check of
    * a custom DSv2 connector's read path, pushdown and all. */
  val sy01SynthSource: GraftQuery = GraftQuery(
    "sy01_synth_source",
    (s, _) => s.read.format("graft.sources.SynthSource")
      .option("rows", "100000").option("parts", "8").load()
      .filter(col("id") >= 25000 && col("id") < 75000)
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("val")).cast(LongType).as("sum_val"))
      .orderBy("grp"),
    Some(s"""SELECT ${SynthSource.SQL_GRP} AS grp, COUNT(*) AS n,
       |  CAST(SUM(${SynthSource.SQL_VAL}) AS BIGINT) AS sum_val
       |FROM range(25000, 75000) t(id)
       |GROUP BY 1 ORDER BY grp""".stripMargin),
    "custom DataSource V2 connector: partition planning + filter/column pushdown")

  val all: Seq[GraftQuery] = Seq(sy01SynthSource)
}
