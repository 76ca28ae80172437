package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroJob, AvroOutputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapred.JobConf
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file reader/writer — the row-oriented interop format
  * missing from [[Formats.Supported]] (this Spark distribution ships
  * Avro core + avro-mapred but not the `spark-avro` DSv2 module, so
  * `format("avro")` is unavailable; the reference has no formats at
  * all, filesystem.go:44-46).
  *
  * Implementation is the Hadoop-format binding, NOT a local-filesystem
  * shortcut: writes go through `saveAsHadoopFile` +
  * [[AvroOutputFormat]] (task files committed by Hadoop's
  * FileOutputCommitter — correct on DFS with speculative/retried
  * tasks), reads through `hadoopFile` + [[AvroInputFormat]], which
  * SPLITS container files on their sync markers, so one big Avro file
  * still scans as many tasks. This is the one place in the engine
  * where the RDD API is the right tool: the Avro `mapred` formats are
  * a Hadoop IO contract with no Dataset equivalent on this classpath,
  * and the per-partition work is exactly "bind records to a codec".
  *
  * Supported field types are the scalar interop subset (string,
  * double, long, int, boolean) — Avro logical types (decimal,
  * timestamp) intentionally out of scope here; columnar analytics
  * stays on parquet/ORC (q47/q54), Avro exists for row-stream
  * ingest/egress interop.
  */
object AvroIO {

  /** Avro record schema JSON mirroring a flat StructType. A nullable
    * Spark field maps to the Avro `["null", T]` union (with a null
    * default) — without it a single null value would kill the write
    * job deep inside a task (GenericDatumWriter NPE) instead of being
    * a representable value; Avro unions are the standard nullable
    * encoding, and the read path already passes nulls through. */
  def avroSchemaJson(st: StructType): String = {
    val fields = st.fields.map { f =>
      val t = f.dataType match {
        case StringType  => "\"string\""
        case DoubleType  => "\"double\""
        case LongType    => "\"long\""
        case IntegerType => "\"int\""
        case BooleanType => "\"boolean\""
        case other => throw new IllegalArgumentException(
          s"AvroIO: unsupported field type $other for '${f.name}' " +
            "(scalar interop subset: string/double/long/int/boolean)")
      }
      if (f.nullable)
        s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
      else s"""{"name":"${f.name}","type":$t}"""
    }
    s"""{"type":"record","name":"graft_record","namespace":"graft",
       |"fields":[${fields.mkString(",")}]}""".stripMargin.replace("\n", "")
  }

  def write(df: DataFrame, dir: String): Unit = {
    val json = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    val jc = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputSchema(jc, new Schema.Parser().parse(json))
    df.rdd.mapPartitions { it =>
      // one parsed schema per task — Schema is not serializable, the
      // JSON string is the wire form
      val sch = new Schema.Parser().parse(json)
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < names.length) { rec.put(names(i), row.get(i)); i += 1 }
        (new AvroWrapper[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsHadoopFile(dir, classOf[AvroWrapper[GenericRecord]],
      classOf[NullWritable], classOf[AvroOutputFormat[GenericRecord]], jc)
  }

  /** Read back with an EXPLICIT schema (interop contract: the reader
    * declares what it expects). Every record's writer schema is
    * checked to CONTAIN the expected fields before any value is read —
    * `GenericData.Record.get(name)` returns null for an UNKNOWN field
    * name (it never throws), which would otherwise silently fill a
    * declared-non-nullable column with nulls. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames
    val rows = spark.sparkContext.hadoopFile(
      dir, classOf[AvroInputFormat[GenericRecord]],
      classOf[AvroWrapper[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        var checked: Schema = null // one schema check per writer schema
        it.map { case (k, _) =>
          val rec = k.datum()
          if (!(rec.getSchema eq checked)) {
            val missing = names.filter(rec.getSchema.getField(_) == null)
            if (missing.nonEmpty) throw new IllegalArgumentException(
              s"AvroIO: expected field(s) ${missing.mkString(", ")} absent " +
                s"from the files' writer schema ${rec.getSchema.getFullName}" +
                " — the record getter would silently null them")
            checked = rec.getSchema
          }
          Row.fromSeq(names.toSeq.map { n =>
            rec.get(n) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
