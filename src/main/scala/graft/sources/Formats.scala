package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Reader/writer surface over Spark's built-in sources — the engine's
  * answer to the reference's single pluggable `LoaderFunc`
  * (filesystem.go:10-12): instead of one parse hook, a format registry
  * with schema inference or explicit schemas, and writers (the
  * reference's Finalizer, interfaces.go:66-78, generalized to
  * distributed sinks).
  *
  * Scale notes: always prefer parquet (columnar, predicate pushdown,
  * column pruning); `partitionBy` on write creates the directory
  * layout partition pruning reads back; text/csv/json exist for
  * ingest/egress interop.
  */
object Formats {
  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv", "text", "binaryFile")

  def read(spark: SparkSession, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  def write(df: DataFrame, format: String, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format(format).mode(mode).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }
}
