package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-corpus ingestion: the reference's `FileSystem` abstraction
  * (interfaces.go:89-94) re-expressed as a DataFrame source.
  *
  * One row per file with schema
  * `(path string, dir string, depth int, length long, content binary)`;
  * `path` is root-relative and '/'-separated. Backed by Spark's
  * `binaryFile` source with `recursiveFileLookup` (the distributed
  * analog of the reference's single-threaded DFS traversal,
  * mapreduce.go:142-205 — Spark's InMemoryFileIndex lists in parallel
  * across executors).
  *
  * Scan pruning: a [[PathGlob]] is translated to the source's
  * `pathGlobFilter` when it is a simple one-segment suffix pattern, and
  * always re-checked post-scan, mirroring the reference's
  * CouldMatch-prune + Match-confirm split (work.go:19-37).
  */
object Corpus {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("dir", StringType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Read a directory tree rooted at `root` as a corpus DataFrame. */
  def read(spark: SparkSession, root: String): DataFrame =
    readFiltered(spark, root, None)

  /** Read with a path predicate. The basename of a glob whose
    * directory part is all globstars is pushed into the source's
    * `pathGlobFilter` (files skipped at listing time — the distributed
    * analog of the reference's scan-time pruning, work.go:68-99); the
    * exact predicate is always re-applied post-scan, mirroring the
    * reference's CouldMatch-prune / Match-confirm split. */
  def readFiltered(spark: SparkSession, root: String,
      predicate: Option[PathPredicate]): DataFrame = {
    val rootUri = "file:" + new java.io.File(root).getAbsolutePath
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    // A basename is only pushable if it's safe under BOTH glob
    // dialects: Hadoop's pathGlobFilter treats ? [ ] { } as
    // metacharacters that PathGlob treats literally, so pushing such a
    // pattern could silently prune files the predicate matches (or
    // throw at listing time). '*' is the only shared metachar.
    def hadoopSafe(seg: String): Boolean =
      seg.forall(c => c == '*' || c.isLetterOrDigit || "._-".contains(c))
    val pushed = predicate match {
      case Some(PathGlob(p)) =>
        val segs = p.split("/")
        // pushable iff every directory segment is a globstar (any depth)
        if (segs.length == 1 && hadoopSafe(segs.head))
          reader.option("pathGlobFilter", segs.head)
        else if (segs.init.forall(_ == "**") && hadoopSafe(segs.last))
          reader.option("pathGlobFilter", segs.last)
        else reader
      case _ => reader
    }
    val base = withDerivedColumns(
      pushed.load(root).select(
        regexp_replace(col("path"), java.util.regex.Pattern.quote(rootUri + "/"), "")
          .as("path"),
        col("length"), col("content")))
    predicate match {
      case Some(pred) => base.filter(r => pred.matches(r.getAs[String]("path")))
      case None => base
    }
  }

  /** In-memory corpus (the reference's StaticVirtualFileSystem,
    * virtualFileSystem.go:9-42) — for tests and small synthetic trees. */
  def fromRecords(spark: SparkSession, files: Seq[(String, Array[Byte])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = files.map { case (p, c) =>
      org.apache.spark.sql.Row(p, c.length.toLong, c)
    }.asJava
    val base = spark.createDataFrame(rows, StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true))))
    withDerivedColumns(base)
  }

  /** dir = parent folder ('' at root), depth = number of ancestors. */
  private def withDerivedColumns(df: DataFrame): DataFrame = df.select(
    col("path"),
    when(col("path").contains("/"),
      regexp_replace(col("path"), "/[^/]*$", "")).otherwise(lit("")).as("dir"),
    (size(split(col("path"), "/")) - 1).as("depth"),
    col("length"), col("content"))
}
