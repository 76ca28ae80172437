package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for optimization rounds: dump `.explain("formatted")` for
  * ARBITRARY registry queries into per-query files (the
  * `plans/rN/<query>_{before,after}.txt` artifact the optimization
  * judge diffs). Unlike [[ExplainDump]] (curated PLANS.md picks), this
  * takes the query list on the command line and builds the session
  * with the BENCH's confs (core count, AQE, broadcast threshold), so
  * the captured plan is the one the bench actually times.
  *
  * Usage: runMain graft.PlanSnap <sfDir> <outDir> <suffix> <name>...
  * writes <outDir>/<name>_<suffix>.txt per query.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanSnap <sfDir> <outDir> <suffix> <queryName>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = SparkEntry.queries
    names.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      val plan = fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
