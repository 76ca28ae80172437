package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"PROF $name median=${ts.sorted.apply(2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val wide = orders.agg(
      count(col("o_orderkey")).cast(DoubleType).as("ok_count"),
      countDistinct(col("o_orderkey")).cast(DoubleType).as("ok_distinct"),
      min(col("o_orderkey")).cast(DoubleType).as("ok_min"),
      max(col("o_orderkey")).cast(DoubleType).as("ok_max"),
      count(col("o_custkey")).cast(DoubleType).as("ck_count"),
      countDistinct(col("o_custkey")).cast(DoubleType).as("ck_distinct"),
      min(col("o_custkey")).cast(DoubleType).as("ck_min"),
      max(col("o_custkey")).cast(DoubleType).as("ck_max"),
      count(col("o_totalprice")).cast(DoubleType).as("tp_count"),
      countDistinct(col("o_totalprice")).cast(DoubleType).as("tp_distinct"),
      min(col("o_totalprice")).as("tp_min"),
      max(col("o_totalprice")).as("tp_max"),
      count(col("o_orderstatus")).cast(DoubleType).as("st_count"),
      countDistinct(col("o_orderstatus")).cast(DoubleType).as("st_distinct"))
    time("wide_only")(wide.count())
    val stacked = wide.select(expr(
      "stack(14, 'o_orderkey','count',ok_count,'o_orderkey','distinct',ok_distinct," +
      "'o_orderkey','min',ok_min,'o_orderkey','max',ok_max," +
      "'o_custkey','count',ck_count,'o_custkey','distinct',ck_distinct," +
      "'o_custkey','min',ck_min,'o_custkey','max',ck_max," +
      "'o_totalprice','count',tp_count,'o_totalprice','distinct',tp_distinct," +
      "'o_totalprice','min',tp_min,'o_totalprice','max',tp_max," +
      "'o_orderstatus','count',st_count,'o_orderstatus','distinct',st_distinct) AS (col_name, metric, value)"))
    time("stacked")(stacked.count())
    time("stacked_sorted")(stacked.orderBy("col_name","metric").count())
    println(stacked.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
