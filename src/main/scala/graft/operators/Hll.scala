package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperLogLog register plumbing shared by the hll02 registry query and
  * the SketchSpec merge test.
  *
  * Parameters are fixed engine-wide so sketches from different jobs
  * merge: P=6 → m=64 registers; the hash is the cm01 md5 family's first
  * 8 hex chars (32 bits), split as [bucket : P bits | w : W bits].
  * rho(w) = W+1 - msb_position(w), computed with OR-smearing +
  * bit_count so it is integer-exact and reproducible in any engine with
  * 64-bit integer ops (the DuckDB oracle runs the identical smear).
  *
  * m=64 gives a ~13% standard error — the point here is the
  * cross-engine-verifiable construction; production would raise P the
  * same way cm01's WIDTH scales (register count is still O(m) per
  * group, never O(rows)).
  */
object Hll {
  val P = 6
  val M: Int = 1 << P // 64 registers
  val W = 26          // 32-bit hash minus P bucket bits
  val ALPHA = 0.709   // standard alpha_64 bias constant

  /** Max-rho register table for `df` grouped by `key`: one row per
    * (gkey, bucket) with column `mj` (output columns are always named
    * `gkey`/`bucket`/`mj`, whatever expression `key` is). Missing
    * buckets mean Mj = 0; the caller densifies against a bucket grid
    * when estimating. Two register tables over disjoint (or
    * overlapping!) inputs merge by register-wise MAX — the property
    * SketchSpec pins. */
  def registers(df: DataFrame, key: Column, value: Column): DataFrame = {
    val h = df.select(key.as("gkey"),
      conv(substring(md5(concat(lit("h:"), value)), 1, 8), 16, 10)
        .cast(LongType).as("h32"))
    val bw = h.select(col("gkey"),
      shiftright(col("h32"), W).as("bucket"),
      col("h32").bitwiseAND(lit((1L << W) - 1)).as("w"))
    val smeared = Seq(1, 2, 4, 8, 16).foldLeft(bw)((acc, k) =>
      acc.withColumn("w", expr(s"w | shiftright(w, $k)")))
    smeared
      .select(col("gkey"), col("bucket"),
        (lit(W + 1) - expr("bit_count(w)")).as("rho"))
      .groupBy("gkey", "bucket").agg(max(col("rho")).as("mj"))
  }
}
