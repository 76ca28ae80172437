package graft

/** Dev tool (test scope): dump executed plans for ad-hoc audit.
  * `sbt "Test/runMain graft.ExplainAudit sm06_quantized_topk ..."` */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary")
    names.foreach { n =>
      println(s"=== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(5000))
    }
  }
}
