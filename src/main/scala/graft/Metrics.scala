package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Runtime IO/shuffle accounting for a block of Spark actions — the
  * measurement-side companion to the plan-shape guards: PlanSpec pins
  * that a filter is *printed* as pushed, [[Metrics.measure]] proves the
  * scan actually *read fewer bytes*. The same counters are what an
  * operations team alarms on at 100 TB (a query whose input-bytes
  * suddenly 100×es has lost its pushdown), so the harness doubles as
  * the library's observability surface.
  *
  * Implementation: a [[SparkListener]] accumulating task-level metrics
  * (input bytes/records, shuffle read/write bytes, spill) across every
  * job the measured block triggers. Listener events are delivered
  * asynchronously, so [[Metrics.measure]] drains the listener bus
  * before detaching — exact totals, no sampling. Counters are
  * LongAdders: tasks complete concurrently on a 32-thread local
  * scheduler (or any real cluster's event stream). */
object Metrics {

  final case class IoMetrics(
      inputBytes: Long, inputRecords: Long,
      shuffleReadBytes: Long, shuffleWriteBytes: Long,
      spillBytes: Long)

  /** Run `body`, returning its result plus the exact task-metric totals
    * of every job it triggered on this session. */
  def measure[T](spark: SparkSession)(body: => T): (T, IoMetrics) = {
    val inB, inR, srB, swB, sp = new LongAdder
    // only stages of jobs STARTED while attached are accumulated:
    // a concurrent job on the shared SparkContext (another suite, a
    // background stream) must not be attributed to the measured block
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobStart.stageIds.foreach(id => stages.add(id))
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val m = taskEnd.taskMetrics
        if (m != null && stages.contains(taskEnd.stageId)) {
          inB.add(m.inputMetrics.bytesRead)
          inR.add(m.inputMetrics.recordsRead)
          srB.add(m.shuffleReadMetrics.totalBytesRead)
          swB.add(m.shuffleWriteMetrics.bytesWritten)
          sp.add(m.diskBytesSpilled)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val result = body
      // task-end events are posted asynchronously and the internal
      // bus-drain API is private[spark]: quiesce on the public surface
      // by polling until the counters are stable for two consecutive
      // windows (all actions in `body` have already returned, so only
      // in-flight event delivery remains; bounded wait as a backstop)
      def snap() = (inB.sum, inR.sum, srB.sum, swB.sum, sp.sum)
      var last = snap()
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val cur = snap()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      (result, IoMetrics(inB.sum, inR.sum, srB.sum, swB.sum, sp.sum))
    } finally sc.removeSparkListener(listener)
  }
}
