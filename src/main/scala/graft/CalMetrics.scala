package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-operator metric dump for the full13 calculated stage: runs the
  * cascade via the noop sink, then prints every physical operator with
  * its SQL metrics — the "which of the ~20 window/sort operators owns
  * the 115 CPU-seconds" view. Usage: runMain graft.CalMetrics [sfDir]
  */
object CalMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cums = graft.etd.Model.cumulativeColumns
    def build() = {
      val withCums = graft.queries.QueriesEtd.full13Input(spark, sfDir)
      graft.etd.Pipeline.run(withCums, cums).calculated
    }
    // warm twice so JIT/codegen caches are steady
    build().write.format("noop").mode("overwrite").save()
    val cal = build()
    @volatile var ran: Option[org.apache.spark.sql.execution.QueryExecution] = None
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = ran = Some(qe)
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    val t0 = System.nanoTime()
    cal.write.format("noop").mode("overwrite").save()
    println(f"[calmetrics] exec=${(System.nanoTime() - t0) / 1e9}%.2fs")
    Thread.sleep(1000)
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = Set("sortTime", "spillSize", "peakMemory",
        "numOutputRows", "aggTime", "shuffleWriteTime", "fetchWaitTime",
        "dataSize", "shuffleBytesWritten")
      val ms = p.metrics.collect {
        case (k, m) if interesting(k) && m.value != 0 => s"$k=${m.value}"
      }.mkString(" ")
      println(s"[op] ${"  " * depth}${p.nodeName} $ms")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          println(s"[op] ${"  " * (depth + 1)}(reused ${r.child.nodeName})")
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    ran.map(_.executedPlan).foreach(walk(_, 0))
    spark.stop()
  }
}
