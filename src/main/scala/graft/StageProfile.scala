package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for one query: runs it warm (3 reps), then
  * prints the last rep's stages sorted by executor-run time — the
  * "where do the CPU seconds go" view the bench's per-query totals
  * cannot give. Usage: runMain graft.StageProfile q_name [sfDir]
  */
object StageProfile {
  final case class St(id: Int, name: String, tasks: Int, runMs: Long,
                      cpuMs: Long, shuffleReadMB: Double,
                      shuffleWriteMB: Double, rows: Long,
                      spillMemMB: Double, spillDiskMB: Double,
                      peakMemMB: Double, gcMs: Long)

  def main(args: Array[String]): Unit = {
    val name = args.find(_.startsWith("q_")).getOrElse("q_pipeline_full13")
    val sfDir = args.find(a => !a.startsWith("q_"))
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
    val buf = scala.collection.mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        buf.synchronized {
          buf += St(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.outputMetrics.recordsWritten,
            m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
            m.peakExecutionMemory / 1e6, m.jvmGCTime)
        }
      }
    }
    val registry = SparkEntry.queries ++ Bench.benchOnly
    val fn = registry(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Checkpoints.sweep(spark)
      sec
    }
    run(); run() // warm
    spark.sparkContext.addSparkListener(listener)
    val sec = run()
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"[stageprofile] $name wall=$sec%.2fs stages=${buf.size} " +
      f"taskRunSec=${buf.map(_.runMs).sum / 1e3}%.1f " +
      f"taskCpuSec=${buf.map(_.cpuMs).sum / 1e3}%.1f")
    buf.sortBy(-_.runMs).take(40).foreach { s =>
      println(f"[stage] ${s.id}%4d run=${s.runMs / 1e3}%7.2fs " +
        f"cpu=${s.cpuMs / 1e3}%7.2fs gc=${s.gcMs / 1e3}%5.2fs tasks=${s.tasks}%3d " +
        f"sr=${s.shuffleReadMB}%8.2fMB sw=${s.shuffleWriteMB}%8.2fMB " +
        f"spill=${s.spillMemMB}%8.1f/${s.spillDiskMB}%7.1fMB " +
        f"peak=${s.peakMemMB}%8.1fMB ${s.name}")
    }
    spark.stop()
  }
}
