package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off driver-time decomposition of the full13 flagship: where do
  * the seconds of a submission go BEFORE any task runs? Splits
  * construction (eager per-select analysis) from the single
  * optimize+physical-plan pass `localCheckpoint`'s toRdd triggers, and
  * from execution. Usage: runMain graft.Phases [sfDir]
  */
object Phases {
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
    SchemaCanary.warn(spark, sfDir)
    try spark.read.parquet(s"$sfDir/events.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for (rnd <- 1 to 3) {
      val t0 = System.nanoTime()
      val cums = graft.etd.Model.cumulativeColumns
      val withCums = graft.queries.QueriesEtd.full13Input(spark, sfDir)
      val stages = graft.etd.Pipeline.run(withCums, cums,
        intervals = Seq("5min", "60min", "24h"))
      val cal0 = stages.calculated // forces all per-select analyses
      val t1 = System.nanoTime()
      val rdd = cal0.queryExecution.toRdd // optimize + physical plan
      val t2 = System.nanoTime()
      val n = rdd.count() // execute the cascade
      val t3 = System.nanoTime()
      println(f"[phases] round $rnd: construct+analyze=${(t1 - t0) / 1e9}%6.2fs " +
        f"optimize+plan=${(t2 - t1) / 1e9}%6.2fs execute=${(t3 - t2) / 1e9}%6.2fs " +
        s"rows=$n")
    }
    // per-rule cumulative time across the 3 rounds — which optimizer
    // rules own the 4-7 s optimize+plan phase
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      .linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
