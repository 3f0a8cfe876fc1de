package graft

import org.apache.spark.sql.SparkSession

/** Per-query phase profiler: splits wall-clock into analysis (DataFrame
  * construction), optimize+physical-planning, and execution, so a slow
  * query can be attributed to Catalyst or to the operators. Usage:
  *   runMain graft.Profile q_pipeline_e2e [sfDir]
  * (all headline queries if none given; sfDir defaults to
  * SPARK_GRAFT_SF_DIR, then sf0.1).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = if (args.exists(_.startsWith("q_")))
                  args.filter(_.startsWith("q_")).toSeq
                else Bench.headline
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
    SchemaCanary.warn(spark, sfDir)
    try spark.read.parquet(s"$sfDir/events.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val registry = SparkEntry.queries ++ Bench.benchOnly
    names.foreach { n =>
      registry.get(n).foreach { fn =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[profile] $n%-24s analyze=${(t1 - t0) / 1e9}%6.2fs " +
          f"plan=${(t2 - t1) / 1e9}%6.2fs exec=${(t3 - t2) / 1e9}%6.2fs")
      }
    }
    spark.stop()
  }
}
