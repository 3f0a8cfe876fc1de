package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints explain("formatted") for the named queries
  * (all headline queries if none given). Usage:
  *   runMain graft.Explain q_minhash_sig [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // a bare sfDir argument must not empty the query list (it used to:
    // filtering args for q_ names dropped everything, silently printing
    // zero plans) — fall back to the full headline set
    val qArgs = args.filter(_.startsWith("q_")).toSeq
    val names = if (qArgs.nonEmpty) qArgs else Bench.headline
    val sfDir = args.find(a => !a.startsWith("q_")).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench-only entries (q_pipeline_full13 &c) are explainable too —
    // the r20 verdict's plans/ deliverable needs them (r21)
    val registry = SparkEntry.queries ++ Bench.benchOnly
    names.foreach { n =>
      registry.get(n).foreach { fn =>
        println(s"==== $n ====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
