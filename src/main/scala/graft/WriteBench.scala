package graft

import org.apache.spark.sql.SparkSession

/** Production-sink benchmark: ONE real `Pipeline.writeStages` run — 13
  * cumulative columns, all five intervals, parquet encode included,
  * household-grain sinks partitioned by project — the write-bound
  * workflow the reference's staged pipeline actually performs
  * (aggregate.py:118-121,224-261,294-297,411-414,481-484 writes 12+
  * staged parquet files per run). q_pipeline_full13 deliberately
  * measures the same work volume WITHOUT the encode cost; this main
  * closes that gap with wall + bytes per stage file.
  *
  * Usage: runMain graft.WriteBench [sfDir] [outDir]
  * Prints one JSON line per stage file plus a total line.
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_write_bench")
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

    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

    val cums = graft.etd.Model.cumulativeColumns
    val withCums = graft.queries.QueriesEtd.full13Input(spark, sfDir)
    // localCheckpointEvery = cut lineage after the 13-column impute, the
    // production shape: 15 sinks share ONE impute materialization
    // instead of each re-running the cascade
    val stages = graft.etd.Pipeline.run(withCums, cums,
      localCheckpointEvery = Some(1))

    val out = new java.io.File(outDir)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    if (out.exists()) deleteRec(out)

    val t0 = System.nanoTime()
    graft.etd.Pipeline.writeStages(stages, outDir, partitionByProject = true)
    val totalSec = (System.nanoTime() - t0) / 1e9

    var totalBytes = 0L
    Option(out.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      .foreach { f =>
        val b = dirBytes(f)
        totalBytes += b
        println(s"""{"stage":"${f.getName}","bytes":$b}""")
      }
    println(f"""{"write_bench":"writeStages","sf":"$sfDir",""" +
      f""""stages":${Option(out.listFiles()).fold(0)(_.length)},""" +
      f""""total_bytes":$totalBytes,"sec":$totalSec%.2f}""")
    spark.stop()
  }
}
