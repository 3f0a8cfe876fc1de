package graft
import org.apache.spark.sql.SparkSession
object DumpCal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val withCums = graft.queries.QueriesEtd.full13Input(spark, "/root/testdata/sf0.001")
    println("==== q_pipeline_full13 calculated stage ====")
    graft.etd.Pipeline.run(withCums, graft.etd.Model.cumulativeColumns)
      .calculated.explain("formatted")
    spark.stop()
  }
}
