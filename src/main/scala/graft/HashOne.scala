package graft

import org.apache.spark.sql.SparkSession

/** Equivalence helper for optimization rounds: prints a deterministic
  * hash of one query's full result (rows sorted, columns by name,
  * doubles printed at full precision) so a restructured plan can be
  * proven output-identical against the pre-change commit. Usage:
  *   runMain graft.HashOne q_name [sfDir]
  */
object HashOne {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q_")).toSeq
    val sfDir = args.find(a => !a.startsWith("q_"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries ++ Bench.benchOnly
    names.foreach { n =>
      val df0 = registry(n)(spark, sfDir)
      val df = df0.select(df0.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
      val rows = df.collect().map(_.toSeq.map {
        case null => "NULL"
        case d: Double => java.lang.Double.toHexString(d)
        case f: Float => java.lang.Float.toHexString(f)
        case x => x.toString
      }.mkString("")).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
      println(s"[hashone] $n rows=${rows.length} " +
        s"schema=${df.schema.map(f => f.name + ":" + f.dataType.sql).mkString(",")} " +
        s"md5=${md.digest().map("%02x".format(_)).mkString}")
      Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
