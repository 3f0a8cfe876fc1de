package graft.etd

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The reference-options facade: path conventions must match the
  * reference's composition rules exactly, and the loaders must read
  * what [[Pipeline.writeStages]]-shaped layouts write.
  */
class EtdOptionsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("path builders encode the reference conventions") {
    val o = EtdOptions("m", "a")
    assert(o.householdPath("5min") == "a/household_5min.parquet")
    assert(o.householdPath("default") == "a/household_default.parquet")
    assert(o.aggregatePath("project", "60min") == "a/project_60min.parquet")
    // aggregate.py:324 safe-name rule: lowercase, \W+ -> _
    assert(o.safeName("My Table-Name!") == "my_table_name_")
    assert(o.aggregatePath("Huis Data", "24h") == "a/huis_data_24h.parquet")
    assert(o.indexPath == "m/index.parquet")
    // unset weather option fails loudly, like unset reference options
    assertThrows[RuntimeException](o.weatherDataTable(spark))
  }

  test("loaders read a writeStages-shaped layout under the option roots") {
    val root = java.nio.file.Files.createTempDirectory("etdopts")
    val o = EtdOptions(s"$root/mapped", s"$root/aggregate")

    Seq((1L, 0L, "p1"), (2L, 1L, "p2"))
      .toDF("HuisIdBSV", "ProjectIdBSV", "meta")
      .write.parquet(o.indexPath)
    Seq((1L, 0L, 2.5), (2L, 1L, 3.5))
      .toDF("HuisIdBSV", "ProjectIdBSV", "ElektriciteitsgebruikTotaalDiff")
      .write.parquet(o.householdPath("5min"))
    Seq((0L, 10.0)).toDF("ProjectIdBSV", "total")
      .write.parquet(o.aggregatePath("project", "5min"))

    val ix = o.indexTable(spark)
    assert(ix.count() == 2)

    val hh = o.householdTables(spark, wanted = Seq("5min"))
    assert(hh.keySet == Set("5min"))
    // the index metadata rode the broadcast join on
    assert(hh("5min").columns.contains("meta"))
    assert(hh("5min").filter(col("HuisIdBSV") === 1L)
      .select("meta").as[String].head() == "p1")

    val pr = o.projectTables(spark, wanted = Seq("5min"))
    assert(pr("5min").count() == 1)
    assert(o.aggregateTable(spark, "Project", "5min").count() == 1,
      "safe-name must route display names to the same file")
  }

  test("weatherDataTable runs the full weather chain off the option folder") {
    val dir = java.nio.file.Files.createTempDirectory("etdopts_knmi").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "uurgeg_260.txt"))
    w.println("# KNMI hourly data")
    w.println("# STN,YYYYMMDD,HH,T,FH,U")
    (1 to 24).foreach(h => w.println(s"260,20230101,$h,${-10 - h},30,90"))
    w.close()
    val o = EtdOptions(weatherDataFolderPath = Some(dir.getAbsolutePath))
    val wt = o.weatherDataTable(spark)
    assert(wt.count() == 24)
    // the chain actually ran: derived measures + rolling/weekly columns
    Seq("Temperatuur", "TemperatuurRA", "Koudste2WkTemperatuur",
      "TemperatuurISOWk").foreach(c =>
      assert(wt.columns.contains(c), s"missing weather column $c"))
  }
}
