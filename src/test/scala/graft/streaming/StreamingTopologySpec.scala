package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etd.Model
import StreamingImpute.CumReading

/** The composed streaming topology: raw cumulative readings ->
  * [[StreamingImpute]] (stateful gap closing) -> [[StreamingResample]]
  * (watermarked tumbling-window aggregation) in ONE streaming query —
  * two chained stateful operators, the readStream -> transforms ->
  * writeStream shape a production ingest runs. Append-mode
  * flatMapGroupsWithState followed by a watermarked window aggregation
  * is the supported chaining order.
  */
class StreamingTopologySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("impute -> resample chain: hourly gated sums over imputed diffs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CumReading]

    val readings = StreamingImpute.imputeStream(input.toDS())
      .toDF()
      .withColumn(Model.ReadingDate, timestamp_seconds(col("tsSec")))
      .withColumn(Model.ProjectId, lit(1L))
      .withColumnRenamed("huis", Model.HouseId)
      .withColumn("MeterDiff", col("diff"))
    val resampled = StreamingResample.resampleStream(
      readings, Seq("MeterDiff" -> "sum"), "60min", lateness = "10 minutes")

    val query = resampled.writeStream
      .format("memory").queryName("topo_test").outputMode("append").start()

    // 0.5 per 5-min slot; hour 1 (3600..6900) has a 2-slot gap closed at
    // 5100 (jump 1.5 over 3 -> linear fills of 0.5) — the imputed hour
    // must aggregate like a complete one.
    def cum(ts: Long): Option[Double] =
      if (ts == 4500L || ts == 4800L) None else Some(ts / 300L * 0.5)
    val hours01 = (0L to 6900L by 300L).map(ts => CumReading(7L, ts, cum(ts)))
    input.addData(hours01)
    query.processAllAvailable()
    // watermark pusher: an event far past hour 1 closes its window
    input.addData(CumReading(7L, 11000L, Some(99.0)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("topo_test")
      .select(col(Model.ReadingDate).cast("long"), col("MeterDiff"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // hour 0 emitted: only 11 of 12 diffs non-null (first reading has no
    // prior) -> min_count 12 gates the sum to null
    assert(rows(0L) == None, "gated: 11 < min_count 12")
    // hour 1: 12 diffs, two of them imputed fills, sum = 12 x 0.5
    assert(rows(3600L) == Some(6.0), s"imputed hour sums exactly: $rows")
  }
}
