package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etd.Model

/** Streaming resample semantics via MemoryStream micro-batches: the gated
  * aggregates match the batch path once the watermark closes a bucket.
  */
class StreamingResampleSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("streaming resample gates buckets and matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val readings = input.toDF()
      .toDF(Model.ProjectId, Model.HouseId, Model.ReadingDate, "v")

    val resampled = StreamingResample.resampleStream(
      readings, Seq("v" -> "sum"), "15min", lateness = "0 seconds")

    val query = resampled.writeStream
      .format("memory")
      .queryName("resampled_test")
      .outputMode("append")
      .start()

    def ts(min: Int, sec: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

    // bucket [00:00, 00:15): 3 readings -> passes min_count 3
    input.addData((1L, 1L, ts(0), 1.0), (1L, 1L, ts(5), 2.0), (1L, 1L, ts(10), 3.0))
    // bucket [00:15, 00:30): 2 readings -> below min_count 3 -> null sum
    input.addData((1L, 1L, ts(16), 4.0), (1L, 1L, ts(20), 5.0))
    // advance the watermark past both buckets so they emit
    input.addData((1L, 1L, ts(45), 0.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("resampled_test")
      .select(col(Model.ReadingDate).cast("long").as("b"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val base = ts(0).getTime / 1000
    assert(out(base).contains(6.0), "full bucket passes the gate with its sum")
    assert(out(base + 900).isEmpty, "2-reading bucket is gated to null")
  }
}
