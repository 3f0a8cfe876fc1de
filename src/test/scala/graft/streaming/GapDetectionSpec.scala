package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import GapDetection.{Gap, Reading}

class GapDetectionSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("stateful gap detection spans micro-batches via GroupState") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val gaps = GapDetection.detectGaps(input.toDS(), stepSec = 300L)

    val query = gaps.writeStream
      .format("memory")
      .queryName("gaps_test")
      .outputMode("append")
      .start()

    // batch 1: continuous then a 3-slot hole within the batch
    input.addData(Reading(1, 0, 1.0), Reading(1, 300, 1.0), Reading(1, 1500, 1.0))
    query.processAllAvailable()
    // batch 2: a 1-slot hole relative to state carried across batches
    input.addData(Reading(1, 2100, 1.0))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("gaps_test").as[Gap].collect()
      .map(g => (g.fromSec, g.toSec, g.missedSlots)).toSet
    assert(got == Set((600L, 1200L, 3L), (1800L, 1800L, 1L)))
  }
}
