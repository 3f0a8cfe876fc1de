package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.Dedup

/** Streaming LSH near-dup: the stateful bucket pairing is tested over
  * micro-batches (duplicates arriving later pair with the earlier copy);
  * the banding stage is pinned against the batch LSH band keys so the
  * streaming pipeline flags exactly the pairs the batch path flags.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val textA = "w1 w2 w3 w4 w5 w6 w7 w8"
  private val textB = "x1 x2 x3 x4 x5 x6 x7 x8"

  test("stateful bucket pairing emits cross-micro-batch candidates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingNearDup.BandedDoc]
    val pairs = StreamingNearDup.candidatePairs(input.toDS())

    val query = pairs.writeStream
      .format("memory")
      .queryName("neardup_test")
      .outputMode("append")
      .start()

    input.addData(
      StreamingNearDup.BandedDoc("0|k1", 1L),
      StreamingNearDup.BandedDoc("0|k2", 3L))
    query.processAllAvailable()
    // doc 2 lands in doc 1's bucket in a LATER micro-batch
    input.addData(StreamingNearDup.BandedDoc("0|k1", 2L))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("neardup_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      "cross-batch duplicate pairs with the earlier copy; lone doc never pairs")
  }

  test("expiring buckets: watermark-passed state evicts; fresh pairs still emit") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(hour: Int) = Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
    val input = MemoryStream[StreamingNearDup.BandedDocTs]
    // 1h lateness: watermark trails max event time by 1h (rows at or
    // before the watermark would be dropped as late before the operator)
    val banded = input.toDS().withWatermark("eventTime", "1 hour")
      .as[StreamingNearDup.BandedDocTs]
    val pairs = StreamingNearDup.candidatePairsExpiring(banded,
      ttlMs = 3600 * 1000) // 1 hour
    val query = pairs.writeStream
      .format("memory").queryName("neardup_ttl").outputMode("append")
      .start()

    input.addData(StreamingNearDup.BandedDocTs("0|k1", 1L, ts(0)))
    query.processAllAvailable()
    // watermark -> ts(9), far past the bucket's ts(1) TTL -> state evicts
    input.addData(StreamingNearDup.BandedDocTs("9|zz", 99L, ts(10)))
    query.processAllAvailable()
    // doc 2 arrives in doc 1's bucket AFTER eviction: no stale pair
    input.addData(StreamingNearDup.BandedDocTs("0|k1", 2L, ts(11)))
    query.processAllAvailable()
    // doc 3 within doc 2's fresh horizon: pairs with 2 only
    input.addData(StreamingNearDup.BandedDocTs("0|k1", 3L, ts(12)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("neardup_ttl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 3L)),
      s"evicted member must not pair; fresh members must: $got")
  }

  test("re-arrival after eviction: old member re-pairs with post-horizon members only") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(hour: Int) = Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
    val input = MemoryStream[StreamingNearDup.BandedDocTs]
    val banded = input.toDS().withWatermark("eventTime", "1 hour")
      .as[StreamingNearDup.BandedDocTs]
    val pairs = StreamingNearDup.candidatePairsExpiring(banded,
      ttlMs = 3600 * 1000)
    val query = pairs.writeStream
      .format("memory").queryName("neardup_rearrival").outputMode("append")
      .start()

    // docs 1 and 2 share a bucket pre-horizon: pair (1,2) emits
    input.addData(
      StreamingNearDup.BandedDocTs("0|k1", 1L, ts(0)),
      StreamingNearDup.BandedDocTs("0|k1", 2L, ts(0)))
    query.processAllAvailable()
    // advance the watermark far past the bucket's TTL -> state evicts
    input.addData(StreamingNearDup.BandedDocTs("9|zz", 99L, ts(10)))
    query.processAllAvailable()
    // doc 1 RE-ARRIVES after the horizon: its old pairing is gone, so it
    // must NOT re-emit (1,2); it seeds a fresh bucket instead
    input.addData(StreamingNearDup.BandedDocTs("0|k1", 1L, ts(11)))
    query.processAllAvailable()
    // doc 3 lands in the re-seeded bucket: pairs with the re-arrived 1 only
    input.addData(StreamingNearDup.BandedDocTs("0|k1", 3L, ts(12)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("neardup_rearrival")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L)),
      s"re-arrived member pairs with post-horizon members only, no (2,3): $got")
  }

  test("banding stage matches the batch LSH (same signatures, same keys)") {
    val docs = Seq((1L, textA), (2L, textA), (3L, textB)).toDF("doc_id", "text")
    // run the streaming banding expressions in batch mode
    val buckets = StreamingNearDup.bandedStream(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // identical texts share every band bucket; different texts share none
    val byDoc = buckets.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty)
    // and the pairs implied by shared buckets equal the batch LSH pairs
    val batchPairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == Set((1L, 2L)))
  }
}
