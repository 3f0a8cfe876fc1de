package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.CorpusProfile

/** Streaming profile maintainer: after any number of micro-batches the
  * persisted state equals the one-shot profile of everything ingested
  * — the fold identity, maintained through foreachBatch.
  */
class StreamingProfileSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("two batches fold into the exact whole-ingest profile") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("profile_spec").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    // k small enough to saturate: the identity must not lean on the
    // exact regime
    val query = StreamingProfile.maintain(docs, "source", "doc_id",
      "text", state, ckpt, k = 8, kq = 4)

    def doc(i: Long) =
      (i, s"src${i % 3}", s"word${i % 7} text body number $i repeated " * (1 + (i % 5).toInt))
    input.addData((0L until 40L).map(doc): _*)
    query.processAllAvailable()
    input.addData((40L until 100L).map(doc): _*)
    query.processAllAvailable()
    query.stop()

    val persisted = CorpusProfile.report(
        StreamingProfile.loadState(spark, state).get, "source")
      .collect().map(_.toSeq).toSet
    val oneShot = CorpusProfile.report(
        CorpusProfile.profile((0L until 100L).map(doc)
          .toDF("doc_id", "source", "text"), "source", "doc_id", "text",
          k = 8, kq = 4), "source")
      .collect().map(_.toSeq).toSet
    assert(persisted == oneShot,
      "maintained state must equal the one-shot profile of all batches")

    // the replay read-bound: a redelivered batch 1 folds from the
    // version BELOW its id — exactly the batch-0-only profile. Batch
    // 1's offsets commit only AFTER its foreachBatch returns, so a
    // crash in that gap replays batch 1 — v0 (batch 1's fold source)
    // must still be on disk, or the replay would fold from nothing
    // and destroy batch 0's history (ADVICE r12).
    import graft.streaming.BatchState
    assert(BatchState.versions(spark, state).sorted == Seq(0L, 1L),
      "batch 1's fold source v0 must survive until batch 2 commits")
    val preBatch1 = CorpusProfile.report(
        StreamingProfile.loadState(spark, state, beforeBatch = 1L).get,
        "source").collect().map(_.toSeq).toSet
    val batch0Only = CorpusProfile.report(
        CorpusProfile.profile((0L until 40L).map(doc)
          .toDF("doc_id", "source", "text"), "source", "doc_id", "text",
          k = 8, kq = 4), "source")
      .collect().map(_.toSeq).toSet
    assert(preBatch1 == batch0Only,
      "a replayed batch 1 must read exactly the pre-batch-1 state")
  }

  test("commitVersion survives a stale same-version dir; keeps fold source") {
    val tmp = Files.createTempDirectory("profile_commit").toString
    val st = s"$tmp/state"
    val d0 = Seq(("a", 1L)).toDF("g", "n")
    val d1 = Seq(("a", 2L)).toDF("g", "n")
    graft.streaming.BatchState.commitVersion(spark, st, 0L, d0)
    // failed attempt of batch 1 left a committed v1; the replay must
    // overwrite it, not error or append — and must still see v0
    graft.streaming.BatchState.commitVersion(spark, st, 1L, d0)
    graft.streaming.BatchState.commitVersion(spark, st, 1L, d1)
    assert(graft.streaming.BatchState.versions(spark, st).sorted == Seq(0L, 1L))
    assert(StreamingProfile.loadState(spark, st).get
      .collect().map(_.getLong(1)).toSeq == Seq(2L))
    assert(StreamingProfile.loadState(spark, st, beforeBatch = 1L).get
      .collect().map(_.getLong(1)).toSeq == Seq(1L),
      "replayed batch 1 reads its pre-batch state, not the stale attempt")
    // batch 2 commits → v0 (no longer any batch's fold source) freed
    graft.streaming.BatchState.commitVersion(spark, st, 2L, d1)
    assert(graft.streaming.BatchState.versions(spark, st).sorted == Seq(1L, 2L),
      "the predecessor is freed once the NEXT batch commits")
  }
}
