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
    // version BELOW its id — exactly the batch-0-only profile — so
    // at-least-once delivery cannot double-count. (v0 is pruned once
    // v1 commits, so the bound resolves to None here; fold from the
    // batch profile alone, which is what a fresh start would do, is
    // the correct degenerate case. Assert the committed version is
    // batch 1's and only one version remains.)
    import graft.streaming.BatchState
    assert(BatchState.versions(spark, state) == Seq(1L),
      "old versions must be pruned after the new one is durable")
    assert(StreamingProfile.loadState(spark, state, beforeBatch = 1L).isEmpty)
  }

  test("commitVersion survives a stale same-version dir and prunes olds") {
    val tmp = Files.createTempDirectory("profile_commit").toString
    val st = s"$tmp/state"
    val d0 = Seq(("a", 1L)).toDF("g", "n")
    val d1 = Seq(("a", 2L)).toDF("g", "n")
    graft.streaming.BatchState.commitVersion(spark, st, 0L, d0)
    // failed attempt of batch 1 left a committed v1; the replay must
    // overwrite it, not error or append
    graft.streaming.BatchState.commitVersion(spark, st, 1L, d0)
    graft.streaming.BatchState.commitVersion(spark, st, 1L, d1)
    assert(graft.streaming.BatchState.versions(spark, st) == Seq(1L))
    assert(StreamingProfile.loadState(spark, st).get
      .collect().map(_.getLong(1)).toSeq == Seq(2L))
    assert(StreamingProfile.loadState(spark, st, beforeBatch = 1L).isEmpty,
      "pruned pre-batch state reads as None, never as the stale attempt")
  }
}
