package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.NgramLm

/** Streaming KN-LM count maintenance: micro-batch count appends fold
  * into EXACTLY the model a batch retrain over everything-that-arrived
  * builds, before and after log compaction.
  */
class StreamingLmSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def modelRows(counts: org.apache.spark.sql.DataFrame) =
    NgramLm.modelTable(NgramLm.trainFromCounts(counts))
      .as[(String, String, String, Long, Double)].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq

  test("3 micro-batches; fold == batch retrain; compaction preserves it") {
    implicit val sqlCtx = spark.sqlContext
    val countsDir = java.nio.file.Files.createTempDirectory("lmcounts").toString + "/log"
    val ckpt = java.nio.file.Files.createTempDirectory("lmckpt").toString

    val batches = Seq(
      Seq((0L, "the cat sat"), (1L, "the cat ate")),
      Seq((2L, "a dog sat"), (3L, "the dog ate the cat")),
      Seq((4L, ""), (5L, "the cat sat")))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = StreamingLm.maintainCounts(docs, "doc_id", "text",
      countsDir, ckpt).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val expected = modelRows(NgramLm.trigramCounts(all, "doc_id", "text"))
    assert(modelRows(StreamingLm.loadCounts(spark, countsDir)) == expected)

    // one delta generation per batch before compaction, one after —
    // and the folded model is unchanged
    assert(spark.read.parquet(countsDir)
      .select("batch_id").distinct().count() == 3)
    StreamingLm.compactCounts(spark, countsDir)
    assert(spark.read.parquet(countsDir)
      .select("batch_id").distinct().count() == 1)
    assert(modelRows(StreamingLm.loadCounts(spark, countsDir)) == expected)

    // the ledger rode the swap: every folded id is readable from the
    // LIVE dir after compaction (ADVICE r15: a ledger written into the
    // pre-swap dir is destroyed by swapIn's retire)
    assert(BatchState.readFolded(spark, countsDir) == Set(0L, 1L, 2L))

    // replay-after-fold is a no-op: a checkpoint-loss replay of batch 1
    // must NOT re-write its batch_id=1 partition next to the -1 fold
    // (that would double the batch's trigram counts — every KN
    // probability downstream would silently corrupt)
    StreamingLm.appendBatch(countsDir, "doc_id", "text")(
      batches(1).toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(countsDir)
      .select("batch_id").distinct().count() == 1)
    assert(modelRows(StreamingLm.loadCounts(spark, countsDir)) == expected)

    // a second compaction after the fold keeps the ledger monotone
    StreamingLm.compactCounts(spark, countsDir)
    assert(BatchState.readFolded(spark, countsDir) == Set(0L, 1L, 2L))
    assert(modelRows(StreamingLm.loadCounts(spark, countsDir)) == expected)
  }
}
