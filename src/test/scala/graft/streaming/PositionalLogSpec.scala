package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.Retrieval

/** Streaming positional-index maintenance: micro-batch appends to the
  * single positions log, then phrase/proximity over the loaded log
  * equals the one-shot build over everything that arrived — batch
  * boundaries cannot shift per-document positions.
  */
class PositionalLogSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val words = Vector("big", "order", "scan", "table", "value", "x")
  private def doc(rnd: scala.util.Random, len: Int): String =
    (0 until len).map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  private def phraseSet(post: org.apache.spark.sql.DataFrame) =
    Retrieval.phraseMatches(post, Seq("big", "order"))
      .as[(Long, Long)].collect().toSet

  test("3 micro-batches; load+phrase == one-shot; compaction + replay + late append") {
    implicit val sqlCtx = spark.sqlContext
    val indexDir = java.nio.file.Files.createTempDirectory("posstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("posckpt").toString
    val rnd = new scala.util.Random(11)
    val batches = Seq(
      (0L until 20L).map(i => (i, doc(rnd, 4 + rnd.nextInt(10)))),
      (20L until 40L).map(i => (i, doc(rnd, 4 + rnd.nextInt(10)))),
      (40L until 60L).map(i => (i, doc(rnd, 4 + rnd.nextInt(10)))))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = StreamingRetrieval.maintainPositional(docs, "doc_id", "text",
      indexDir, ckpt).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val all = batches.flatten.toDF("doc_id", "text")
    val expected = phraseSet(
      Retrieval.positionalPostings(all, "doc_id", "text"))
    assert(expected.nonEmpty, "fixture must produce phrase matches")
    assert(phraseSet(StreamingRetrieval.loadPositional(spark, indexDir))
      == expected)

    // proximity parity too
    val expectedProx = Retrieval.proximityPairs(
        Retrieval.positionalPostings(all, "doc_id", "text"),
        "table", "value", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(Retrieval.proximityPairs(
        StreamingRetrieval.loadPositional(spark, indexDir),
        "table", "value", 3)
      .as[(Long, Long, Long)].collect().toSet == expectedProx)

    // a retried (at-least-once) batch REWRITES its partition
    val rowsBefore = StreamingRetrieval.loadPositional(spark, indexDir).count()
    StreamingRetrieval.appendPositional(indexDir, "doc_id", "text")(
      batches(1).toDF("doc_id", "text"), 1L)
    assert(StreamingRetrieval.loadPositional(spark, indexDir).count()
      == rowsBefore)

    // compaction folds to one term-clustered -1 generation, results
    // unchanged, ledger holds the folded ids
    StreamingRetrieval.compactPositional(spark, indexDir)
    assert(spark.read.parquet(s"$indexDir/positions")
      .select(col("batch_id").cast("long")).distinct()
      .as[Long].collect().toSet == Set(-1L))
    assert(phraseSet(StreamingRetrieval.loadPositional(spark, indexDir))
      == expected)
    assert(BatchState.readFolded(spark, indexDir) == Set(0L, 1L, 2L))

    // replay-after-fold is a no-op (re-appending would duplicate rows)
    val foldedRows = StreamingRetrieval.loadPositional(spark, indexDir).count()
    StreamingRetrieval.appendPositional(indexDir, "doc_id", "text")(
      batches(0).toDF("doc_id", "text"), 0L)
    assert(StreamingRetrieval.loadPositional(spark, indexDir).count()
      == foldedRows)

    // appends keep working after a fold; union parity holds
    val late = (60L until 70L).map(i => (i, doc(rnd, 4 + rnd.nextInt(10))))
    StreamingRetrieval.appendPositional(indexDir, "doc_id", "text")(
      late.toDF("doc_id", "text"), 3L)
    val allLate = (batches.flatten ++ late).toDF("doc_id", "text")
    assert(phraseSet(StreamingRetrieval.loadPositional(spark, indexDir))
      == phraseSet(Retrieval.positionalPostings(allLate, "doc_id", "text")))
  }

  test("standalone compactPositional self-repairs a crashed swap " +
      "(retire-to-promote window, ADVICE r17)") {
    val indexDir = java.nio.file.Files.createTempDirectory("posrecover").toString
    val rnd = new scala.util.Random(17)
    val batches = (0 until 3).map(b =>
      (b * 10L until b * 10L + 10L).map(i => (i, doc(rnd, 6 + rnd.nextInt(8)))))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.appendPositional(indexDir, "doc_id", "text")(
        b.toDF("doc_id", "text"), i.toLong)
    }
    val all = batches.flatten.toDF("doc_id", "text")
    val expected = phraseSet(
      Retrieval.positionalPostings(all, "doc_id", "text"))
    // simulate a compaction crash in the one non-atomic window: the
    // candidate is complete under _compacting, the live dir retired to
    // _old, and NO live dir exists
    val livePath = s"$indexDir/positions"
    val (f, live) = BatchState.fs(spark, livePath)
    val tmp = new org.apache.hadoop.fs.Path(s"${livePath}_compacting")
    assert(f.rename(live, tmp), "fixture: retire live to candidate")
    f.mkdirs(new org.apache.hadoop.fs.Path(s"${livePath}_old"))
    // a STANDALONE compaction (no append/load healed the log first)
    // must promote the candidate instead of failing path-not-found
    StreamingRetrieval.compactPositional(spark, indexDir)
    assert(spark.read.parquet(livePath)
      .select(col("batch_id").cast("long")).distinct()
      .as[Long].collect().toSet == Set(-1L))
    assert(phraseSet(StreamingRetrieval.loadPositional(spark, indexDir))
      == expected)
    assert(!f.exists(tmp) &&
      !f.exists(new org.apache.hadoop.fs.Path(s"${livePath}_old")))
  }

  test("autoCompactEvery folds in-band; results identical") {
    val indexDir = java.nio.file.Files.createTempDirectory("posauto").toString
    val rnd = new scala.util.Random(13)
    val batches = (0 until 6).map(b =>
      (b * 10L until b * 10L + 10L).map(i => (i, doc(rnd, 4 + rnd.nextInt(10)))))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.appendPositional(indexDir, "doc_id", "text",
        autoCompactEvery = 3)(b.toDF("doc_id", "text"), i.toLong)
    }
    // with trigger 3, unfolded partitions never exceed the trigger
    assert(BatchState.unfoldedBatches(spark, s"$indexDir/positions") <= 3)
    val all = batches.flatten.toDF("doc_id", "text")
    assert(phraseSet(StreamingRetrieval.loadPositional(spark, indexDir))
      == phraseSet(Retrieval.positionalPostings(all, "doc_id", "text")))
  }
}
