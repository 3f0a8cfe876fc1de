package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.{Embeddings, Similarity}

/** Streaming ANN index maintenance (append-only coded IVF-PQ) and the
  * incremental-moments PCA update that shares the serving loop.
  */
class StreamingSimilaritySpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(21)
  private def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  private val batches: Seq[Seq[(Long, Array[Float])]] = {
    var id = -1L
    Seq.fill(3)(Seq.fill(40) { id += 1; (id, vec()) })
  }
  private val all = batches.flatten

  test("micro-batch appends; load + coded search == batch-built index search") {
    implicit val sqlCtx = spark.sqlContext
    val indexDir = java.nio.file.Files.createTempDirectory("annstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("annckpt").toString

    // codebooks frozen from the FIRST batch (the seed corpus)
    val seed = batches.head.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(seed, "vec_id", "embedding", k = 4,
      iterations = 2)
    val pq = Similarity.pqTrain(seed, "vec_id", "embedding", m = 4, k = 8,
      iterations = 2)

    val input = MemoryStream[(Long, Array[Float])]
    val vectors = input.toDF().toDF("vec_id", "embedding")
    val query = StreamingSimilarity.maintainIndex(vectors, "vec_id", "embedding",
      coarse, pq, indexDir, ckpt).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val queries = all.take(3)
    val ranking = Similarity.probeRanking(coarse)
    def search(index: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqTopKCoded(index, "id", "codes", "cell",
          q => ranking(q).take(2), pq, queries, k = 5)
        .orderBy("query_id", "rank").collect().toSeq

    val allDf = all.toDF("vec_id", "embedding")
    val expected = search(
      Similarity.buildIvfPqIndex(allDf, "vec_id", "embedding", coarse, pq))
    val got = search(StreamingSimilarity.loadIndex(spark, indexDir))
    assert(got == expected)
    assert(expected.nonEmpty)

    // batch ids stamped on every appended row (as the partition — the
    // replay unit a retry dynamic-overwrites)
    def batchIds() = spark.read.parquet(s"$indexDir/coded")
      .select(col("batch_id").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(batchIds() == Set(0L, 1L, 2L))

    // compaction folds the log into one cell-clustered batch_id = -1
    // generation: search results identical, ledger holds the folded
    // ids, and a batch replaying after its fold is a no-op
    StreamingSimilarity.compactIndex(spark, indexDir)
    assert(search(StreamingSimilarity.loadIndex(spark, indexDir)) == expected,
      "compaction must not change search results")
    assert(batchIds() == Set(-1L), "all batches fold into -1")
    assert(BatchState.readFolded(spark, indexDir) == Set(0L, 1L, 2L))
    val before = spark.read.parquet(s"$indexDir/coded").count()
    StreamingSimilarity.appendBatch(indexDir, "vec_id", "embedding",
      coarse, pq)(batches(1).toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(s"$indexDir/coded").count() == before,
      "a replay-after-fold append must be a no-op")

    // a NEW batch still appends, and its own retry rewrites, never
    // duplicates
    val nb = Seq(500L -> vec()).toDF("vec_id", "embedding")
    StreamingSimilarity.appendBatch(indexDir, "vec_id", "embedding",
      coarse, pq)(nb, 3L)
    StreamingSimilarity.appendBatch(indexDir, "vec_id", "embedding",
      coarse, pq)(nb, 3L) // at-least-once retry
    assert(spark.read.parquet(s"$indexDir/coded").count() == before + 1)
    assert(batchIds() == Set(-1L, 3L))
  }

  test("incremental PCA: merged snapshot moments == union-trained model (fp tolerance)") {
    val a = batches(0).toDF("vec_id", "embedding")
    val b = (batches(1) ++ batches(2)).toDF("vec_id", "embedding")
    val merged = Embeddings.mergeMoments(
      Embeddings.moments(a, "embedding", dim),
      Embeddings.moments(b, "embedding", dim))
    val mInc = Embeddings.pcaFromMoments(merged, dim, k = 4)
    val mAll = Embeddings.pcaTrain(all.toDF("vec_id", "embedding"),
      "embedding", dim, k = 4)
    assert(mInc.n == mAll.n)
    mInc.mean.zip(mAll.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12) }
    mInc.eigenvalues.zip(mAll.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9) }
    mInc.components.zip(mAll.components).foreach { case (ci, ca) =>
      ci.zip(ca).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }
}
