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
        spark.read.parquet(state), "source")
      .collect().map(_.toSeq).toSet
    val oneShot = CorpusProfile.report(
        CorpusProfile.profile((0L until 100L).map(doc)
          .toDF("doc_id", "source", "text"), "source", "doc_id", "text",
          k = 8, kq = 4), "source")
      .collect().map(_.toSeq).toSet
    assert(persisted == oneShot,
      "maintained state must equal the one-shot profile of all batches")
  }
}
