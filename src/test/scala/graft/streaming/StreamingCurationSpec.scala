package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.TextFunctions

/** Streaming curation chain: quality gate + PII redaction + exact dedup
  * in one query; the stateless stages agree with the batch expressions
  * on the same data.
  */
class StreamingCurationSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // long enough to clear the 50-word length gate, stopword-rich
  private val good = ("the quick brown fox jumps over the lazy dog and then " * 6).trim

  test("quality gate drops junk; PII redacts; dedup keeps first redacted copy") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")

    val curated = StreamingCuration.curateStream(docs, "text", "ts",
      minQuality = 0.5, lateness = "10 minutes")
    val query = curated.writeStream
      .format("memory").queryName("curation_test").outputMode("append")
      .start()

    input.addData(
      (1L, s"$good mail a@b.org", ts(0)),
      (2L, "zxqj", ts(1)))                      // junk: fails the gate
    query.processAllAvailable()
    input.addData(
      (3L, s"$good mail c@d.net", ts(2)),      // same text after redaction
      (4L, s"$good totally new content", ts(3)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("curation_test").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
    assert(rows.keySet == Set(1L, 4L),
      "junk gated out; PII-differing duplicate collapsed to first arrival")
    assert(rows(1L).endsWith("mail <EMAIL>"), "PII redacted in the output")

    // stateless stages == batch expressions on the same frame
    val batch = Seq((1L, s"$good mail a@b.org"), (2L, "zxqj"))
      .toDF("id", "text")
      .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
      .withColumn("text", TextFunctions.redactPii(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch == Map(1L -> rows(1L)),
      "streaming stateless stages must equal the batch expressions")
  }

  test("trained-classifier margin gates a stream (pure expression, no state)") {
    implicit val sqlCtx = spark.sqlContext
    // train in batch on a separable corpus, then gate a STREAM with the
    // same margin expression — model-based filtering is deployable in
    // both modes because scoring is a stateless column expression
    val corpus = Seq(
      (1L, "meter readings arrive hourly from the household", 1.0),
      (2L, "solar panels convert sunlight into electricity", 1.0),
      (3L, "click here buy now free offer prize", 0.0),
      (4L, "win free prize click subscribe now", 0.0)).toDF("doc_id", "text", "label")
    val (w, b) = graft.llm.QualityClassifier.train(corpus, "text", "label",
      dim = 128, iterations = 30, lr = 1.0)

    val input = MemoryStream[(Long, String)]
    val gated = input.toDF().toDF("id", "text")
      .filter(graft.llm.QualityClassifier.margin(col("text"), w, b, 128) > 0)
    val query = gated.writeStream
      .format("memory").queryName("clf_gate_test").outputMode("append").start()
    input.addData(
      (10L, "household meter readings and solar electricity"),
      (11L, "free prize click now"))
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("clf_gate_test").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), s"stream gate must pass clean, drop spam: $kept")
  }
}
