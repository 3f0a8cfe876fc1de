package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class QualityClassifierSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  // separable toy corpus: "clean" docs share curated-prose vocabulary,
  // "junk" docs share boilerplate-spam vocabulary, no word overlap
  private def corpus = Seq(
    (1L, "the meter readings arrive hourly from every household", 1.0),
    (2L, "weather stations report temperature and wind each hour", 1.0),
    (3L, "solar panels convert sunlight into household electricity", 1.0),
    (4L, "click here buy now free offer limited deal", 0.0),
    (5L, "win win prize click subscribe now free bonus", 0.0),
    (6L, "cheap deal buy buy click offer prize now", 0.0))
    .toDF("doc_id", "text", "label")

  test("train separates a separable corpus; scoring is the margin expression") {
    val (w, b) = QualityClassifier.train(corpus, "text", "label",
      dim = 256, iterations = 40, lr = 1.0)
    val scored = corpus
      .withColumn("m", QualityClassifier.margin(col("text"), w, b, 256))
      .withColumn("p", QualityClassifier.score(col("text"), w, b, 256))
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val pos = Seq(1L, 2L, 3L).map(scored(_))
    val neg = Seq(4L, 5L, 6L).map(scored(_))
    assert(pos.forall(_._1 > 0) && neg.forall(_._1 < 0),
      s"margins must separate: $scored")
    assert(pos.map(_._2).min > neg.map(_._2).max)
    // unseen docs from each vocabulary land on the right side
    val unseen = Seq((10L, "household readings and weather", -1.0),
      (11L, "free prize click now", -1.0)).toDF("doc_id", "text", "label")
    val u = unseen.withColumn("m", QualityClassifier.margin(col("text"), w, b, 256))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(u(10L) > u(11L))
  }

  test("training is deterministic under repartitioning (decimal gradient sums)") {
    val (w1, b1) = QualityClassifier.train(corpus, "text", "label",
      dim = 128, iterations = 10)
    val (w2, b2) = QualityClassifier.train(corpus.repartition(7), "text", "label",
      dim = 128, iterations = 10)
    assert(b1 == b2)
    assert(w1.toSeq == w2.toSeq, "bit-identical weights under any partitioning")
  }

  test("margin conventions: empty doc scores bias; repeats weight the mean") {
    val w = Array.tabulate(64)(_.toDouble / 100)
    val df = Seq((1L, ""), (2L, "word"), (3L, "word word word")).toDF("id", "t")
    val got = df.withColumn("m", QualityClassifier.margin(col("t"), w, 0.25, 64))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 0.25)
    // single-token docs have one unigram gram and no bigrams; repeating
    // the token adds bigram buckets too, but the mean convention keeps
    // every margin within [bias + min w, bias + max w]
    assert(got(2L) >= 0.25 && got(2L) <= 0.25 + 0.63)
    assert(got(3L) >= 0.25 && got(3L) <= 0.25 + 0.63)
  }
}
