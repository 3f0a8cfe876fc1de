package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Corpus versioning (diff), anchor-text extraction, and retrieval
  * rank evaluation: each against a hand-computable or brute-force
  * ground truth.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("corpusDiff: every status arm; null text uses the sentinel digest") {
    val oldC = Seq(
      (1L, "kept the same"),
      (2L, "will change"),
      (3L, "will be removed"),
      (5L, null.asInstanceOf[String]),        // null -> null: unchanged
      (6L, null.asInstanceOf[String])         // null -> text: changed
    ).toDF("doc_id", "text")
    val newC = Seq(
      (1L, "kept the same"),
      (2L, "has changed"),
      (4L, "brand new"),
      (5L, null.asInstanceOf[String]),
      (6L, "no longer null")
    ).toDF("doc_id", "text")
    val got = Snapshots.corpusDiff(oldC, newC, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"))
  }

  test("extractAnchorPairs: both quote styles, resolution, fragment/mailto drops") {
    val html =
      """<a href="http://t.example/x">first link</a>
        |<a class="c" href='/rooted'>second</a>
        |<a href="rel.html">third one</a>
        |<a href="#frag">skipped</a>
        |<a href="mailto:a@b.example">dropped</a>
        |<a href="http://t.example/y"><b>nested markup skipped</b></a>""".stripMargin
    val got = Seq(("http://h.example/dir/page", html)).toDF("url", "html")
      .select(explode(UrlFunctions.extractAnchorPairs(col("url"), col("html")))
        .as("a"))
      .select("a.link", "a.anchor")
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("http://t.example/x", "first link"),
      ("http://h.example/rooted", "second"),
      ("http://h.example/dir/rel.html", "third one")))
  }

  test("rankEval: hand-computed NDCG/recall/MRR on a fixed run") {
    // query 1: relevant docs {10 (rel 2), 11 (rel 1), 12 (rel 3)};
    // run returns 11@1, 99@2, 12@3 -> hits {11, 12}, first rel rank 1
    val run = Seq(
      (1L, 11L, 1L), (1L, 99L, 2L), (1L, 12L, 3L),
      (2L, 50L, 1L), (2L, 51L, 2L)) // query 2: no relevant labels
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 10L, 2.0), (1L, 11L, 1.0), (1L, 12L, 3.0),
      (1L, 13L, 0.0)) // rel-0 label must not count as relevant
      .toDF("query_id", "doc_id", "rel")
    val got = Retrieval.rankEval(run, qrels, k = 5)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def gain(rel: Double, rank: Int) = r9(rel / r9(math.log(rank + 1.0)))
    val dcg = gain(1.0, 1) + gain(3.0, 3)
    val idcg = gain(3.0, 1) + gain(2.0, 2) + gain(1.0, 3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r6(dcg / idcg), r6(2.0 / 3.0), r6(r9(1.0)))))
    assert(got(2L) == ((0.0, 0.0, 0.0)))
  }

  test("rankEval: perfect run scores NDCG 1, recall 1, MRR 1") {
    val qrels = Seq((1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0))
      .toDF("query_id", "doc_id", "rel")
    val run = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rankEval(run, qrels, k = 5)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got == ((1L, 1.0, 1.0, 1.0)))
  }
}
