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

  test("rankEval: ONE metric chain serves all three scorer families — " +
      "metrics depend only on (query, doc, rank) triples (VERDICT r17 #7)") {
    // a tiny shared corpus where each scorer family produces a run in
    // the same (query_id, doc_id, rank) contract: BM25 and tf-idf over
    // the texts, the coded IVF-PQ ANN over matching embeddings
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "beta beta delta"),
      (2L, "gamma delta alpha"), (3L, "alpha alpha beta"),
      (4L, "delta gamma beta")).toDF("doc_id", "text")
    val dim = 64
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() - 0.5f)
    }
    val emb = (0L to 4L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val qrels = Seq((0L, 1L, 2.0), (0L, 2L, 1.0), (1L, 3L, 3.0))
      .toDF("query_id", "doc_id", "rel")
    val queries = docs.filter($"doc_id" < 2)
    val bm25 = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "doc_id", "text", k = 3)
    val tfidf = Retrieval.tfidfCosineTopK(docs, "doc_id", "text",
      queries, "doc_id", "text", k = 3)
    val base = (0 until 2).map(i => vec(100 + i)).toArray
    val cb = Array.tabulate(2, 2)((j, i) =>
      vec(200 + 10 * j + i).slice(0, dim / 2))
    val qvecs = (0L to 1L).map(i => i -> vec(i))
    val dense = graft.llm.Similarity.ivfPqTopKCoded(
      graft.llm.Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
        base, cb),
      "id", "codes", "cell", _ => Seq(1L, 2L), cb, qvecs, k = 3)
    val runs = Seq(
      bm25.select($"query_id", $"doc_id", $"rank"),
      tfidf.select($"query_id", $"doc_id", $"rank"),
      dense.select($"query_id", $"neighbor_id".as("doc_id"), $"rank"))
    runs.foreach { run =>
      val a = Retrieval.rankEval(run, qrels, k = 3)
        .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
      // the chain sees only the rank triples: re-partitioned, column-
      // reordered, or row-shuffled copies of the run score identically
      val b = Retrieval.rankEval(
          run.select($"rank", $"doc_id", $"query_id").repartition(7),
          qrels.repartition(3), k = 3)
        .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
      assert(a == b, "metrics must be a pure function of the run triples")
      assert(a.map(_._1) == Seq(0L, 1L))
      a.foreach { case (_, ndcg, recall, mrr) =>
        assert(ndcg >= 0.0 && ndcg <= 1.0 && recall >= 0.0 &&
          recall <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
      }
    }
    // two scorers that emit the SAME ranking must score the SAME
    // metrics — the chain cannot favor a scorer family
    val sameAsBm25 = bm25.select($"query_id", $"doc_id", $"rank")
    val viaDenseContract = bm25
      .select($"query_id", $"doc_id".as("neighbor_id"), $"rank")
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rank")
    assert(
      Retrieval.rankEval(sameAsBm25, qrels, 3)
        .as[(Long, Double, Double, Double)].collect().toSet ==
      Retrieval.rankEval(viaDenseContract, qrels, 3)
        .as[(Long, Double, Double, Double)].collect().toSet)
  }
}
