package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ClusterSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("clusterPairs finds connected components with min-id labels") {
    // chain 1-2-3, pair 10-11, chain 20-21-22-23 (transitive through 21-22)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("clusterPairs converges on a long chain (diameter >> rounds)") {
    // a 150-node path: plain min-propagation needs ~150 rounds; pointer
    // doubling must converge well inside the 40-round safety valve
    val n = 150
    val pairs = (0 until n - 1).map(i => (1000L + i, 1001L + i))
      .toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs).collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 1000L), "all labels = chain minimum")
  }

  test("nearDedupKeep keeps canonical members and untouched docs") {
    val corpus = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.nearDedupKeep(corpus, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("nearDedup end-to-end: candidates -> verify -> cluster -> keep") {
    val base = "the quick brown fox jumps over the lazy dog near the old barn"
    val corpus = Seq(
      1L -> base,
      2L -> base,                                  // exact dup of 1
      3L -> (base + " today"),                     // near dup (high jaccard)
      4L -> "solar panels convert sunlight into household electricity daily",
      5L -> "meter readings arrive every five minutes from every house")
      .toDF("doc_id", "text")
    for (fast <- Seq(false, true)) {
      val kept = Dedup.nearDedup(corpus, "doc_id", "text",
          jaccardThreshold = 0.5, fast = fast)
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 4L, 5L), s"fast=$fast: canonical + unrelated kept")
    }
    // a strict threshold keeps the near-dup but still drops the exact dup
    val strict = Dedup.nearDedup(corpus, "doc_id", "text",
        jaccardThreshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L, 3L, 4L, 5L))
  }
}
