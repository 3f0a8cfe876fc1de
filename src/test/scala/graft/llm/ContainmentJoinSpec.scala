package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Exact prefix-filtered CONTAINMENT join: the output must equal the
  * brute-force all-ordered-pairs answer — the asymmetric prefix bound
  * (contained-side pigeonhole vs full container index) must lose
  * nothing at any threshold.
  */
class ContainmentJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  import JaccardFixture.{corpus, shingles}

  /** Unrounded containment |a ∩ b| / |a|, empty contained side scores
    * 0 — the operator's decision boundary.
    */
  private def cont(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty) 0.0 else a.intersect(b).size.toDouble / a.size

  private def brute(docs: Seq[(Long, String)],
                    t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, s) => (id, shingles(s)) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      c = cont(sa, sb)
      if c >= t
      cr = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (ia, ib, cr)).toSet
  }

  private def run(docs: Seq[(Long, String)],
                  t: Double): Set[(Long, Long, Double)] =
    Dedup.containmentJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute force across thresholds on twin-heavy corpora") {
    for (seed <- Seq(1, 2, 3); t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val docs = corpus(seed, 60)
      assert(run(docs, t) == brute(docs, t),
        s"containment join diverged from brute force at t=$t seed=$seed")
    }
  }

  test("property: equals brute force on GENERATED corpora and thresholds") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    // lengths deliberately asymmetric (3..16) — containment's size
    // filter has no upper bound, so long-in-short and short-in-long
    // must both be exercised
    val docGen = Gen.choose(3, 16)
      .flatMap(k => Gen.listOfN(k, wordGen)).map(_.mkString(" "))
    val corpusGen = for {
      n <- Gen.choose(4, 12)
      texts <- Gen.listOfN(n, docGen)
      t <- Gen.oneOf(0.2, 0.45, 0.7, 0.95, 1.0)
    } yield (texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }, t)
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(corpusGen) { case (docs, t) =>
        run(docs, t) == brute(docs, t)
      })
    assert(res.passed, res.status.toString)
  }

  test("recovers the truncation pair symmetric Jaccard misses") {
    // doc 2 = the first third of doc 1: containment(2 in 1) = 1.0,
    // Jaccard ≈ 1/3 — the quote/truncation shape this operator exists
    // for
    val full = (0 until 30).map(i => s"w${i % 17}x$i").mkString(" ")
    val stub = full.split(" ").take(10).mkString(" ")
    val docs = Seq((1L, full), (2L, stub), (3L, "p q r s t u v"))
    val got = run(docs, 0.8)
    assert(got.map(p => (p._1, p._2)) == Set((2L, 1L)),
      s"expected exactly the stub-in-full pair, got $got")
    assert(got.head._3 == 1.0)
    // the symmetric join at the same threshold finds nothing
    assert(Dedup.jaccardJoin(docs.toDF("doc_id", "text"),
      "doc_id", "text", 0.8).count() == 0)
  }

  test("t = 1.0 emits subset pairs in the subset→superset direction only") {
    val docs = Seq(
      (1L, "a b c d e"),       // shingles ⊂ doc 3's
      (3L, "a b c d e f"),
      (4L, "x y z w v"))
    assert(run(docs, 1.0).map(p => (p._1, p._2)) == Set((1L, 3L)))
  }

  test("docs shorter than the shingle size never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "p q r s t u v"))
    assert(run(docs, 0.5).isEmpty)
  }

  private def bruteDedup(docs: Seq[(Long, String)], t: Double): Set[Long] = {
    val sets = docs.map { case (id, s) => (id, shingles(s)) }.toMap
    val drops = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia != ib && sa.nonEmpty && cont(sa, sb) >= t &&
        (sb.size > sa.size || (sb.size == sa.size && ib < ia))
    } yield ia).toSet
    docs.map(_._1).toSet -- drops
  }

  private def runDedup(docs: Seq[(Long, String)], t: Double): Set[Long] =
    Dedup.containmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("containmentDedup: stubs collapse into sources, sources survive, " +
      "equal-size twins keep the smaller id; == brute rule") {
    val full = (0 until 30).map(i => s"w${i % 17}x$i").mkString(" ")
    val stub = full.split(" ").take(10).mkString(" ")
    val twin = "q r s t u v w"
    val docs = Seq((1L, full), (2L, stub), (3L, twin), (4L, twin),
      (5L, "z0 z1 z2 z3 z4"))
    assert(runDedup(docs, 0.8) == Set(1L, 3L, 5L))
    for (seed <- Seq(1, 2); t <- Seq(0.5, 0.8)) {
      val corpusDocs = corpus(seed, 40)
      assert(runDedup(corpusDocs, t) == bruteDedup(corpusDocs, t),
        s"dedup rule diverged at t=$t seed=$seed")
    }
  }
}
