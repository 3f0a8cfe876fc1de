package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Exact prefix-filtered similarity join: the output must equal the
  * brute-force all-pairs answer — the operator's entire claim is that
  * prefix pruning loses NOTHING at any threshold.
  */
class JaccardJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  import JaccardFixture.{corpus, shingles, jac}

  private def brute(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, s) => (id, shingles(s)) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = jac(sa, sb)
      if j >= t
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (ia, ib, jr)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] =
    Dedup.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute force across thresholds on twin-heavy corpora") {
    for (seed <- Seq(1, 2, 3); t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val docs = corpus(seed, 60)
      assert(run(docs, t) == brute(docs, t),
        s"prefix join diverged from brute force at t=$t seed=$seed")
    }
  }

  test("property: equals brute force on GENERATED corpora and thresholds") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.choose(3, 10)
      .flatMap(k => Gen.listOfN(k, wordGen)).map(_.mkString(" "))
    val corpusGen = for {
      n <- Gen.choose(4, 12)
      texts <- Gen.listOfN(n, docGen)
      t <- Gen.oneOf(0.2, 0.45, 0.7, 0.95, 1.0)
    } yield (texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }, t)
    // tiny vocabulary + short docs maximize shared shingles, tie-heavy
    // sizes, and boundary Jaccard values — the regimes where an fp slip
    // in the ceil guards or the positional bound would surface
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(corpusGen) { case (docs, t) =>
        run(docs, t) == brute(docs, t)
      })
    assert(res.passed, res.status.toString)
  }

  test("t = 1.0 finds exactly the identical-shingle-set pairs") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),     // identical
      (3L, "a b c d e f"), (4L, "x y z w v")    // superset / disjoint
    )
    assert(run(docs, 1.0) == Set((1L, 2L, 1.0)))
  }

  test("docs shorter than the shingle size never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "p q r s t u v"))
    assert(run(docs, 0.5).isEmpty)
  }
}
