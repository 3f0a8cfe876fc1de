package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Edit-distance join: complete and exact against a brute-force
  * quadratic reference on random small-alphabet strings (where near
  * pairs are dense), including the ≤ q·k short-string fallback bucket
  * and maxDist 2.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val rnd = new scala.util.Random(31)
  // includes the empty string: length 0 rides the short-string bucket
  // and must pair with every 1-char value at distance 1
  private val strings = ((0 until 300).map(_ =>
    (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
      .mkString) :+ "a" :+ "b" :+ "ab" :+ "").distinct

  test("null strings never pair; empty string pairs via the short bucket") {
    val df = Seq(Some("a"), Some(""), None, Some("b")).toDF("s")
    val got = FuzzyJoin.editDistancePairs(df, "s", 1)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("", "a", 1L), ("", "b", 1L), ("a", "b", 1L)))
  }

  test("== brute-force quadratic at maxDist 1 and 2 (incl. short strings)") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistancePairs(strings.toDF("s"), "s", k)
        .as[(String, String, Long)].collect().toSet
      val expect = (for {
        a <- strings; b <- strings if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == expect,
        s"maxDist=$k: missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
      assert(expect.nonEmpty) // the fixture actually exercises the join
    }
  }

  test("count filter: verify set is complete and strictly prunes") {
    val df = strings.toDF("s")
    val truePairs = (for {
      a <- strings; b <- strings if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b)).size
    // single-gram candidate set (what the pre-count-filter form verified):
    // pairs sharing ANY padded bigram within the length band, plus the
    // short×short bucket
    def grams(s: String): Set[String] =
      ("" + s + "").sliding(2).toSet
    val singleGram = (for {
      a <- strings; b <- strings
      if a < b && math.abs(a.length - b.length) <= 1 &&
        (grams(a).intersect(grams(b)).nonEmpty ||
          (a.length <= 2 && b.length <= 2))
    } yield (a, b)).size
    val counted = FuzzyJoin.countFilterCandidates(df, "s", 1)
    assert(counted >= truePairs, "count filter must keep every true pair")
    assert(counted < singleGram,
      s"count filter should prune the single-gram set ($counted vs $singleGram)")
  }

  test("finds injected typos in a realistic vocabulary") {
    val vocab = Seq("energy", "enrgy", "transform", "tranform", "meter",
      "meters", "widely", "unrelated")
    val got = FuzzyJoin.editDistancePairs(vocab.toDF("s"), "s", 1)
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("energy", "enrgy", 1L)))
    assert(got.contains(("tranform", "transform", 1L)))
    assert(got.contains(("meter", "meters", 1L)))
    assert(!got.exists(p => p._1 == "unrelated" || p._2 == "unrelated"))
  }
}
