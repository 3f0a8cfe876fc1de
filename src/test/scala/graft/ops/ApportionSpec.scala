package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Largest-remainder apportionment: quotas sum to exactly the budget,
  * no key is off its real share by more than one, ties resolve by key,
  * and the whole computation equals an integer-arithmetic reference.
  */
class ApportionSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def brute(ws: Seq[(String, Long)], b: Long): Map[String, Long] = {
    val pos = ws.filter(_._2 > 0)
    val W = pos.map(_._2).sum
    if (W == 0) return pos.map(p => p._1 -> 0L).toMap
    val base = pos.map { case (k, w) =>
      (k, w, w * b / W, w * b % W)
    }
    val r = (b - base.map(_._3).sum).toInt
    val bumped = base.sortBy { case (k, _, _, rem) => (-rem, k) }
      .take(r).map(_._1).toSet
    base.map { case (k, _, q, _) =>
      k -> (q + (if (bumped(k)) 1L else 0L))
    }.toMap
  }

  private def run(ws: Seq[(String, Long)], b: Long): Map[String, Long] =
    Apportion.largestRemainder(ws.toDF("k", "w"), "k", "w", b)
      .select("key", "quota").as[(String, Long)].collect().toMap

  test("== integer brute force on seeded random weights; sums exact; " +
      "deviation <= 1") {
    val rnd = new scala.util.Random(29)
    for (seed <- 1 to 5) {
      val ws = (0 until 40).map(i => (f"k$i%02d", rnd.nextInt(1000).toLong))
      val b = 1 + rnd.nextInt(5000)
      val got = run(ws, b)
      assert(got == brute(ws, b), s"seed=$seed b=$b")
      assert(got.values.sum == b, s"quotas must sum to the budget (b=$b)")
      val W = ws.filter(_._2 > 0).map(_._2).sum.toDouble
      ws.filter(_._2 > 0).foreach { case (k, w) =>
        val share = b * w / W
        assert(math.abs(got(k) - share) < 1.0 + 1e-9,
          s"key $k quota ${got(k)} vs share $share")
      }
    }
  }

  test("ties bump the lexicographically smallest keys") {
    // four equal weights, budget 6: everyone gets 1, remainder 2 goes
    // to a and b
    val got = run(Seq(("d", 5L), ("b", 5L), ("c", 5L), ("a", 5L)), 6L)
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("non-positive weights drop and do not dilute the shares") {
    val got = run(Seq(("a", 3L), ("z", 0L), ("n", -7L), ("b", 1L)), 4L)
    assert(got == Map("a" -> 3L, "b" -> 1L))
  }

  test("null keys drop; quotas still sum to the budget (review finding r17)") {
    val got = run(Seq(("a", 3L), (null.asInstanceOf[String], 5L),
      ("b", 1L)), 4L)
    assert(got == Map("a" -> 3L, "b" -> 1L))
    assert(got.values.sum == 4L)
  }

  test("Σweight overflow fails loud even when the long sum wraps past zero") {
    // four keys at 2^62 wrap a long sum to exactly 0; the decimal path
    // must reject instead of silently assigning nothing
    val huge = (0 until 4).map(i => (s"k$i", Long.MaxValue / 2 + 1))
    val ex = intercept[IllegalArgumentException] { run(huge, 10L) }
    assert(ex.getMessage.contains("overflows Long"))
  }

  test("degenerate arms: zero budget, all-zero weights") {
    assert(run(Seq(("a", 3L), ("b", 1L)), 0L).values.forall(_ == 0L))
    assert(run(Seq(("a", 0L)), 10L).isEmpty)
  }

  test("duplicate keys fail loud instead of silently breaking " +
      "sum-to-budget (ADVICE r17)") {
    // a duplicated key fans out the bump equi-rejoin; the guard rides
    // the existing one-row aggregate and rejects before any arithmetic
    val ex = intercept[IllegalArgumentException] {
      run(Seq(("a", 3L), ("a", 2L), ("b", 1L)), 10L)
    }
    assert(ex.getMessage.contains("duplicate keys"))
    // duplicates among DROPPED rows (non-positive weight, null key)
    // never reach the guard — they are out of the quota population
    assert(run(Seq(("a", 3L), ("b", 0L), ("b", -1L)), 3L) == Map("a" -> 3L))
    assert(run(Seq(("a", 3L), (null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 2L)), 3L) == Map("a" -> 3L))
  }
}
