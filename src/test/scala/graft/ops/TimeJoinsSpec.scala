package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** As-of and range joins: equal to brute-force references on random
  * fixed-seed data, inclusive/tolerance/tie edges, duplicate-free
  * bucket expansion at any bucket width, and no nested-loop join in
  * either physical plan.
  */
class TimeJoinsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val leftRows = (0 until 200).map(i =>
    (i.toLong, (i % 7).toLong, rnd.nextInt(1000).toLong))   // (id, key, t)
  private val rightRows = (0 until 150).map(i =>
    (1000L + i, (i % 7).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100)))

  test("asofJoin == brute force, incl. tolerance and no-match nulls") {
    val l = leftRows.toDF("id", "k", "t").repartition(5)
    val r = rightRows.toDF("rid", "k", "t", "v").repartition(3)
    for (tol <- Seq(None, Some(50L))) {
      val got = TimeJoins.asofJoin(l, r, Seq("k"), "t", Seq("rid", "v"),
          toleranceUs = tol)
        .select(col("id"), col("matched.rid"), col("matched.v"))
        .as[(Long, Option[Long], Option[Int])].collect()
        .map(x => x._1 -> ((x._2, x._3))).toMap
      leftRows.foreach { case (id, k, t) =>
        val cand = rightRows.filter(rr => rr._2 == k && rr._3 <= t &&
          tol.forall(tl => t - rr._3 <= tl))
        val expect =
          if (cand.isEmpty) (None, None)
          else {
            // latest t; ties by greatest (t, rid, v) struct order
            val best = cand.maxBy(c => (c._3, c._1, c._4))
            (Some(best._1), Some(best._4))
          }
        assert(got(id) == expect, s"left $id (k=$k t=$t tol=$tol)")
      }
    }
  }

  test("asofJoin: equal timestamps are inclusive; right dupes resolve deterministically") {
    val l = Seq((1L, 0L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 0L, 100L, 1), (11L, 0L, 100L, 2))
      .toDF("rid", "k", "t", "v")
    val m = TimeJoins.asofJoin(l, r, Seq("k"), "t", Seq("rid", "v"))
      .select(col("matched.rid"), col("matched.v"))
      .as[(Long, Int)].collect().head
    assert(m == ((11L, 2))) // greatest struct at the tied time, inclusively
  }

  test("rangeJoin == brute force; identical at any bucket width; no dupes") {
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("id", "p")
    val iv = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 90
      (100L + i, lo, lo + rnd.nextDouble() * 20)
    }.toDF("iid", "lo", "hi")
    val brute = pts.crossJoin(iv)
      .filter(col("lo") <= col("p") && col("p") <= col("hi"))
      .select("id", "iid").as[(Long, Long)].collect().toSeq.sorted
    for (w <- Seq(1L, 5L, 64L)) {
      val got = TimeJoins.rangeJoin(pts, iv, Seq.empty, "p", "lo", "hi", w)
        .select("id", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == brute, s"bucketWidth $w")
      assert(got.distinct.size == got.size)
    }
  }

  test("neither operator plans a nested-loop or cartesian join") {
    val l = leftRows.toDF("id", "k", "t")
    val r = rightRows.toDF("rid", "k", "t", "v")
    val asofPlan = TimeJoins.asofJoin(l, r, Seq("k"), "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("BroadcastNestedLoopJoin") &&
      !asofPlan.contains("CartesianProduct"))
    val pts = Seq((1L, 3.0)).toDF("id", "p")
    val iv = Seq((9L, 1.0, 5.0)).toDF("iid", "lo", "hi")
    val rangePlan = TimeJoins.rangeJoin(pts, iv, Seq.empty, "p", "lo", "hi", 2L)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("BroadcastNestedLoopJoin") &&
      !rangePlan.contains("CartesianProduct"))
  }
}
