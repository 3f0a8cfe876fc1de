package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** PageRank: bit-identical to a BigDecimal-summed brute-force reference
  * on random digraphs with dangling nodes, mass-conserving, invariant
  * under partitioning, and multi-edge-collapsing.
  */
class PageRankSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def dec(x: Double): BigDecimal =
    BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)

  private def brute(edges: Seq[(Long, Long)], iters: Int,
                    d: Double): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val sums = es.map { case (s, t) => t -> dec(rank(s) / out(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      val m = nodes.filter(v => !out.contains(v))
        .map(v => dec(rank(v))).sum.toDouble
      rank = nodes.map(v => v ->
        ((1.0 - d) / n + d * (sums.getOrElse(v, 0.0) + m / n))).toMap
    }
    rank
  }

  private val rnd = new scala.util.Random(23)
  // ~60 nodes, some of which never appear as src (dangling)
  private val edges = (0 until 300).map(_ =>
    (rnd.nextInt(40).toLong, rnd.nextInt(60).toLong)).distinct

  test("== BigDecimal brute force bit-for-bit; mass conserved") {
    for (iters <- Seq(0, 1, 4)) {
      val got = PageRank.pageRank(edges.toDF("src", "dst"), iters,
          checkpointEvery = 2)
        .as[(Long, Double)].collect().toMap
      val expect = brute(edges, iters, 0.85)
      assert(got.keySet == expect.keySet)
      got.foreach { case (id, r) =>
        assert(r == expect(id), s"iters=$iters node $id")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass at iters=$iters")
    }
  }

  test("invariant under partitioning; multi-edges collapse") {
    val dupEdges = edges ++ edges.take(50) // repeat some edges
    val a = PageRank.pageRank(dupEdges.toDF("src", "dst").repartition(1), 3)
      .as[(Long, Double)].collect().toMap
    val b = PageRank.pageRank(dupEdges.toDF("src", "dst").repartition(7), 3)
      .as[(Long, Double)].collect().toMap
    val plain = PageRank.pageRank(edges.toDF("src", "dst"), 3)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(a == plain) // duplicates changed nothing
  }
}
