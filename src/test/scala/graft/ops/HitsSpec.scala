package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** HITS: bit-identical to a BigDecimal-summed brute-force reference on
  * random digraphs with source/sink nodes, L1-mass-conserving, salt-
  * invariant, and rank-order-equal to the classical L2-normalized
  * iteration (normalization only rescales the fixpoint direction).
  */
class HitsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def dec(x: Double): BigDecimal =
    BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)

  /** Brute-force L1 HITS replaying [[Hits.hits]]' expression trees. */
  private def brute(edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, (Double, Double)] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    var hub = nodes.map(_ -> 1.0 / n).toMap
    var auth = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val hr = es.groupBy(_._1).view
        .mapValues(_.map { case (_, t) => dec(auth(t)) }.sum.toDouble).toMap
      val hm = hr.values.map(dec).sum.toDouble
      hub = nodes.map(v => v -> hr.getOrElse(v, 0.0) / hm).toMap
      val ar = es.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => dec(hub(s)) }.sum.toDouble).toMap
      val am = ar.values.map(dec).sum.toDouble
      auth = nodes.map(v => v -> ar.getOrElse(v, 0.0) / am).toMap
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  /** Classical L2-normalized HITS — the rank-order reference. */
  private def bruteL2(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Double, Double)] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 1.0).toMap
    for (_ <- 0 until iters) {
      val hr = nodes.map(v =>
        v -> es.filter(_._1 == v).map { case (_, t) => auth(t) }.sum).toMap
      val hn = math.sqrt(hr.values.map(x => x * x).sum)
      hub = hr.view.mapValues(_ / hn).toMap
      val ar = nodes.map(v =>
        v -> es.filter(_._2 == v).map { case (s, _) => hub(s) }.sum).toMap
      val an = math.sqrt(ar.values.map(x => x * x).sum)
      auth = ar.view.mapValues(_ / an).toMap
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  private val rnd = new scala.util.Random(41)
  // ~60 nodes; ids >= 40 never appear as src (pure authorities),
  // so both no-out-edge and no-in-edge arms are exercised
  private val edges = (0 until 300).map(_ =>
    (rnd.nextInt(40).toLong, rnd.nextInt(60).toLong)).distinct

  test("== BigDecimal brute force bit-for-bit; L1 mass conserved") {
    for (iters <- Seq(0, 1, 4)) {
      val got = Hits.hits(edges.toDF("src", "dst"), iters,
          checkpointEvery = 2)
        .as[(Long, Double, Double)].collect()
        .map { case (id, h, a) => id -> (h, a) }.toMap
      val expect = brute(edges, iters)
      assert(got.keySet == expect.keySet)
      got.foreach { case (id, (h, a)) =>
        assert(h == expect(id)._1, s"hub iters=$iters node $id")
        assert(a == expect(id)._2, s"auth iters=$iters node $id")
      }
      assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9,
        s"hub mass at iters=$iters")
      assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9,
        s"auth mass at iters=$iters")
    }
  }

  test("L1 normalization preserves the classical L2 ranking") {
    val got = Hits.hits(edges.toDF("src", "dst"), 4, checkpointEvery = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
    val l2 = bruteL2(edges, 4)
    def order(m: Map[Long, (Double, Double)],
              f: ((Double, Double)) => Double): Seq[Long] =
      m.toSeq.sortBy { case (id, v) => (-f(v), id) }.map(_._1)
    assert(order(got, _._1) == order(l2, _._1), "hub order")
    assert(order(got, _._2) == order(l2, _._2), "auth order")
  }

  test("salted join is bit-identical (decimal sums are order-free)") {
    val df = edges.toDF("src", "dst")
    val plain = Hits.hits(df, 3).as[(Long, Double, Double)].collect().toSet
    val salted = Hits.hits(df, 3, saltJoin = 4)
      .as[(Long, Double, Double)].collect().toSet
    assert(plain == salted)
  }

  test("no-out-edge nodes score hub 0; no-in-edge nodes score auth 0") {
    // 1 -> 2 -> 3: node 3 is a pure sink (hub 0), node 1 a pure source
    // (auth 0)
    val got = Hits.hits(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
    assert(got(3L)._1 == 0.0)
    assert(got(1L)._2 == 0.0)
    assert(got(1L)._1 > 0.0 && got(3L)._2 > 0.0)
  }

  test("warm start: warm-from-uniform tracks cold to fp ulps; new nodes enter at 1/N") {
    val df = edges.toDF("src", "dst")
    val cold = Hits.hits(df, 3).as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
    // seeding with the uniform start differs from cold ONLY by the
    // renormalization /m, where m sums n copies of fl(1/n) — ulps
    // (the PageRank warm-from-uniform contract)
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.size.toDouble
    val uniform = (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(v => (v, 1.0 / n, 1.0 / n)).toDF("id", "hub", "auth")
    val warm = Hits.hitsFrom(df, uniform, 3)
      .as[(Long, Double, Double)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
    assert(warm.keySet == cold.keySet)
    warm.foreach { case (id, (h, a)) =>
      assert(math.abs(h - cold(id)._1) < 1e-15, s"hub $id")
      assert(math.abs(a - cold(id)._2) < 1e-15, s"auth $id")
    }
    // resuming from converged scores on a GROWN graph: every node
    // still scored, masses renormalized to 1
    val grown = (edges ++ Seq((100L, 101L), (101L, 100L))).toDF("src", "dst")
    val prev = Hits.hits(df, 4)
    val resumed = Hits.hitsFrom(grown, prev, 2)
      .as[(Long, Double, Double)].collect()
    assert(resumed.map(_._1).toSet ==
      (edges.flatMap(e => Seq(e._1, e._2)) ++ Seq(100L, 101L)).toSet)
    assert(math.abs(resumed.map(_._2).sum - 1.0) < 1e-9)
    assert(math.abs(resumed.map(_._3).sum - 1.0) < 1e-9)
  }

  test("multi-edges collapse") {
    val once = Hits.hits(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), 2)
      .as[(Long, Double, Double)].collect().toSet
    val dup = Hits.hits(
        Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)).toDF("src", "dst"), 2)
      .as[(Long, Double, Double)].collect().toSet
    assert(once == dup)
  }

  test("degenerate initScores (zero/negative carried mass) fails loud, " +
      "never NaN (ADVICE r17)") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // all-zero carried vectors: L1 mass 0, the renormalizing division
    // would mint NaNs that ride silently through every iteration
    val zeros = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.0), (3L, 0.0, 0.0))
      .toDF("id", "hub", "auth")
    val ex = intercept[IllegalArgumentException] {
      Hits.hitsFrom(df, zeros, 2)
    }
    assert(ex.getMessage.contains("mass"))
    // net-negative mass on one vector is just as degenerate
    val neg = Seq((1L, 0.5, -1.0), (2L, 0.5, 0.2), (3L, 0.0, 0.2))
      .toDF("id", "hub", "auth")
    val ex2 = intercept[IllegalArgumentException] {
      Hits.hitsFrom(df, neg, 2)
    }
    assert(ex2.getMessage.contains("mass"))
  }

  test("hitsUntil: stop round deterministic under partitioning and salt; " +
      "result == fixed-iteration run at the stop round (VERDICT r17 #5)") {
    val df = edges.toDF("src", "dst")
    val (r1, n1) = Hits.hitsUntil(df.repartition(3), 1e-4,
      maxIterations = 60)
    val (r2, n2) = Hits.hitsUntil(df.repartition(11), 1e-4,
      maxIterations = 60, saltJoin = 4)
    assert(n1 == n2, "stop round must not depend on partitioning or salt")
    assert(n1 > 1 && n1 < 60, s"fixture must converge mid-range, got $n1")
    val m1 = r1.as[(Long, Double, Double)].collect().toSet
    val m2 = r2.as[(Long, Double, Double)].collect().toSet
    assert(m1 == m2, "converged scores must be bit-identical")
    val fixed = Hits.hits(df, n1).as[(Long, Double, Double)].collect().toSet
    assert(m1 == fixed, "epsilon path must be bit-identical to the fixed path")
    val (_, n0) = Hits.hitsUntil(df, 1e9, maxIterations = 60)
    assert(n0 == 1)
    val (_, nCap) = Hits.hitsUntil(df, 0.0, maxIterations = 2)
    assert(nCap == 2)
  }
}
