package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** KMV distinct-set summaries: exact in the unsaturated regime,
  * bounded-error set estimation when saturated, merge-stable across
  * partitionings.
  */
class KmvSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def sketchOf(values: Seq[Long], k: Int, parts: Int = 5): Kmv.Summary = {
    val arr = values.toDF("v").repartition(parts)
      .agg(org.apache.spark.sql.graft.KmvExpressions.kmvSketch(col("v"), k))
      .collect().head.getSeq[Long](0).toArray
    Kmv.Summary(k, arr)
  }

  // deterministic pseudo-uniform hashes on [0, 2^60): md5-based, the
  // engine's real hash domain
  private def h(i: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
    val hex = md.take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("unsaturated: summary IS the distinct set; estimators exact") {
    val va = (0L until 500L).map(h)
    val vb = (300L until 800L).map(h)
    val sa = sketchOf(va ++ va, k = 1024) // duplicates collapse
    val sb = sketchOf(vb, k = 1024)
    assert(sa.hashes.length == 500 && !sa.saturated)
    assert(Kmv.distinct(sa) == 500.0)
    assert(Kmv.intersection(sa, sb) == 200.0)
    assert(math.abs(Kmv.jaccard(sa, sb) - 200.0 / 800.0) < 1e-12)
    assert(sa.hashes.sorted.sameElements(sa.hashes), "summary sorted ascending")
  }

  test("saturated: distinct/intersection/jaccard within KMV error bounds") {
    val n = 20000
    val overlap = 8000
    val va = (0L until n.toLong).map(h)
    val vb = ((n - overlap).toLong until (2L * n - overlap)).map(h)
    val k = 512
    val sa = sketchOf(va, k)
    val sb = sketchOf(vb, k)
    assert(sa.saturated && sb.saturated)
    // relative error ~ 1/sqrt(k-2) ~ 4.4%; allow 4 sigma
    val dTol = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(Kmv.distinct(sa) - n) / n < dTol,
      s"distinct ${Kmv.distinct(sa)} vs $n")
    val trueJ = overlap.toDouble / (2 * n - overlap)
    assert(math.abs(Kmv.jaccard(sa, sb) - trueJ) < 0.06,
      s"jaccard ${Kmv.jaccard(sa, sb)} vs $trueJ")
    assert(math.abs(Kmv.intersection(sa, sb) - overlap) / overlap < 0.2,
      s"intersection ${Kmv.intersection(sa, sb)} vs $overlap")
  }

  test("merge across partitionings is value-identical") {
    val vs = (0L until 3000L).map(h)
    val a = sketchOf(vs, k = 256, parts = 2)
    val b = sketchOf(vs, k = 256, parts = 17)
    assert(a.hashes.toSeq == b.hashes.toSeq)
  }

  test("negative hashes are rejected (domain contract)") {
    val ex = intercept[Exception] {
      sketchOf(Seq(-1L), k = 8)
    }
    assert(ex.getMessage.contains("non-negative") ||
      ex.getCause != null)
  }
}
