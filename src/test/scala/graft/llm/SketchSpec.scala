package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins for the sketch-based corpus profile (`q_corpus_sketch`) and the
  * bottom-k-by-hash value sample behind it
  * ([[org.apache.spark.sql.graft.QuantileKmvSketch]]): the exact regime
  * the driver hash-checks, the fold identity that makes per-snapshot
  * summaries composable (fold(s1, s2) == sketch(union), EXACTLY — not
  * an approximation), and the saturated-regime accuracy the 100 TB
  * deployment actually runs in.
  */
class SketchSpec extends AnyFunSuite {
  import SharedSpark.spark

  private val dir = "/root/testdata/sf0.01"

  private def vSummary(rows: Array[org.apache.spark.sql.Row], k: Int): Kmv.VSummary = {
    val entries = rows.map(r => (r.getLong(0), r.getDouble(1)))
    Kmv.VSummary(k, entries.map(_._1), entries.map(_._2))
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Kmv.VSummary =
    vSummary(df.agg(org.apache.spark.sql.graft.KmvExpressions
        .quantileKmv(col("h"), col("v"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.h"), col("e.v")).collect(), k)

  test("exact regime: distinct counts and quantiles equal the exact answers") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val prof = graft.queries.QueriesLLM.q_corpus_sketch(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val exactD = docs.groupBy("source")
      .agg(count_distinct(md5(col("text"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lens = docs
      .select(col("source"), size(TextFunctions.tokens(col("text"))).cast("double").as("len"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def rank(p: Double, n: Int) = math.max(1L, math.ceil(p * n).toLong).toInt
    prof.foreach { case (src, (nDocs, distinct, p50, p90, p99)) =>
      val sorted = lens(src)
      assert(nDocs == sorted.length.toLong)
      assert(distinct == exactD(src), s"$src distinct")
      assert(p50 == sorted(rank(0.5, sorted.length) - 1), s"$src p50")
      assert(p90 == sorted(rank(0.9, sorted.length) - 1), s"$src p90")
      assert(p99 == sorted(rank(0.99, sorted.length) - 1), s"$src p99")
    }
  }

  test("summaries are partitioning-independent (mergeable partial state)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(TextFunctions.hash64(col("doc_id").cast("string")).as("h"),
        size(TextFunctions.tokens(col("text"))).cast("double").as("v"))
    // same aggregation over a 17-way hash scramble: partial buffers form
    // and merge along a different tree; the summary must not care
    val base = sketchOf(docs, 64)
    val scrambled = sketchOf(docs.repartition(17, col("h")), 64)
    assert(base.hashes.toSeq == scrambled.hashes.toSeq)
    assert(base.values.toSeq == scrambled.values.toSeq)
  }

  test("fold(s1, s2) == sketch(union), exactly — saturated included") {
    import spark.implicits._
    // k = 16 over 500 rows: deeply saturated, so the identity is doing
    // real work (bottom-k of a union == bottom-k of merged bottom-ks)
    val all = (0 until 500).map { i =>
      (i.toLong, s"row_$i")
    }.toDF("id", "s")
      .select(TextFunctions.hash64(col("s")).as("h"),
        (col("id") % 97).cast("double").as("v"))
      .cache()
    val a = all.filter(col("v") < 50)
    val b = all.filter(col("v") >= 50)
    // overlap: re-add a slice of `a` to `b`'s side to exercise the
    // collision path (same hash arriving in both summaries)
    val bPlus = b.unionByName(a.limit(40))
    val k = 16
    val folded = Kmv.vunion(sketchOf(a, k), sketchOf(bPlus, k))
    val direct = sketchOf(all.unionByName(a.limit(40)), k)
    assert(folded.hashes.toSeq == direct.hashes.toSeq)
    assert(folded.values.toSeq == direct.values.toSeq)
    all.unpersist()
  }

  test("collision rule: duplicate hash keeps the smaller value on update and merge") {
    import spark.implicits._
    val df = Seq((5L, 9.0), (5L, 3.0), (5L, 7.0), (2L, 1.0)).toDF("h", "v")
    val s = sketchOf(df, 8)
    assert(s.hashes.toSeq == Seq(2L, 5L))
    assert(s.values.toSeq == Seq(1.0, 3.0))
    val m = Kmv.vunion(Kmv.VSummary(8, Array(5L), Array(8.0)), s)
    assert(m.values.toSeq == Seq(1.0, 3.0))
  }

  test("saturated regime: sample quantiles land within the KMV rank-error band") {
    import spark.implicits._
    val n = 5000
    val k = 256
    val df = (0 until n).map(i => s"doc_$i").toDF("s")
      .select(TextFunctions.hash64(col("s")).as("h"),
        // skewed value distribution (quadratic) so rank error, not value
        // coincidence, is what the bound measures
        (TextFunctions.hash64(concat(col("s"), lit("_len"))) % 100 *
          (TextFunctions.hash64(concat(col("s"), lit("_len"))) % 100))
          .cast("double").as("v"))
    val s = sketchOf(df, k)
    assert(s.saturated)
    val sorted = df.select("v").as[Double].collect().sorted
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val est = Kmv.quantile(s, p)
      // empirical CDF position of the estimate vs p: sample-quantile
      // stderr is sqrt(p(1-p)/k) <= 0.032 at k=256; 4 sigma = 0.125
      val pos = sorted.count(_ <= est).toDouble / n
      assert(math.abs(pos - p) <= 0.125, s"p=$p est=$est cdf=$pos")
    }
  }

  test("CorpusProfile.fold == profile(union) row-identical, saturated included") {
    import spark.implicits._
    // k small enough that every summary saturates on the 500-doc corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (k, kq) = (16, 8)
    def prof(df: org.apache.spark.sql.DataFrame) =
      CorpusProfile.profile(df, "source", "doc_id", "text", k, kq)
    val folded = CorpusProfile.fold(
        prof(docs.filter(col("doc_id") % 2 === 0)),
        prof(docs.filter(col("doc_id") % 2 === 1)),
        "source", k, kq)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2),
          r.getSeq[org.apache.spark.sql.Row](3).map(x => (x.getLong(0), x.getDouble(1)))))
      .toMap
    val whole = prof(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2),
          r.getSeq[org.apache.spark.sql.Row](3).map(x => (x.getLong(0), x.getDouble(1)))))
      .toMap
    assert(folded == whole,
      "fold of half-corpus profiles must equal the whole-corpus profile")
  }

  test("Kmv.quantile rank rule on a tiny summary") {
    val s = Kmv.VSummary(8, Array(1L, 2L, 3L, 4L), Array(40.0, 10.0, 30.0, 20.0))
    assert(Kmv.quantile(s, 0.0) == 10.0)  // rank max(1, 0) = 1
    assert(Kmv.quantile(s, 0.5) == 20.0)  // ceil(2) = 2
    assert(Kmv.quantile(s, 0.51) == 30.0) // ceil(2.04) = 3
    assert(Kmv.quantile(s, 1.0) == 40.0)
  }
}
