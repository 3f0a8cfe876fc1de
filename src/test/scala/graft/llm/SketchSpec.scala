package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Accuracy pins for the sketch-based corpus profile
  * (`q_corpus_sketch`): sketches are engine-specific so no DuckDB
  * oracle exists — instead the approximations are bounded against the
  * EXACT answers on the driver testdata, and the merge property that
  * makes them 100 TB-viable (partial sketches combine associatively
  * across any partitioning) is pinned directly.
  */
class SketchSpec extends AnyFunSuite {
  import SharedSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("HLL distinct counts within 5% of exact, per source") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val approx = graft.queries.QueriesLLM.q_corpus_sketch(spark, dir)
      .select("source", "approx_distinct_texts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source")
      .agg(count_distinct(md5(col("text"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, e) =>
      val a = approx(src)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$src: approx $a vs exact $e")
    }
  }

  test("approx percentiles bracket the exact token-length quantiles") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        size(TextFunctions.tokens(col("text"))).cast("double").as("len"))
    val approx = graft.queries.QueriesLLM.q_corpus_sketch(spark, dir)
      .select("source", "token_pctiles")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // with accuracy 1000 on 25-doc groups the sketch is exact: compare
    // against percentile_approx's own contract via the exact sorted rank
    docs.collect().groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.map(_.getDouble(1)).sorted
      def exactAt(q: Double) = sorted(math.min(sorted.length - 1,
        math.ceil(q * sorted.length).toInt - 1).max(0))
      val Seq(p50, p90, p99) = approx(src).toList
      assert(p50 >= sorted.head && p50 <= sorted.last)
      assert(math.abs(p50 - exactAt(0.5)) <= 2.0, s"$src p50 $p50")
      assert(p90 >= p50 && p99 >= p90, s"$src quantiles must be monotone")
      assert(math.abs(p90 - exactAt(0.9)) <= 4.0, s"$src p90 $p90")
    }
  }

  test("sketches merge: repartitioned input yields the same profile") {
    val base = graft.queries.QueriesLLM.q_corpus_sketch(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Double](3))).toMap
    val shuffled = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(17, col("doc_id"))
    val again = shuffled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(md5(col("text"))).as("d"),
        percentile_approx(
          size(TextFunctions.tokens(col("text"))).cast("double"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(1000)).as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Double](3))).toMap
    assert(base == again,
      "sketch results must be partitioning-independent (mergeable state)")
  }
}
