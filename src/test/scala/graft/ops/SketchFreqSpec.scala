package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.llm.Dedup

/** Pins the Misra-Gries frequent-items aggregate and the Bloom-screened
  * decontamination — the two newest O(1)-state / map-side-screen scale
  * paths — against their exact counterparts.
  */
class SketchFreqSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def freqItems(capacity: Int)(df: org.apache.spark.sql.DataFrame) =
    df.agg(org.apache.spark.sql.graft.FreqItemsExpressions
        .freqItemsSketch(col("item"), capacity).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"), col("e.ub").as("ub"))

  private val rnd = new scala.util.Random(7)
  // Zipf-ish: item i drawn with weight ~ 1/(i+1)
  private val items = (1 to 5000).map { _ =>
    val r = rnd.nextDouble()
    val i = math.min((1.0 / (r + 0.02)).toInt, 80)
    s"w$i"
  }

  test("exact when capacity >= distinct keys (maxError 0), across partitions") {
    val df = items.toDF("item").repartition(7)
    val got = freqItems(capacity = 1000)(df)
      .orderBy(desc("est"), asc("item")).collect()
    val expected = df.groupBy("item").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("item")).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1))
      assert(g.getLong(2) == e.getLong(1)) // ub == est: no decrements fired
    }
  }

  test("capacity-constrained: MG bounds hold and heavy items are present") {
    val capacity = 10
    val df = items.toDF("item").repartition(5)
    val truth = df.groupBy("item").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = items.size.toLong
    val got = freqItems(capacity)(df).collect()
    assert(got.nonEmpty && got.length <= capacity)
    val summaryErr = got.map(r => r.getLong(2) - r.getLong(1)).max
    assert(summaryErr <= n / (capacity + 1),
      s"decrement total $summaryErr exceeds N/(k+1) = ${n / (capacity + 1)}")
    got.foreach { r =>
      val t = truth(r.getString(0))
      assert(r.getLong(1) <= t && t <= r.getLong(2),
        s"${r.getString(0)}: true $t outside [${r.getLong(1)}, ${r.getLong(2)}]")
    }
    // presence guarantee: anything with true count > N/(k+1) must survive
    val kept = got.map(_.getString(0)).toSet
    truth.filter(_._2 > n / (capacity + 1)).keys.foreach { heavy =>
      assert(kept.contains(heavy), s"heavy item $heavy missing from summary")
    }
  }

  test("bloom-screened contamination == exact contamination (incl. maxDf)") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(seed: Int, len: Int) = {
      val r = new scala.util.Random(seed)
      (0 until len).map(_ => words(r.nextInt(words.size))).mkString(" ")
    }
    val corpus = (0 until 120).map(i => (i.toLong, doc(i, 8 + i % 20))).toDF("id", "text")
    val bench = (0 until 6).map(i => (i.toLong, doc(i * 3, 12))).toDF("id", "text")
    for (maxDf <- Seq(None, Some(40L)); fpp <- Seq(0.5, 0.01)) {
      val exact = Dedup.contaminationScores(corpus, "id", "text", bench, "id", "text",
          threshold = 0.05, maxDf = maxDf)
        .orderBy("corpus_id", "bench_id").collect().toSeq
      val bloom = Dedup.contaminationScoresBloom(corpus, "id", "text", bench, "id", "text",
          threshold = 0.05, maxDf = maxDf, fpp = fpp)
        .orderBy("corpus_id", "bench_id").collect().toSeq
      assert(bloom == exact, s"maxDf=$maxDf fpp=$fpp")
      assert(exact.nonEmpty) // the fixture must actually exercise overlap
    }
  }

  test("bloom screen sits in the corpus scan stage (before any exchange)") {
    val corpus = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("id", "text")
    val bench = Seq((9L, "a b c d")).toDF("id", "text")
    val plan = Dedup.contaminationScoresBloom(corpus, "id", "text", bench, "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"), s"screen missing:\n$plan")
  }
}
