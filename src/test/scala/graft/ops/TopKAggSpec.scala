package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins [[TopK.topKPerQuery]] (native partial top-k aggregate) EQUAL to
  * the window form it replaced across every edge the window semantics
  * carry: null scores (DESC NULLS LAST), exact-score ties broken on id
  * ascending, -0.0 vs 0.0 (Spark's SQL double ordering treats them
  * equal, so the id tie-break must fire), groups smaller than k, and
  * groups missing entirely.
  */
class TopKAggSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  /** The replaced form, verbatim. */
  private def windowTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"),
        col("score"))
  }

  private def assertSame(scored: DataFrame, k: Int): Unit = {
    val expected = windowTopK(scored, k)
      .orderBy("query_id", "rank").collect().toSeq
    val got = TopK.topKPerQuery(scored, "query_id", "id", "score", k)
      .select("query_id", "id", "rank", "score")
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == expected)
  }

  test("random data with nulls and ties matches the window form") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      val q = rnd.nextInt(7).toLong
      val id = i.toLong
      // coarse scores force many exact ties; ~10% nulls
      val s: Option[Double] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toDouble / 2.0)
      (q, id, s)
    }
    val df = rows.toDF("query_id", "id", "score")
    for (k <- Seq(1, 3, 10, 50)) assertSame(df, k)
  }

  test("-0.0 and 0.0 compare equal (id tie-break decides), NaN ranks first") {
    val df = Seq(
      (1L, 10L, Some(0.0)), (1L, 9L, Some(-0.0)), (1L, 8L, Some(0.0)),
      (1L, 7L, Some(Double.NaN)), (1L, 6L, None),
      (2L, 5L, Some(-0.0)), (2L, 4L, Some(0.0))
    ).toDF("query_id", "id", "score")
    for (k <- Seq(1, 2, 3, 10)) assertSame(df, k)
  }

  test("groups smaller than k keep all rows; empty input yields empty output") {
    val df = Seq((1L, 1L, Some(1.0)), (1L, 2L, Some(2.0)))
      .toDF("query_id", "id", "score")
    assertSame(df, 5)
    val empty = df.filter(lit(false))
    assert(TopK.topKPerQuery(empty, "query_id", "id", "score", 3).count() == 0)
  }

  test("all-null scores keep id order") {
    val df = Seq((1L, 3L, None: Option[Double]), (1L, 1L, None), (1L, 2L, None))
      .toDF("query_id", "id", "score")
    assertSame(df, 2)
  }

  test("plan aggregates instead of sorting the scored relation") {
    val df = Seq((1L, 1L, 1.0)).toDF("query_id", "id", "score")
    val plan = TopK.topKPerQuery(df, "query_id", "id", "score", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(plan.contains("topk_pairs"), s"expected topk_pairs in plan:\n$plan")
  }
}
