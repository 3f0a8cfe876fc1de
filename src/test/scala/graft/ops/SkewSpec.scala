package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Salted join/aggregate must be row-equivalent to their unsalted forms —
  * salting only changes the physical spread, never the result.
  */
class SkewSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  // one very hot key (k=1) plus a tail — the salting target shape
  private def big = (1 to 500).map(i => (if (i <= 400) 1L else i.toLong, i.toDouble))
    .toDF("k", "v")
  private def dim = Seq((1L, "hot"), (450L, "cold"), (999L, "absent"))
    .toDF("k", "name")

  test("saltedJoin == plain join for inner and left_outer") {
    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(dim, Seq("k"), jt)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = Skew.saltedJoin(big, dim, Seq("k"), salt = 8, joinType = jt)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == plain, s"mismatch for $jt")
    }
  }

  test("saltedJoin left_semi keeps exactly the matching big rows") {
    val plain = big.join(dim, Seq("k"), "left_semi").count()
    val salted = Skew.saltedJoin(big, dim, Seq("k"), 8, "left_semi").count()
    assert(salted == plain)
  }

  test("saltedAggregate == plain groupBy for sum/count/max/min") {
    val plain = big.groupBy("k")
      .agg(sum("v").as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(
        big.withColumn("n", lit(1L)), Seq("k"),
        Seq("v" -> "sum", "n" -> "count"), salt = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
    // explicit discriminator (for byte-identical hot-key rows): same result
    val byId = Skew.saltedAggregate(
        big.withColumn("n", lit(1L)).withColumn("rid",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy("v"))),
        Seq("k"), Seq("v" -> "sum", "n" -> "count"), salt = 8,
        saltBy = Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(byId == plain)
  }
}
