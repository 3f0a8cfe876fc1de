package graft.etd

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Property-based invariants (SURVEY §5): min_count gate equivalence with
  * the pandas semantics, the methods->bitmask fold, and spine coverage.
  * Plain ScalaCheck (no scalatestplus bridge in the offline cache).
  */
class PropertiesSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val valuesGen: Gen[List[Option[Double]]] =
    Gen.listOfN(12, Gen.option(Gen.choose(-100.0, 100.0)))

  test("property: sumMinCount matches pandas sum(min_count=k)") {
    check(Prop.forAll(valuesGen, Gen.choose(0, 12)) { (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      val got = df.agg(Aggregates.sumMinCount(col("v"), lit(k))).collect().head
      val present = vs.flatten
      if (present.size >= k && present.nonEmpty)
        math.abs(got.getDouble(0) - present.sum) < 1e-9
      else got.isNullAt(0)
    })
  }

  test("property: avgMinCount = gated sum/count") {
    check(Prop.forAll(valuesGen, Gen.choose(1, 12)) { (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      val got = df.agg(Aggregates.avgMinCount(col("v"), lit(k))).collect().head
      val present = vs.flatten
      if (present.size < k) got.isNullAt(0)
      else math.abs(got.getDouble(0) - present.sum / present.size) < 1e-9
    })
  }

  test("property: methods->bitmask equals the reference's 1<<(m-1) fold") {
    // reference: vectorized_impute.py:44-53 — ImputeType values ARE the bit
    // flags, so bit_or over per-row values equals the fold over ordinals
    check(Prop.forAll(Gen.nonEmptyContainerOf[Set, Int](Gen.choose(1, 8))) { ms =>
      val flags = ms.toSeq.map(m => 1 << (m - 1))
      val expected = flags.foldLeft(0L)(_ | _)
      val df = flags.map(f => Tuple1(f)).toDF("f")
      val got = df.agg(coalesce(bit_or(col("f")), lit(0)).cast("long"))
        .collect().head.getLong(0)
      got == expected
    }, n = 8)
  }

  test("property: resample spine spans min..max bucket inclusive") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 96L))) { steps =>
      val df = steps.distinct.map(s => (1L, 1L, s)).toDF(
        Model.ProjectId, Model.HouseId, "s")
        .withColumn(Model.ReadingDate, timestamp_seconds(col("s") * 900))
      val spine = Resample.bucketSpine(df,
        Seq(Model.ProjectId, Model.HouseId), "15min")
      spine.count() == steps.max - steps.min + 1
    }, n = 8)
  }
}
