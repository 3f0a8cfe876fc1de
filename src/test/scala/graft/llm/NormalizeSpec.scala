package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Canonical text normalization and its dedup composition. */
class NormalizeSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def norm(s: String): String =
    spark.range(1).select(TextFunctions.normalizeText(lit(s))).collect()
      .head.getString(0)

  test("case, accents, width, ligatures, whitespace all canonicalize") {
    assert(norm("Café") == "cafe")
    assert(norm("CAFE") == "cafe")
    assert(norm("café") == "cafe") // pre-decomposed combining accent
    assert(norm("ＨＥＬＬＯ") == "hello") // fullwidth
    assert(norm("baﬁe") == "bafie") // fi ligature folds via NFKD
    assert(norm("  a\t\tb\n c  ") == "a b c")
    assert(norm("") == "")
    assert(norm(" \t\n ") == "")
    // German sharp s: NFKD leaves it; codepoint lowercase keeps it
    assert(norm("STRAßE") == "straße")
  }

  test("normalization is idempotent") {
    for (s <- Seq("Café au Lait", "  ÅNGSTRÖM  ", "ﬁﬂ", "ascii text")) {
      assert(norm(norm(s)) == norm(s), s)
    }
  }

  test("exact dedup over normalized text groups the variants") {
    val docs = Seq(
      (1L, "Café au lait"),
      (2L, "cafe au  lait"), // accent + whitespace variant
      (3L, "CAFE AU LAIT"),
      (4L, "something else")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(
        docs.withColumn("text", TextFunctions.normalizeText(col("text"))),
        "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), "lowest id per canonical form survives")
  }
}
