package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins [[Curation.blocklistGate]] on a hand fixture: occurrence (not
  * distinct-term) counting, case-insensitive token match, the sorted
  * distinct hit list, zero-hit rows surviving the left join, and the
  * inclusive threshold boundary.
  */
class BlocklistSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("blocklistGate: counts, case, boundary, zero-hit rows") {
    val docs = Seq(
      (1L, "Bad bad APPLE pie"),   // 'bad' twice (case-folded), 'apple' once
      (2L, "clean words only"),
      (3L, "bad apple"),           // exactly at maxHits = 2
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val terms = Seq("bad", "apple", "BAD").toDF("term") // dup term dedups
    val out = Curation.blocklistGate(docs, "id", "text", terms, "term",
        maxHits = 2L)
      .select(col("id"), col("n_blocked"),
        concat_ws(" ", col("blocked_terms")).as("bt"), col("keep"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, "apple bad", false))) // 3 occurrences > 2
    assert(out(2L) == ((0L, "", true)))
    assert(out(3L) == ((2L, "apple bad", true))) // inclusive boundary
    assert(out(4L) == ((0L, "", true)))          // null text = no tokens
  }
}
