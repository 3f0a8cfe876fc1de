package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Incremental snapshot dedup: a new batch against a persisted archive
  * index equals the full-union dedup restricted to the new batch — the
  * property that lets monthly snapshots dedup against years of archive
  * without re-reading it.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog near the barn"
  private val b = "solar panels convert sunlight into household electricity daily"
  private val c = "meter readings arrive every five minutes from every house"

  test("exactDedupAgainst == full-union exactDedup restricted to the snapshot") {
    val archive = Seq(1L -> a, 2L -> b).toDF("doc_id", "text")
    val snapshot = Seq(
      10L -> a,   // archived text -> dropped
      11L -> c,   // novel -> kept
      12L -> c,   // within-snapshot dup -> dropped
      13L -> b    // archived text -> dropped
    ).toDF("doc_id", "text")

    // round-trip the index through parquet like a real archive would
    val tmp = java.nio.file.Files.createTempDirectory("digidx").toString
    Dedup.digestIndex(archive, "text")
      .write.mode("overwrite").parquet(s"$tmp/idx")
    val idx = spark.read.parquet(s"$tmp/idx")

    val incremental = Dedup.exactDedupAgainst(snapshot, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == Set(11L))

    val full = Dedup.exactDedup(archive.unionByName(snapshot), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == full.filter(_ >= 10L),
      "incremental must equal full-union dedup restricted to snapshot ids")
  }

  test("null and empty text survive the archive screen consistently (ADVICE r10)") {
    // null text: md5(null) is null, so without the sentinel digest the
    // index would silently drop the null-archive row AND null snapshot
    // rows would never match it (null never equals in a join). Empty
    // text must stay DISTINCT from null — exactDedup's groupBy keeps
    // them in separate groups, and the equivalence must hold on corpora
    // containing both.
    val archive = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, a))
      .toDF("doc_id", "text")
    val snapshot = Seq(
      (10L, null.asInstanceOf[String]), // archived (null) -> dropped
      (11L, ""),                        // archived ('')  -> dropped
      (12L, c)                          // novel -> kept
    ).toDF("doc_id", "text")
    val idx = Dedup.digestIndex(archive, "text")
    assert(idx.count() == 3, "null, '', and a are three distinct digests")
    val incremental = Dedup.exactDedupAgainst(snapshot, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == Set(12L))
    val full = Dedup.exactDedup(archive.unionByName(snapshot), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == full.filter(_ >= 10L))

    // null-only archive must NOT screen an ''-text snapshot row (and
    // vice versa) — the sentinel keeps the two apart
    val nullIdx = Dedup.digestIndex(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
    val keptEmpty = Dedup.exactDedupAgainst(
        Seq((20L, "")).toDF("doc_id", "text"), "doc_id", "text", nullIdx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptEmpty == Set(20L), "'' must not be screened by a null-text archive")
  }

  test("nearDupScreenAgainst drops band-collision docs, keeps novel ones") {
    val archive = Seq(1L -> a, 2L -> b).toDF("doc_id", "text")
    val snapshot = Seq(
      10L -> a,               // identical -> every band collides -> dropped
      11L -> (a + " today"),  // near-dup -> some band collides -> dropped
      12L -> c                // novel -> no collision -> kept
    ).toDF("doc_id", "text")
    val idx = Dedup.bandIndex(archive, "doc_id", "text")
    val kept = Dedup.nearDupScreenAgainst(snapshot, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))

    // the screen's drop set == snapshot docs with an lshCandidatePairs
    // pair crossing into the archive on the union corpus
    val crossPairs = Dedup.lshCandidatePairs(
        archive.unionByName(snapshot), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (x, y) => (x < 10) != (y < 10) }
      .flatMap { case (x, y) => Seq(x, y) }.filter(_ >= 10).toSet
    assert(crossPairs == Set(10L, 11L))
  }
}
