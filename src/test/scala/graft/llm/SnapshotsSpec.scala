package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Snapshot acceptance capstone: survivors are internally dedup'd AND
  * archive-clean (brute-checked), the updated indexes admit them, and
  * re-screening the accepted set against the updated archive drops
  * everything (idempotence).
  */
class SnapshotsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  import JaccardFixture.{corpus, shingles, jac}

  test("accepted set is internally clean, archive-clean, and idempotent") {
    val t = 0.5
    val arch = corpus(11, 40, idBase = 0L)
    val snap = corpus(111, 60, idBase = 1000L) ++
      arch.take(5).map { case (id, s) => (2000L + id, s) } // planted copies
    val archDf = arch.toDF("doc_id", "text")
    val snapDf = snap.toDF("doc_id", "text")

    val idx = Snapshots.buildIndexes(archDf, "doc_id", "text", t)
    val (accepted, updated) = Snapshots.acceptSnapshot(
      snapDf, "doc_id", "text", idx, archDf, "doc_id", "text", t)
    val ids = accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    val byId = snap.toMap

    // planted archive copies never survive
    assert(ids.intersect(arch.take(5).map(2000L + _._1).toSet).isEmpty)
    // no survivor has an archive partner >= t, nor a surviving partner
    val archSets = arch.map { case (_, s) => shingles(s) }
    for (id <- ids) {
      val ss = shingles(byId(id))
      assert(!archSets.exists(as => jac(ss, as) >= t),
        s"survivor $id still near-dups the archive")
    }
    for (a <- ids; b <- ids if a < b)
      assert(jac(shingles(byId(a)), shingles(byId(b))) < t,
        s"survivors $a,$b still near-dup each other")

    // idempotence: re-screening accepted against the UPDATED archive
    // (payload = archive ∪ accepted) drops every document
    val updatedArchiveText = archDf.unionByName(accepted)
    val again = Dedup.jaccardDedupAgainstFrozen(accepted, "doc_id", "text",
        updated.jaccard, updated.jaccardDf, updatedArchiveText,
        "doc_id", "text", t)
      .count()
    assert(again == 0L, s"re-screen must drop all accepted docs, kept $again")

    // order-refresh equivalence: appending prefixes under the STALE
    // frozen order and rebuilding everything under a FRESH order are
    // both complete screens, so a later snapshot's survivors agree —
    // the compaction can run whenever convenient without a semantic
    // cliff
    val snap2 = corpus(211, 40, idBase = 5000L)
    val snap2Df = snap2.toDF("doc_id", "text")
    val stale = Dedup.jaccardDedupAgainstFrozen(snap2Df, "doc_id", "text",
        updated.jaccard, updated.jaccardDf, updatedArchiveText,
        "doc_id", "text", t)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rebuilt = Snapshots.buildIndexes(updatedArchiveText, "doc_id", "text", t)
    val fresh = Dedup.jaccardDedupAgainstFrozen(snap2Df, "doc_id", "text",
        rebuilt.jaccard, rebuilt.jaccardDf, updatedArchiveText,
        "doc_id", "text", t)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stale == fresh,
      "stale-order append and fresh-order rebuild must screen identically")

    // and the digest index update screens exact copies of accepted docs
    val copies = accepted.select((org.apache.spark.sql.functions.col("doc_id")
      + 9000L).as("doc_id"), org.apache.spark.sql.functions.col("text"))
    assert(Dedup.exactDedupAgainst(copies, "doc_id", "text", updated.digest)
      .count() == 0L)
  }
}
