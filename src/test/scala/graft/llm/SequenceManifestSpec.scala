package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Sequence occupancy manifest: conservation, capacity, and alignment
  * invariants over a fixture engineered to straddle (budget 10, docs
  * up to 27 tokens — some occupy 3+ sequences; a zero-token doc).
  */
class SequenceManifestSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val budget = 10L
  private val docs = Seq(
    (1L, 7L), (2L, 27L), (3L, 0L), (4L, 10L), (5L, 3L),
    (6L, 15L), (7L, 1L), (8L, 22L), (9L, 9L), (10L, 4L))
    .toDF("doc_id", "n_tok")

  test("manifest conserves tokens, respects capacity, and aligns with " +
      "packSequences") {
    val packed = Packing.packSequences(docs, "doc_id", "n_tok", budget, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("seq_id")),
          r.getLong(r.fieldIndex("seq_offset")))).toMap
    val rows = Packing.sequenceManifest(docs, "doc_id", "n_tok", budget, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // conservation: each doc's occupancy rows sum to its token count
    val byDoc = rows.groupBy(_._1)
    docs.collect().foreach { d =>
      val (id, n) = (d.getLong(0), d.getLong(1))
      assert(byDoc.get(id).map(_.map(_._5).sum).getOrElse(0L) == n,
        s"doc $id occupancy must sum to $n")
    }
    // a zero-token doc occupies no sequence (but HAS a pack coordinate)
    assert(!byDoc.contains(3L) && packed.contains(3L))

    // capacity: no sequence holds more than budget tokens, and every
    // FULL (non-final) sequence of a shard holds exactly budget
    val bySeq = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._5).sum)
    bySeq.foreach { case (k, tot) =>
      assert(tot <= budget, s"sequence $k over budget: $tot")
    }
    for (shard <- Seq(0L, 1L)) {
      val seqs = bySeq.filter(_._1._1 == shard)
      if (seqs.nonEmpty) {
        val last = seqs.keys.map(_._2).max
        seqs.filter(_._1._2 < last).foreach { case (k, tot) =>
          assert(tot == budget, s"non-final sequence $k not full: $tot")
        }
      }
    }

    // alignment: each doc's FIRST occupancy row is exactly its
    // packSequences coordinate; continuation rows start at offset 0
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._3)
      val (shard, seqId, off) = packed(id)
      assert(sorted.head._2 == shard && sorted.head._3 == seqId &&
        sorted.head._4 == off, s"doc $id first row misaligned")
      sorted.tail.foreach(r =>
        assert(r._4 == 0L, s"doc $id continuation must start at 0"))
      // contiguous sequence ids
      assert(sorted.map(_._3).toSeq == (sorted.head._3 to sorted.last._3).toSeq,
        s"doc $id occupancy must be contiguous")
    }
  }
}
