package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup
import graft.llm.TextFunctions.shingleHashes

/** Streaming near-duplicate candidate generation: MinHash + LSH banding
  * over a live document stream, with per-bucket state.
  *
  * Batch/stream parity: signatures and band keys are the SAME seeded
  * universal hashes the batch path computes ([[Dedup.minhashFromHashes]] /
  * [[Dedup.lshBandKeys]]), so a pair the stream flags is exactly a pair
  * the batch LSH would flag. The per-document signature is map-only (the
  * native fused shingle-hash pass bound to a column, then 16 mins over a
  * cheap column reference — no re-hashing per seed); the only shuffle is
  * the groupByKey on (band, band key), the same key the batch bucket
  * groupBy uses.
  *
  * State per bucket is the member id list, capped at `maxBucket` (a
  * capped bucket's members are already exact-dup candidates by band
  * collision — same policy as the batch path). Each arriving document
  * emits pairs against the bucket's existing members only, so output is
  * incremental and never all-pairs. State is bounded by the run scope
  * (like a batch job's) — long-running deployments should restart per
  * corpus epoch or add an event-time timeout with a watermark; capped
  * buckets keep any single key's state at `maxBucket` ids.
  */
object StreamingNearDup {

  case class BandedDoc(bucket: String, docId: Long)
  case class BucketState(ids: List[Long])
  case class CandidatePair(idA: Long, idB: Long)

  /** (bucket, doc) stream: signature -> band keys, exploded. */
  def bandedStream(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4,
                   shingleSize: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    docs
      .withColumn("__hs",
        transform(shingleHashes(col(textCol), shingleSize),
          h => pmod(h, lit(Dedup.lshPrime))))
      .withColumn("__sig", Dedup.minhashFromHashes(col("__hs"), numHashes))
      .select(col(idCol).as("docId"),
        posexplode(Dedup.lshBandKeys(col("__sig"), bands, rowsPerBand))
          .as(Seq("band", "bandKey")))
      .select(concat(col("band"), lit("|"), col("bandKey")).as("bucket"),
        col("docId"))
  }

  /** Candidate pairs as they become known: each new document pairs with
    * the bucket's previous members (dedup of repeated pairs across bands
    * belongs to the downstream sink/compaction, as in the batch path's
    * final distinct).
    */
  def candidatePairs(banded: Dataset[BandedDoc],
                     maxBucket: Int = 1000): Dataset[CandidatePair] = {
    implicit val pairEnc = Encoders.product[CandidatePair]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val keyEnc = Encoders.STRING
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var ids = state.getOption.map(_.ids).getOrElse(Nil)
          val out = Seq.newBuilder[CandidatePair]
          rows.toSeq.sortBy(_.docId).foreach { r =>
            if (!ids.contains(r.docId) && ids.size < maxBucket) {
              ids.foreach { seen =>
                out += (if (seen < r.docId) CandidatePair(seen, r.docId)
                        else CandidatePair(r.docId, seen))
              }
              ids = r.docId :: ids
            }
          }
          state.update(BucketState(ids))
          out.result().iterator
      }
  }
}
