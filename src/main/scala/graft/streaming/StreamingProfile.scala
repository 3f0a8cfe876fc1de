package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.CorpusProfile

/** Continuously-maintained corpus profile: each micro-batch is profiled
  * with the batch operator ([[CorpusProfile.profile]]) and FOLDED into
  * the persisted profile ([[CorpusProfile.fold]] — exact, relational),
  * so the state on disk always equals the profile of everything ever
  * ingested, at O(groups × k) bytes, with no archive re-read. The
  * dashboard view is [[CorpusProfile.report]] over [[loadState]] at
  * any moment — the streaming twin of `q_corpus_sketch`, maintained
  * the way `q_profile_fold` is driver-checked.
  *
  * Durability: the state dir is VERSIONED (`v<batchId>` subdirs,
  * [[BatchState.commitVersion]]) — each batch folds the newest
  * version below its own id and commits a new one; the version it
  * folded FROM is retained until the NEXT batch commits (offsets for
  * batch N become durable only after foreachBatch returns, so a crash
  * in that gap replays batch N — the replay must still find its
  * pre-batch state, ADVICE r12). The profile is the ONLY copy of
  * everything ever ingested, so delete-then-rewrite in place would
  * turn any mid-write crash into unrecoverable loss; versioning
  * leaves a complete fold on disk at every instant, and a replayed
  * batch folds from the version BELOW its own id, so at-least-once
  * redelivery never double-counts AND never drops history.
  */
object StreamingProfile {

  /** The newest committed profile strictly below `beforeBatch`
    * (default: the newest overall — the dashboard read). */
  def loadState(spark: SparkSession, stateDir: String,
                beforeBatch: Long = Long.MaxValue): Option[DataFrame] =
    BatchState.latestVersion(spark, stateDir, beforeBatch)
      .map(v => spark.read.parquet(s"$stateDir/v$v"))

  /** Start the maintainer over a streaming frame of documents. */
  def maintain(stream: DataFrame, groupCol: String, idCol: String,
               textCol: String, stateDir: String, checkpointDir: String,
               k: Int = 16384, kq: Int = 4096): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bp = CorpusProfile.profile(batch, groupCol, idCol, textCol, k, kq)
        // fold from the committed state BELOW this batch id: a replay
        // ignores its own failed attempt's version
        val merged = loadState(spark, stateDir, beforeBatch = batchId)
          .fold(bp)(cur => CorpusProfile.fold(cur, bp, groupCol, k, kq))
        // reads v<old>, writes v<batchId>.tmp — disjoint dirs, so no
        // materialization barrier is needed before the write
        BatchState.commitVersion(spark, stateDir, batchId, merged)
        ()
      }
      .start()
}
