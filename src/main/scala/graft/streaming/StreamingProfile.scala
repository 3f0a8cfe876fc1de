package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.CorpusProfile

/** Continuously-maintained corpus profile: each micro-batch is profiled
  * with the batch operator ([[CorpusProfile.profile]]) and FOLDED into
  * the persisted profile ([[CorpusProfile.fold]] — exact, relational),
  * so the state on disk always equals the profile of everything ever
  * ingested, at O(groups × k) bytes, with no archive re-read. The
  * dashboard view is [[CorpusProfile.report]] over the state dir at
  * any moment — the streaming twin of `q_corpus_sketch`, maintained
  * the way `q_profile_fold` is driver-checked.
  */
object StreamingProfile {

  def loadState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val d = new java.io.File(stateDir)
    val files = Option(d.list()).getOrElse(Array.empty)
    if (d.exists() && files.nonEmpty) Some(spark.read.parquet(stateDir))
    else None
  }

  /** Start the maintainer over a streaming frame of documents. */
  def maintain(stream: DataFrame, groupCol: String, idCol: String,
               textCol: String, stateDir: String, checkpointDir: String,
               k: Int = 16384, kq: Int = 4096): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val bp = CorpusProfile.profile(batch, groupCol, idCol, textCol, k, kq)
        val merged = loadState(spark, stateDir)
          .fold(bp)(cur => CorpusProfile.fold(cur, bp, groupCol, k, kq))
        // materialize BEFORE the overwrite deletes the state files the
        // plan reads from
        val cut = merged.localCheckpoint(true)
        cut.write.mode("overwrite").parquet(stateDir)
        graft.Checkpoints.free(cut)
        ()
      }
      .start()
}
