package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.NgramLm

/** Structured Streaming maintenance of the Kneser-Ney trigram count
  * table ([[graft.llm.NgramLm.trigramCounts]]) — the LM analogue of
  * [[StreamingRetrieval]]'s log-structured BM25 index: documents
  * stream in, the model refreshes from counts, archived text is never
  * re-read.
  *
  * Counts are ADDITIVE ([[graft.llm.NgramLm.mergeCounts]]), so the
  * whole maintenance story is the log-structured one: every
  * micro-batch APPENDS its own batch-scale trigram counts (one
  * aggregation over the batch — nothing touches the accumulated log),
  * [[loadCounts]] folds the log with one model-scale hash-agg at read
  * time, and [[compactCounts]] collapses it to one generation in a
  * maintenance window. `trainFromCounts` over the fold IS the model
  * retrained on everything that ever arrived (StreamingLmSpec pins
  * table-level equality across 3 micro-batches, before and after
  * compaction).
  */
object StreamingLm {

  /** `foreachBatch` hook: append one micro-batch's trigram counts to
    * the log at `countsDir`. The batch id rides along on every row so
    * an at-least-once retry is detectable (filter it at load, or skip
    * the append when the id is already present — caller's policy).
    */
  def appendBatch(countsDir: String, idCol: String, textCol: String)
                 (batch: DataFrame, batchId: Long): Unit =
    NgramLm.trigramCounts(batch, idCol, textCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(countsDir)

  /** The streaming sink: wires `docs.writeStream` through
    * [[appendBatch]]. Caller starts/awaits the returned query.
    */
  def maintainCounts(docs: DataFrame, idCol: String, textCol: String,
                     countsDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(countsDir, idCol, textCol)(batch, id)
      }

  /** Fold the count log into the (u, v, w, c) table
    * [[graft.llm.NgramLm.trainFromCounts]] consumes — one model-scale
    * aggregation, O(batches)·model rows in, model rows out.
    */
  def loadCounts(spark: SparkSession, countsDir: String): DataFrame =
    spark.read.parquet(countsDir).drop("batch_id")
      .groupBy(col("u"), col("v"), col("w"))
      .agg(sum(col("c")).as("c"))

  /** Collapse the log to one generation (maintenance window — the hot
    * append path never rewrites). Same swap protocol as
    * [[StreamingRetrieval.compactIndex]].
    */
  def compactCounts(spark: SparkSession, countsDir: String): Unit = {
    val live = new java.io.File(countsDir)
    val tmp = new java.io.File(s"${countsDir}_compacting")
    val old = new java.io.File(s"${countsDir}_old")
    loadCounts(spark, countsDir).withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").parquet(tmp.getPath)
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    if (!live.renameTo(old)) sys.error(s"compactCounts: cannot retire $live")
    if (!tmp.renameTo(live)) sys.error(s"compactCounts: cannot promote $tmp")
    org.apache.commons.io.FileUtils.deleteDirectory(old)
  }
}
