package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** Structured Streaming maintenance of the normalized BM25 index
  * ([[graft.llm.Retrieval.buildPostingsNorm]]'s (postings, termDf,
  * stats) shape) — the serving-side loop: documents stream in,
  * searches run against an index that is never rebuilt.
  *
  * Log-structured design: every micro-batch APPENDS — its map-only
  * postings (the native `term_freqs` pass makes per-doc postings a
  * row-local fact, so the append carries no shuffle at all), its
  * per-batch term-df deltas, and its one-row stats delta. Nothing is
  * ever rewritten in the hot path; [[loadIndex]] folds the df and
  * stats deltas at read time (vocabulary-sized and O(batches)-row
  * aggregations), and [[compactIndex]] collapses the logs when a
  * maintenance window allows. This is the same append-only contract
  * [[graft.llm.Retrieval.updatePostingsNorm]] gives batch updates,
  * made safe for `foreachBatch` (a retried batch can be detected by
  * its `batch_id` column before double-appending).
  *
  * Search parity: `loadIndex` composed with
  * [[graft.llm.Retrieval.searchPostingsNorm]] returns EXACTLY
  * [[graft.llm.Retrieval.bm25TopK]] over the union of all appended
  * batches (StreamingRetrievalSpec pins it across 3 micro-batches).
  */
object StreamingRetrieval {

  /** `foreachBatch` hook: append one micro-batch of NEW documents to
    * the index logs at `indexDir`. The batch id rides along on every
    * appended row so an at-least-once retry is detectable (idempotent
    * replay = filter the id out at load, or skip the append when the
    * id is already present — the caller owns that policy).
    */
  def appendBatch(indexDir: String, idCol: String, textCol: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    val (post, termDf, stats) = Retrieval.buildPostingsNorm(batch, idCol, textCol)
    post.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$indexDir/postings")
    termDf.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$indexDir/termdf")
    stats.select(col("n_docs"), col("total_len"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$indexDir/stats")
  }

  /** The streaming sink: one call wires `docs.writeStream` through
    * [[appendBatch]]. Caller starts/awaits the returned query.
    */
  def maintainIndex(docs: DataFrame, idCol: String, textCol: String,
                    indexDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(indexDir, idCol, textCol)(batch, id)
      }

  /** Fold the index logs into the (postings, termDf, stats) triple
    * [[graft.llm.Retrieval.searchPostingsNorm]] consumes. The postings
    * log IS the postings table (drop the batch stamp); term-df deltas
    * sum per term; stats deltas sum into the one-row frame.
    */
  def loadIndex(spark: SparkSession, indexDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val post = spark.read.parquet(s"$indexDir/postings").drop("batch_id")
    val termDf = spark.read.parquet(s"$indexDir/termdf")
      .groupBy("term").agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
      .withColumn("avgdl", col("total_len") / col("n_docs"))
    (post, termDf, stats)
  }

  /** Collapse the df/stats logs to one generation (maintenance window
    * operation — the hot path never rewrites). Writes compacted logs
    * beside the live ones, then swaps directories; the postings log
    * needs no compaction (it is already the final table).
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    // Hadoop-FS renames, not java.io.File: the index lives wherever the
    // stream writes it (hdfs://, s3a://), and a driver-local renameTo
    // would fail every compaction off the driver's own disk
    def swapIn(sub: String)(compacted: DataFrame): Unit = {
      val (f, _) = BatchState.fs(spark, indexDir)
      val live = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/${sub}_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$indexDir/${sub}_old")
      compacted.write.mode("overwrite").parquet(tmp.toString)
      if (f.exists(old)) f.delete(old, true)
      if (!f.rename(live, old)) sys.error(s"compactIndex: cannot retire $live")
      if (!f.rename(tmp, live)) sys.error(s"compactIndex: cannot promote $tmp")
      f.delete(old, true)
      ()
    }
    swapIn("termdf")(spark.read.parquet(s"$indexDir/termdf")
      .groupBy("term").agg(sum(col("df")).as("df"))
      .withColumn("batch_id", lit(-1L)))
    swapIn("stats")(spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
      .withColumn("batch_id", lit(-1L)))
  }
}
