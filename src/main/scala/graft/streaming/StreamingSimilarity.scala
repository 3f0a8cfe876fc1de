package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Structured Streaming maintenance of the persisted IVF-PQ coded
  * index ([[graft.llm.Similarity.buildIvfPqIndex]]'s (id, codes, cell)
  * shape) — the ANN serving loop next to [[StreamingRetrieval]]'s
  * lexical one.
  *
  * Even simpler than BM25: the coded index is STATELESS per row (cell
  * assignment and PQ codes are functions of the vector and the frozen
  * codebooks), so maintenance is a pure map-only append per
  * micro-batch — no term table, no stats, nothing to fold at read
  * time. The codebooks are trained once on a seed corpus and frozen
  * (the standard serving practice; retrain + re-encode is an
  * out-of-band operation when drift warrants it — the moments-additive
  * PCA gives the drift signal cheaply).
  *
  * Search parity: loadIndex + [[graft.llm.Similarity.ivfPqTopKCoded]]
  * equals the batch index built on everything that arrived
  * (StreamingSimilaritySpec pins it across micro-batches).
  */
object StreamingSimilarity {

  /** `foreachBatch` hook: encode one micro-batch of NEW vectors
    * (map-only) and append to the index log. Batch ids ride along for
    * retry detection, exactly as in [[StreamingRetrieval]].
    */
  def appendBatch(indexDir: String, idCol: String, vecCol: String,
                  coarse: Array[Array[Float]],
                  codebooks: Array[Array[Array[Float]]])
                 (batch: DataFrame, batchId: Long): Unit =
    Similarity.buildIvfPqIndex(batch, idCol, vecCol, coarse, codebooks)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$indexDir/coded")

  /** The streaming sink: wires `vectors.writeStream` through
    * [[appendBatch]]. Caller starts/awaits the returned query.
    */
  def maintainIndex(vectors: DataFrame, idCol: String, vecCol: String,
                    coarse: Array[Array[Float]],
                    codebooks: Array[Array[Array[Float]]],
                    indexDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(indexDir, idCol, vecCol, coarse, codebooks)(batch, id)
      }

  /** The searchable index — the log IS the table. */
  def loadIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/coded").drop("batch_id")
}
