package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.{Dedup, TextFunctions, Warc}

/** Streaming crawl ingestion — the intake chain a continuously-arriving
  * crawl runs (WARC segments landing → HTML main-content extraction →
  * minimum-content gate → exact dedup against EVERYTHING already
  * accepted), as a `foreachBatch` query so the archive digest index
  * persists ACROSS batches and restarts (micro-batch state like
  * [[StreamingDedup.dedupStream]] only covers the watermark horizon;
  * a crawl must never re-accept a page it archived last month).
  *
  * Per micro-batch the chain is the BATCH operators verbatim
  * ([[TextFunctions.htmlMainText]], [[Dedup.exactDedupAgainst]] over
  * [[Dedup.digestIndex]]) — stream == batch agreement is by
  * construction, StreamingCrawlSpec pins it on a two-batch fixture.
  *
  * Scale shape: the index the screen joins against is 16 bytes per
  * distinct accepted document (digest-only — archive payloads are
  * never re-read, the monthly-crawl property the batch incremental
  * dedup already measures flat across 2×–20× archives); each batch
  * adds a `batch_id` partition of its survivors' digests. Bucket the
  * index by content_hash
  * ([[graft.etd.Sources.writeBucketed]]) when batches grow past the
  * broadcast threshold so the anti join co-locates without a shuffle
  * of the index side.
  */
object StreamingCrawl {

  /** One micro-batch through the intake chain: extract main content
    * from `htmlCol`, gate on `minTokens` whitespace tokens, drop
    * everything whose digest is in `index` (plus within-batch min-id
    * dedup). Returns (accepted rows incl. `main`/`n_tokens`, their
    * digest rows to append to the index). Pure batch operators — also
    * the replay path for backfills.
    */
  def acceptBatch(batch: DataFrame, idCol: String, htmlCol: String,
                  index: DataFrame, minTokens: Int = 5)
      : (DataFrame, DataFrame) = {
    val extracted = batch
      .withColumn("main", TextFunctions.htmlMainText(col(htmlCol)))
      .drop(htmlCol)
      .withColumn("n_tokens",
        size(TextFunctions.tokens(col("main"))).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    val accepted = Dedup.exactDedupAgainst(extracted, idCol, "main", index)
    (accepted, Dedup.digestIndex(accepted, "main"))
  }

  /** The archive index as stored — (content_hash, batch_id) rows;
    * empty on first start. The probe is Hadoop-FS ([[BatchState]]), so
    * the index dir can live on any Spark-visible storage — a
    * driver-local probe would read a remote index as empty every batch
    * and silently disable cross-batch dedup.
    */
  def loadIndex(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    if (BatchState.hasData(spark, indexDir)) spark.read.parquet(indexDir)
    else Seq.empty[(String, Long)].toDF("content_hash", "batch_id")
  }

  /** Start the intake query over a STREAMING frame of (id, html) rows
    * (e.g. parsed WARC responses — [[parseWarcFiles]] turns arriving
    * `.warc.gz` bytes into that frame). Each batch writes survivors
    * to `sinkDir` and their digests to `indexDir`; `checkpointDir`
    * carries the source offsets.
    *
    * Restart safety: both writes land in a `batch_id=<N>` partition
    * via DYNAMIC partition overwrite, so a replayed batch REWRITES its
    * own partitions instead of appending next to a failed attempt's
    * rows — the sink and index cannot accumulate duplicates however
    * the batch dies between the two writes. The dedup screen excludes
    * the current batch's own index rows, so the replay decides
    * acceptance from exactly the committed pre-batch state (batches
    * `< N` are immutable once batch N starts — Structured Streaming
    * batch ids are monotone).
    */
  def ingest(stream: DataFrame, idCol: String, htmlCol: String,
             sinkDir: String, indexDir: String, checkpointDir: String,
             minTokens: Int = 5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = loadIndex(spark, indexDir)
          .filter(col("batch_id") =!= lit(batchId))
          .select("content_hash")
        val (accepted, _) =
          acceptBatch(batch, idCol, htmlCol, committed, minTokens)
        // accepted is consumed twice (sink + digests) in one batch:
        // cut once so the chain runs once
        val cut = accepted.withColumn("batch_id", lit(batchId))
          .localCheckpoint(true)
        def writePartition(df: DataFrame, dir: String): Unit =
          df.write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(dir)
        writePartition(cut, sinkDir)
        writePartition(
          Dedup.digestIndex(cut.drop("batch_id"), "main")
            .withColumn("batch_id", lit(batchId)),
          indexDir)
        graft.Checkpoints.free(cut)
        ()
      }
      .start()

  /** Map a streaming frame of whole WARC file images (`fileCol`:
    * name, `bytesCol`: binary, gzipped iff the name ends `.gz`) to
    * parsed `response` rows with the body decoded as UTF-8 html — the
    * file-at-a-time unit the batch reader uses, applied per arriving
    * file. Map-only (flatMap over rows), so it composes with any
    * streaming source that delivers file images.
    */
  def parseWarcFiles(files: DataFrame, fileCol: String,
                     bytesCol: String): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(fileCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        Warc.parseWarcBytes(name, bytes, gunzip = name.endsWith(".gz"))
          .filter(_.warc_type == "response")
      }
      .toDF()
      .withColumn("html", decode(col("body"), "UTF-8"))
  }
}
