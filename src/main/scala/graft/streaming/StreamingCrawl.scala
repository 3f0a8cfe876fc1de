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
  * appends its survivors' digests. Bucket the index by content_hash
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

  /** The archive index as stored: empty on first start. */
  def loadIndex(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    val d = new java.io.File(indexDir)
    val files = Option(d.list()).getOrElse(Array.empty)
    if (d.exists() && files.nonEmpty) spark.read.parquet(indexDir)
    else Seq.empty[String].toDF("content_hash")
  }

  /** Start the intake query over a STREAMING frame of (id, html) rows
    * (e.g. parsed WARC responses — [[parseWarcFiles]] turns arriving
    * `.warc.gz` bytes into that frame). Each batch appends survivors
    * to `sinkDir` and their digests to `indexDir`; `checkpointDir`
    * carries the source offsets, so a restart resumes without
    * re-accepting (exactly-once via the digest screen even on replayed
    * batches: a replayed document's digest is already in the index —
    * the screen makes the sink idempotent at the content level).
    */
  def ingest(stream: DataFrame, idCol: String, htmlCol: String,
             sinkDir: String, indexDir: String, checkpointDir: String,
             minTokens: Int = 5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val (accepted, _) =
          acceptBatch(batch, idCol, htmlCol,
            loadIndex(spark, indexDir), minTokens)
        // accepted is consumed twice (sink + digests) in one batch:
        // cut once so the chain runs once
        val cut = accepted.localCheckpoint(true)
        cut.write.mode("append").parquet(sinkDir)
        Dedup.digestIndex(cut, "main").write.mode("append").parquet(indexDir)
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
