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
  * made replay-exact for `foreachBatch` by construction: each batch
  * writes its own `batch_id=<N>` partition via dynamic overwrite (an
  * at-least-once retry REWRITES its failed attempt instead of
  * appending next to it), and a batch whose deltas a compaction
  * already folded — detectable via the [[BatchState.readFolded]]
  * ledger — is skipped outright, the [[StreamingCrawl.BucketedIndex]]
  * contract.
  *
  * Search parity: `loadIndex` composed with
  * [[graft.llm.Retrieval.searchPostingsNorm]] returns EXACTLY
  * [[graft.llm.Retrieval.bm25TopK]] over the union of all appended
  * batches (StreamingRetrievalSpec pins it across 3 micro-batches).
  */
object StreamingRetrieval {

  /** `foreachBatch` hook: append one micro-batch of NEW documents to
    * the index logs at `indexDir`, replay-exactly — each log write
    * targets the batch's own `batch_id=<N>` partition under dynamic
    * overwrite, so however many at-least-once attempts run, exactly
    * one copy of the batch's rows survives. A batch the ledger marks
    * FOLDED (a compaction moved its deltas into `batch_id = -1`; its
    * own partitions, the replay unit, no longer hold them) is durably
    * committed by [[compactIndex]]'s precondition, so its replay is
    * the no-op — re-appending would double its df/stats contribution.
    *
    * `autoCompactEvery` > 0 folds the logs in-band once that many
    * unfolded batch partitions have accumulated (VERDICT r15 #6: a
    * 10,000-batch stream that never calls [[compactIndex]] pays
    * 1,600+ file opens per search — the manual-only fold was a
    * footgun). Folding the JUST-APPENDED batch before its offsets
    * commit is safe: the fold runs only after the batch's three log
    * writes completed, and if the batch replays anyway the ledger
    * makes the replay a no-op — correct, because its rows already
    * live in the `-1` generation. Default 0 keeps folds out-of-band.
    * Note for serving deployments: a fold swaps directories
    * (promote-then-retire), so a CONCURRENT search's file listing can
    * transiently miss between the two renames — the same window
    * manual compaction always had, but in-band it recurs every
    * `autoCompactEvery` batches; serving reads should retry on a
    * listing failure, or keep folds manual where reads cannot.
    */
  def appendBatch(indexDir: String, idCol: String, textCol: String,
                  autoCompactEvery: Int = 0)
                 (batch: DataFrame, batchId: Long): Unit = {
    // finish a compaction that crashed between a log's retire and
    // promote — before any write re-creates a missing live dir and
    // orphans the candidate holding the folded history (r17)
    Seq("postings", "termdf", "stats").foreach(sub =>
      BatchState.recoverSwap(batch.sparkSession, s"$indexDir/$sub"))
    if (BatchState.readFolded(batch.sparkSession, indexDir)
        .contains(batchId)) return
    val (post, termDf, stats) = Retrieval.buildPostingsNorm(batch, idCol, textCol)
    def append(df: DataFrame, sub: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$indexDir/$sub")
    append(post, "postings")
    append(termDf, "termdf")
    append(stats.select(col("n_docs"), col("total_len")), "stats")
    if (autoCompactEvery > 0 &&
        BatchState.unfoldedBatches(batch.sparkSession,
          s"$indexDir/stats") >= autoCompactEvery)
      compactIndex(batch.sparkSession, indexDir)
  }

  /** The streaming sink: one call wires `docs.writeStream` through
    * [[appendBatch]]. Caller starts/awaits the returned query.
    */
  def maintainIndex(docs: DataFrame, idCol: String, textCol: String,
                    indexDir: String, checkpointDir: String,
                    autoCompactEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(indexDir, idCol, textCol, autoCompactEvery)(batch, id)
      }

  /** Fold the index logs into the (postings, termDf, stats) triple
    * [[graft.llm.Retrieval.searchPostingsNorm]] consumes. The postings
    * log IS the postings table (drop the batch stamp); term-df deltas
    * sum per term; stats deltas sum into the one-row frame.
    */
  def loadIndex(spark: SparkSession, indexDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    Seq("postings", "termdf", "stats").foreach(sub =>
      BatchState.recoverSwap(spark, s"$indexDir/$sub")) // crash window
    val post = spark.read.parquet(s"$indexDir/postings").drop("batch_id")
    val termDf = spark.read.parquet(s"$indexDir/termdf")
      .groupBy("term").agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
      .withColumn("avgdl", col("total_len") / col("n_docs"))
    (post, termDf, stats)
  }

  /** Collapse the logs to one `batch_id = -1` generation (maintenance
    * window operation — the hot path never rewrites): df deltas sum per
    * term, stats deltas sum to one row, and the postings log — already
    * the final rows — is refolded term-clustered (repartition + sort by
    * term), which bounds the file count at O(shuffle partitions)
    * however many batches ran AND gives the term-pruned serving read
    * ([[graft.llm.Retrieval.searchPostingsPruned]]) row-group min/max
    * locality to prune on.
    *
    * Precondition: run OUT-OF-BAND with the folded batches durably
    * committed. That contract is enforced, not just documented — and
    * because [[appendBatch]] performs THREE sequential non-atomic
    * writes (postings, then termdf, then stats), "durably committed"
    * is judged per batch id as presence in ALL THREE logs (ADVICE
    * r15). A crash mid-append leaves the id in a strict prefix of the
    * logs; folding such a partial batch would be wrong both ways:
    * ledgering it skips the repairing replay (its missing stats delta
    * is lost forever, skewing avgdl and every BM25 score), while
    * folding its prefix un-ledgered lets the replay re-append next to
    * the fold, doubling its tf/df contributions. So the fold (a) only
    * ledgers and folds COMPLETE ids, ledger written before any swap
    * (complete ⇒ its `foreachBatch` writes all finished, so early
    * ledgering is safe whichever swap a crash interrupts), and (b)
    * carries each log's incomplete partitions across the swap
    * UNTOUCHED under their own `batch_id=<N>`, so the at-least-once
    * replay's dynamic overwrite repairs them in place and the NEXT
    * compaction folds them.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    def idsIn(sub: String): Set[Long] =
      spark.read.parquet(s"$indexDir/$sub")
        .select(col("batch_id").cast("long")).distinct()
        .as[Long].collect().toSet.filter(_ != -1L)
    val complete = idsIn("postings") & idsIn("termdf") & idsIn("stats")
    if (complete.isEmpty) return // nothing newly committed to fold
    BatchState.writeFolded(spark, indexDir,
      complete ++ BatchState.readFolded(spark, indexDir))
    // Hadoop-FS renames via BatchState.swapIn, not java.io.File: the
    // index lives wherever the stream writes it (hdfs://, s3a://)
    def swapIn(sub: String)(fold: DataFrame => DataFrame): Unit = {
      val incomplete = (idsIn(sub) -- complete).toSeq
      BatchState.swapIn(spark, s"$indexDir/$sub") { tmp =>
        val log = spark.read.parquet(s"$indexDir/$sub")
        fold(log.filter(!col("batch_id").isin(incomplete: _*))
            .drop("batch_id"))
          .withColumn("batch_id", lit(-1L))
          .write.partitionBy("batch_id").mode("overwrite").parquet(tmp)
        if (incomplete.nonEmpty)
          log.filter(col("batch_id").isin(incomplete: _*))
            .write.partitionBy("batch_id").mode("append").parquet(tmp)
      }
    }
    swapIn("postings")(
      _.repartition(col("term")).sortWithinPartitions("term"))
    swapIn("termdf")(_.groupBy("term").agg(sum(col("df")).as("df")))
    swapIn("stats")(_.agg(sum(col("n_docs")).as("n_docs"),
      sum(col("total_len")).as("total_len")))
  }

  // ------------------------------------------------------------------
  // Positional index maintenance (phrase/proximity serving)
  // ------------------------------------------------------------------

  /** `foreachBatch` hook for the POSITIONAL index
    * ([[graft.llm.Retrieval.positionalPostings]]): ONE log with
    * zero-shuffle appends — a document's token positions are a
    * row-local fact, so the append is pure map work — under the same
    * replay discipline as [[appendBatch]] (per-batch dynamic partition
    * overwrite, folded-batch ledger no-op, crash-window recovery).
    * The single-log degenerate of the three-log contract: "durably
    * committed" is presence in the one log, so the fold has no
    * partial-batch arm at all. Use an `indexDir` of its own — the
    * `_folded_batches` ledger is per-directory, and sharing one with
    * the BM25 logs would conflate the two folds' batch ids.
    *
    * Serving parity: [[graft.llm.Retrieval.phraseMatches]] /
    * [[graft.llm.Retrieval.proximityPairs]] over [[loadPositional]]
    * equal the one-shot build over the union of all appended batches
    * (positions are per-document, so batch boundaries cannot shift
    * them — PositionalLogSpec pins it).
    */
  def appendPositional(indexDir: String, idCol: String, textCol: String,
                       autoCompactEvery: Int = 0)
                      (batch: DataFrame, batchId: Long): Unit = {
    BatchState.recoverSwap(batch.sparkSession, s"$indexDir/positions")
    if (BatchState.readFolded(batch.sparkSession, indexDir)
        .contains(batchId)) return
    graft.llm.Retrieval.positionalPostings(batch, idCol, textCol)
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$indexDir/positions")
    if (autoCompactEvery > 0 &&
        BatchState.unfoldedBatches(batch.sparkSession,
          s"$indexDir/positions") >= autoCompactEvery)
      compactPositional(batch.sparkSession, indexDir)
  }

  /** The streaming sink: wires `docs.writeStream` through
    * [[appendPositional]]. Caller starts/awaits the returned query.
    */
  def maintainPositional(docs: DataFrame, idCol: String, textCol: String,
                         indexDir: String, checkpointDir: String,
                         autoCompactEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendPositional(indexDir, idCol, textCol, autoCompactEvery)(batch, id)
      }

  /** The positional log as the (doc_id, term, pos) frame phrase and
    * proximity search consume — the log IS the index; no read-time
    * folding is needed.
    */
  def loadPositional(spark: SparkSession, indexDir: String): DataFrame = {
    BatchState.recoverSwap(spark, s"$indexDir/positions")
    spark.read.parquet(s"$indexDir/positions").drop("batch_id")
  }

  /** Collapse the positional log to one `batch_id = -1` generation,
    * TERM-clustered (repartition + sort by term) — the same file-count
    * bound and row-group term locality [[compactIndex]] gives the BM25
    * postings, so a bucketed/pruned phrase read touches only its
    * terms' row groups. Single log ⇒ every present batch id is
    * complete; ledger written before the swap ([[compactIndex]]'s
    * ordering), and a post-fold replay is the ledgered no-op.
    */
  def compactPositional(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    // a prior compaction may have crashed between retire and promote;
    // promote the complete _compacting candidate before reading (the
    // same self-repair compactEdges runs — a standalone compaction must
    // not require an append/load to have healed the log first)
    BatchState.recoverSwap(spark, s"$indexDir/positions")
    val ids = spark.read.parquet(s"$indexDir/positions")
      .select(col("batch_id").cast("long")).distinct()
      .as[Long].collect().toSet.filter(_ != -1L)
    if (ids.isEmpty) return
    BatchState.writeFolded(spark, indexDir,
      ids ++ BatchState.readFolded(spark, indexDir))
    BatchState.swapIn(spark, s"$indexDir/positions") { tmp =>
      spark.read.parquet(s"$indexDir/positions").drop("batch_id")
        .repartition(col("term")).sortWithinPartitions("term")
        .withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(tmp)
    }
  }
}
