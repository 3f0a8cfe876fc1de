package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the `q_*_stream` oracle queries: write a batch
  * fixture to a temp dir, replay it through a parquet FILE-SOURCE
  * stream into the caller's streaming transform, run the query to
  * completion against an append-mode memory sink, project the emitted
  * table, and hand back a localCheckpoint-materialized result so the
  * temp dir and sink view can be torn down before returning.
  *
  * One place for every harness-level concern — sink naming, cleanup on
  * failure (the finally drops the view and the dir even when the
  * stream itself throws), and the reliance on Spark's no-data
  * micro-batch to flush watermark-closed state after the final file —
  * instead of six copies drifting apart (r19 review).
  */
private[graft] object StreamHarness {

  /** Best-effort recursive delete of a query-scoped temp directory —
    * shared by the incremental-maintainer and streamed-oracle queries,
    * whose results are all localCheckpoint-materialized before the
    * backing directory goes away.
    */
  def deleteTempDir(dir: String): Unit =
    scala.util.Try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

  /** Run `mk(fileStream)` to completion over `base` written as parquet
    * (a single file when `oneFile` — so a micro-batch boundary can
    * never split correlated rows, e.g. a duplicate pair across a
    * dedup-state horizon), then return `project(emitted)` eagerly
    * materialized. `extra` rows (e.g. a far-future watermark sentinel)
    * append AFTER the base write — but with no maxFilesPerTrigger the
    * file source consumes every available file in the FIRST micro-batch,
    * so base and sentinel usually share one batch (ADVICE r19): nothing
    * here guarantees multi-batch ordering, and flush correctness rests
    * on the end-of-batch watermark update plus Spark's no-data
    * micro-batch, which together close and emit watermark-expired state
    * regardless of how the files were batched.
    */
  def run(spark: SparkSession, sink: String, base: DataFrame,
          extra: Option[DataFrame] = None, oneFile: Boolean = false)
         (mk: DataFrame => DataFrame)
         (project: DataFrame => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_$sink").toString
    try {
      val src = s"$tmp/in"
      (if (oneFile) base.coalesce(1) else base)
        .write.mode("overwrite").parquet(src)
      extra.foreach(_.coalesce(1).write.mode("append").parquet(src))
      val query = mk(spark.readStream
          .schema(spark.read.parquet(src).schema).parquet(src))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
      project(spark.table(sink)).localCheckpoint()
    } finally {
      spark.catalog.dropTempView(sink)
      deleteTempDir(tmp)
    }
  }
}
