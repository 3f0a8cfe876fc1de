package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextFunctions

/** Structured Streaming corpus curation: the standard pre-training intake
  * chain (quality gate -> PII redaction -> exact dedup) as ONE streaming
  * query over a live document feed.
  *
  * The stateless stages reuse the batch column expressions verbatim
  * ([[TextFunctions.qualityScore]], [[TextFunctions.redactPii]]) — a
  * streaming micro-batch plan evaluates them identically, so stream and
  * batch curation agree by construction. Only the dedup stage carries
  * state ([[StreamingDedup.dedupStream]]: one digest per distinct
  * document in the watermark horizon).
  *
  * Dedup runs on the REDACTED text deliberately: documents that differ
  * only in their embedded PII (form letters, boilerplate with injected
  * addresses) collapse to one retained copy — the curation-correct
  * grouping, and the batch compaction over the sink groups on the same
  * digest of the same redacted content.
  */
object StreamingCuration {

  /** Curated stream: drop documents scoring under `minQuality`, redact
    * PII in place, keep the first arrival per distinct redacted content
    * within the `lateness` horizon.
    */
  def curateStream(docs: DataFrame, textCol: String, eventTimeCol: String,
                   minQuality: Double = 0.5,
                   lateness: String = "1 hour"): DataFrame = {
    val gated = docs
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .withColumn(textCol, TextFunctions.redactPii(col(textCol)))
    StreamingDedup.dedupStream(gated, textCol, eventTimeCol, lateness)
  }
}
