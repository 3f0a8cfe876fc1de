package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.hash64

/** Token-budget sequence packing — the corpus-assembly step between
  * curation and training: concatenate documents in a deterministic order
  * and chunk the stream into fixed-budget training sequences, assigning
  * each document its (sequence id, token offset).
  *
  * This is the standard concat-then-chunk packing (documents may straddle
  * a sequence boundary; the trainer splits on the recorded offset), not
  * bin packing — assignment is a pure prefix-sum, so it distributes.
  *
  * Scale shape: a GLOBAL pack order would serialize through one
  * partition, so the corpus is sharded by a content-stable hash of the id
  * and packed independently per shard — each shard's prefix sum is a
  * windowed cumsum over its own partition, and shards scale with the
  * cluster. Deterministic: same corpus -> same shards -> same sequences,
  * on any cluster size or partitioning.
  */
object Packing {

  /** Assign (shard, seq_id, seq_offset) per document: shard = hash(id) mod
    * `shards`; within a shard, documents pack in id order; seq_id/seq_offset
    * locate the document's first token in the chunked token stream of its
    * shard. `tokenCol` is the document's token count.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("shard", pmod(hash64(col(idCol).cast("string")), lit(shards.toLong)))
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("__before", col("__cum") - col(tokenCol).cast("long"))
      .withColumn("seq_id", expr(s"__before div $budget"))
      .withColumn("seq_offset", pmod(col("__before"), lit(budget)))
      .drop("__cum", "__before")
  }

  /** Overlapping token-window chunking — the within-document counterpart
    * of [[packSequences]] (RAG passage extraction, long-doc context
    * windows): each document splits into windows of `size` whitespace
    * tokens starting every `stride` tokens, each chunk re-joined with
    * single spaces. The final window may be shorter (never empty); a
    * document shorter than `size` yields exactly one chunk; stride <
    * size gives overlap. Map-only + one explode — chunk starts enumerate
    * with `sequence`, windows slice the token array, nothing shuffles
    * (chunk counts grow the row count, not the plan).
    *
    * Output: the input row (minus `textCol`) + chunk_idx (0-based),
    * chunk_text, n_chunk_tokens.
    */
  def chunkTokenWindows(df: DataFrame, idCol: String, textCol: String,
                        size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive")
    val arrSize = org.apache.spark.sql.functions.size _
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val n = arrSize(toks)
    // last window start: the largest multiple of stride < n (so a short
    // tail still chunks); a doc with no tokens yields no rows
    val starts = when(n > 0,
      sequence(lit(0), greatest(
        (ceil((n - size).cast("double") / stride) * stride).cast("int"),
        lit(0)), lit(stride)))
    df
      .withColumn("__toks", toks)
      .select(col("*"), posexplode(starts).as(Seq("chunk_idx", "__start")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " "))
      .withColumn("n_chunk_tokens",
        least(arrSize(col("__toks")) - col("__start"), lit(size)).cast("long"))
      .drop("__toks", "__start", textCol)
  }
}
