package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KmvExpressions

/** Persistable, mergeable corpus profile — the incremental form of
  * `q_corpus_sketch` (r11 task 7): per group, a document count, a KMV
  * distinct-text summary, and a bottom-k-by-hash token-length sample.
  * Each snapshot's profile is O(groups × k) rows of plain
  * arrays — parquet-friendly — and [[fold]] combines profiles EXACTLY
  * (bottom-k of a union is the bottom-k of merged bottom-ks), so
  * yesterday's profile plus today's equals profiling the union:
  * no archive re-read, ever (the digest-index property, applied to
  * profiling).
  *
  * Everything here is relational — fold re-sketches EXPLODED summary
  * elements through the same native aggregates, so it distributes,
  * keeps no driver state, and inherits the exactness contract
  * (unsaturated summaries make [[report]] driver-checkable:
  * `q_profile_fold` hash-matches the whole-corpus DuckDB replay).
  */
object CorpusProfile {

  /** One corpus pass → one profile row per `groupCol` value:
    * (group, n_docs, text_kmv, tok_sample).
    */
  def profile(docs: DataFrame, groupCol: String, idCol: String,
              textCol: String, k: Int = 16384, kq: Int = 4096): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        KmvExpressions.kmvSketch(
          TextFunctions.hash64(col(textCol)), k).as("text_kmv"),
        KmvExpressions.quantileKmv(
          TextFunctions.hash64(col(idCol).cast("string")),
          size(TextFunctions.tokens(col(textCol))).cast("double"),
          kq).as("tok_sample"))

  /** Merge two profiles: counts sum; summaries explode back to their
    * elements and re-sketch through the same aggregates — identical to
    * sketching the unioned corpora (ProfileSpec pins it bit-for-bit,
    * saturated included). Three tiny shuffles on the group key
    * (profiles are one row per group at any corpus size).
    */
  def fold(a: DataFrame, b: DataFrame, groupCol: String,
           k: Int = 16384, kq: Int = 4096): DataFrame = {
    val u = a.unionByName(b)
    val nd = u.groupBy(col(groupCol)).agg(sum(col("n_docs")).as("n_docs"))
    // explode_outer: a group whose summary is empty must keep its row
    // (kmv aggregates skip the null element, yielding the empty array)
    val tk = u.select(col(groupCol), explode_outer(col("text_kmv")).as("h"))
      .groupBy(col(groupCol))
      .agg(KmvExpressions.kmvSketch(col("h"), k).as("text_kmv"))
    val tq = u.select(col(groupCol), explode_outer(col("tok_sample")).as("e"))
      .groupBy(col(groupCol))
      .agg(KmvExpressions.quantileKmv(col("e.h"), col("e.v"), kq)
        .as("tok_sample"))
    nd.join(tk, Seq(groupCol)).join(tq, Seq(groupCol))
  }

  /** Scalar dashboard view of a profile: distinct texts (exact while
    * the KMV summary is unsaturated) and token-length p50/p90/p99 by
    * the engine's pinned rank rule max(1, ceil(p·n)) — the same
    * relational extraction `q_corpus_sketch` ships.
    */
  def report(profile: DataFrame, groupCol: String): DataFrame = {
    val vals = array_sort(transform(col("tok_sample"), s => s.getField("v")))
    // a surviving group can carry an EMPTY sample (the aggregate skips
    // null elements but the group row remains); index 1 into an empty
    // array is null under non-ANSI and an error under ANSI — make the
    // empty case an explicit null either way (ADVICE r12)
    def q(p: Double) = when(size(vals) > 0,
      element_at(vals, greatest(lit(1), ceil(lit(p) * size(vals)).cast("int"))))
    profile.select(col(groupCol), col("n_docs"),
      size(col("text_kmv")).cast("long").as("distinct_texts"),
      q(0.5).as("p50"), q(0.9).as("p90"), q(0.99).as("p99"))
  }
}
