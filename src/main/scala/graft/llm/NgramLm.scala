package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney trigram language model — trained and served
  * as relational algebra (Heafield 2013, "Scalable Modified Kneser-Ney
  * Language Model Estimation", showed n-gram LM estimation is a chain
  * of sorts/aggregations; this is that chain as Catalyst plans), with
  * CCNet-style (Wenzek et al. 2019, arXiv:1911.00359) document
  * perplexity scoring as the downstream quality-filter signal: train a
  * small LM on a trusted slice, score the whole corpus by negative mean
  * log-probability, and curate on the score.
  *
  * Everything is oracle-checkable: counts are exact integers, every
  * probability is a FIXED IEEE-double expression tree over those
  * integers (identical in any engine — the same contract the rest of
  * the repo's doubles ride), each ln floor-rounds at 1e-9 the moment it
  * leaves libm, and per-document means are exact decimal sums
  * ([[TextFunctions.round9]] / decimal(28,12) discipline).
  *
  * Model shape (ARPA-style, Chen & Goodman 1998 interpolated KN with a
  * single fixed discount D = 0.75):
  *
  *  - highest order keeps REAL counts:
  *      p3(w|u,v) = max(c(uvw)-D, 0)/c(uv·) + bow3(u,v)·p2(w|v),
  *      bow3(u,v) = D·N1+(uv·)/c(uv·)
  *  - lower orders use CONTINUATION counts (how many distinct contexts
  *    an n-gram completes — the "novel continuation" insight of
  *    Kneser-Ney):
  *      p2(w|v) = max(N1+(·vw)-D, 0)/N1+(·v·) + bow2(v)·p1(w),
  *      bow2(v) = D·N1+(v·)/N1+(·v·)
  *      p1(w)   = N1+(·w)/N1+(··)
  *
  * Sentences are padded with two `&lt;s&gt;` and one `&lt;/s&gt;`, so every
  * corpus bigram appears inside some trigram and the continuation
  * counts derived from the trigram table are complete.
  *
  * Scale shape: training is one map-only trigram explode (3 short
  * strings per token) into ONE hash aggregation keyed (u,v,w); every
  * other model table is an aggregation OF that counts table (model-
  * scale, orders of magnitude below corpus-scale — persist it via
  * [[trainFromCounts]] and the corpus is read exactly once). Serving
  * joins the corpus gram table against the five model tables; `uni`
  * and `ctx2` are vocabulary-sized (broadcast), `bi`/`ctx3`/`tri` are
  * model-sized (shuffle joins on gram keys — at 100 TB the model rides
  * hash-partitioned on its own keys and the doc side shuffles id+gram
  * rows only; no text payload moves).
  */
object NgramLm {

  val Bos = "<s>"
  val Eos = "</s>"

  /** Fixed KN discount. 0.75 is the textbook default AND binary-exact
    * as a double, so `c - D` introduces no representation fuzz into
    * the cross-engine expression tree.
    */
  val Discount = 0.75

  /** Per-token trigram rows (id, u, v, w) with double-BOS / single-EOS
    * padding; one row per token position plus one for EOS. Map-only
    * (array transform + explode — no shuffle, no window); null text
    * scores as an empty sentence rather than vanishing.
    */
  def docTrigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = concat(
      array(lit(Bos), lit(Bos)),
      TextFunctions.tokens(coalesce(col(textCol), lit(""))),
      array(lit(Eos)))
    df.select(col(idCol), arr.as("__a"))
      .select(col(idCol), explode(
        transform(sequence(lit(3), size(col("__a"))), i =>
          struct(
            element_at(col("__a"), i - 2).as("u"),
            element_at(col("__a"), i - 1).as("v"),
            element_at(col("__a"), i).as("w")))).as("__t"))
      .select(col(idCol), col("__t.u"), col("__t.v"), col("__t.w"))
  }

  /** The one corpus-scale pass: exact trigram counts (u, v, w, c).
    * Everything else derives from this table — persist it when training
    * and serving share a session.
    */
  def trigramCounts(train: DataFrame, idCol: String, textCol: String): DataFrame =
    docTrigrams(train, idCol, textCol)
      .groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** The five serving tables. `tri`/`bi` carry fully-interpolated
    * probabilities; `ctx3`/`ctx2` carry backoff weights; `uni` the
    * continuation unigram. Every probability column is an UNROUNDED
    * double (exports round at the edge) so scoring and the model table
    * share one expression tree.
    */
  final case class KnModel(
      tri: DataFrame,  // u, v, w, c, p3
      ctx3: DataFrame, // u, v, c_uv, n1p_uv, bow3
      bi: DataFrame,   // v, w, n1p_vw, p2
      ctx2: DataFrame, // v, n1p_v_all, n1p_v_dot, bow2
      uni: DataFrame)  // w, n1p_w, p1

  /** Derive the KN model from a persisted counts table ([[trigramCounts]]).
    * Four aggregations over model-scale data; the corpus is not touched.
    */
  def trainFromCounts(c3: DataFrame): KnModel = {
    val d = lit(Discount)
    val ctx3 = c3.groupBy(col("u"), col("v"))
      .agg(sum(col("c")).as("c_uv"), count(lit(1)).as("n1p_uv"))
      .withColumn("bow3",
        (d * col("n1p_uv").cast("double")) / col("c_uv").cast("double"))
    // c3 is keyed (u,v,w), so count(*) per (v,w) IS |distinct u| — the
    // continuation count N1+(·vw)
    val mid = c3.groupBy(col("v"), col("w")).agg(count(lit(1)).as("n1p_vw"))
    val ctx2 = mid.groupBy(col("v"))
      .agg(sum(col("n1p_vw")).as("n1p_v_all"), count(lit(1)).as("n1p_v_dot"))
      .withColumn("bow2",
        (d * col("n1p_v_dot").cast("double")) / col("n1p_v_all").cast("double"))
    val totals = mid.agg(count(lit(1)).as("n1p_total"))
    val uni = mid.groupBy(col("w")).agg(count(lit(1)).as("n1p_w"))
      .crossJoin(broadcast(totals))
      .select(col("w"), col("n1p_w"),
        (col("n1p_w").cast("double") / col("n1p_total").cast("double")).as("p1"))
    val bi = mid
      .join(ctx2.select("v", "n1p_v_all", "bow2"), Seq("v"))
      .join(uni.select("w", "p1"), Seq("w"))
      .select(col("v"), col("w"), col("n1p_vw"),
        ((greatest(col("n1p_vw").cast("double") - d, lit(0.0)) /
          col("n1p_v_all").cast("double")) +
          (col("bow2") * col("p1"))).as("p2"))
    val tri = c3
      .join(ctx3.select("u", "v", "c_uv", "bow3"), Seq("u", "v"))
      .join(bi.select("v", "w", "p2"), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"), col("c"),
        ((greatest(col("c").cast("double") - d, lit(0.0)) /
          col("c_uv").cast("double")) +
          (col("bow3") * col("p2"))).as("p3"))
    KnModel(tri, ctx3, bi, ctx2, uni)
  }

  /** Convenience one-call train (corpus read once; see
    * [[trainFromCounts]] for the persist seam).
    */
  def train(df: DataFrame, idCol: String, textCol: String): KnModel =
    trainFromCounts(trigramCounts(df, idCol, textCol))

  /** Counts are ADDITIVE: fold a snapshot's trigram counts into a
    * persisted archive count table — one union + hash-agg on model-
    * scale rows, never re-reading archived text. `trainFromCounts` on
    * the merge IS the retrained model (NgramLmSpec pins table-level
    * equality), which makes the LM the same kind of incrementally-
    * maintained index as the BM25 postings and the coded ANN cells.
    */
  def mergeCounts(archiveCounts: DataFrame, snapshotCounts: DataFrame): DataFrame =
    archiveCounts.unionByName(snapshotCounts)
      .groupBy(col("u"), col("v"), col("w"))
      .agg(sum(col("c")).as("c"))

  /** Export view of the trigram level — (u, v, w, c, p) with p rounded
    * at 1e-6 (the oracle/report edge; serving keeps full precision).
    */
  def modelTable(m: KnModel): DataFrame =
    m.tri.select(col("u"), col("v"), col("w"), col("c"),
      (floor(col("p3") * 1e6 + 0.5) / 1e6).as("p"))

  /** The full backoff cascade for ONE scoring trigram, given the five
    * left-joined model columns (p3, bow3, p2, bow2, p1 — any may be
    * null). NULL means "w is outside the model's vocabulary" (OOV);
    * every in-vocabulary w gets positive mass from any context:
    *
    *  - trigram seen                 → p3 (already interpolated)
    *  - (u,v) seen, trigram not     → bow3 · [p2 | bow2·p1]
    *    ((u,v) seen implies v seen, so bow2 is non-null here)
    *  - (u,v) unseen                 → p2 | bow2·p1 | p1
    */
  def backoffP: Column =
    when(col("p3").isNotNull, col("p3"))
      .when(col("bow3").isNotNull,
        col("bow3") * coalesce(col("p2"), col("bow2") * col("p1")))
      .otherwise(coalesce(col("p2"), col("bow2") * col("p1"), col("p1")))

  /** CCNet-style corpus scoring: per document, the negative mean
    * log-probability of its trigrams under the model (lower = more
    * fluent under the training slice — curation keeps low scores),
    * with OOV terms counted, not silently dropped.
    *
    * Output: (idCol, n_terms, n_oov, nll) — nll null iff every term is
    * OOV. Engine-portable: ln floor-rounds at 1e-9 per term, the mean
    * is an exact decimal(28,12) sum over the rounded terms, and the
    * result rounds at 1e-6.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            m: KnModel): DataFrame = {
    val tg = docTrigrams(df, idCol, textCol)
    val joined = tg
      .join(m.tri.select("u", "v", "w", "p3"), Seq("u", "v", "w"), "left")
      .join(m.ctx3.select("u", "v", "bow3"), Seq("u", "v"), "left")
      .join(m.bi.select("v", "w", "p2"), Seq("v", "w"), "left")
      .join(m.ctx2.select("v", "bow2"), Seq("v"), "left")
      .join(m.uni.select("w", "p1"), Seq("w"), "left")
      .withColumn("p", backoffP)
    val l = TextFunctions.round9(log(col("p")))
    joined.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(when(col("p").isNull, 1).otherwise(0)).cast("long").as("n_oov"),
        (floor(-(sum(l.cast("decimal(28,12)")).cast("double") /
          count(col("p"))) * 1e6 + 0.5) / 1e6).as("nll"))
  }
}
