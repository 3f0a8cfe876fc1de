package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextFunctions

/** Edit-distance similarity join (Gravano et al. 2001's q-gram
  * filtering family): all DISTINCT string pairs within Levenshtein
  * distance `maxDist`, found without the quadratic cross product —
  * the fuzzy-dedup operator for titles, names, and vocabulary
  * (spelling-variant mining feeding text normalization).
  *
  * Candidate generation is COMPLETE by construction:
  *  - strings are padded with q−1 sentinel chars on both ends, so a
  *    pair within distance k shares ≥ max(len)+q−1−k·q padded q-grams
  *    AS A MULTISET (each edit destroys at most q grams; a padded
  *    string of length L has exactly L+q−1 grams); whenever that bound
  *    is ≥ 1 the pair meets in the gram join (shared-gram hash +
  *    length-band filter |Δlen| ≤ k);
  *  - strings short enough that the bound can hit 0 (len ≤ q·k) go
  *    through a length-banded all-pairs bucket instead — a set bounded
  *    by the alphabet, not the corpus. The gram join skips pairs where
  *    BOTH sides are short (the bucket owns them), so the union needs
  *    no candidate-level distinct.
  *
  * The COUNT filter (the upgrade r11's first pass documented and
  * deferred): instead of verifying every pair that shares ANY gram,
  * gram-join rows carry an occurrence index (the i-th copy of a gram
  * joins only the i-th copy on the other side, so join rows per pair =
  * Σ_g min(cnt_a(g), cnt_b(g)) — the multiset intersection), the join
  * groups by pair, and only pairs meeting the count bound reach the
  * verifier. Measured (ScaleBench `fuzzy`, 20k seeded-random vocab):
  * 24.0M gram-join rows collapse to 14,281 surviving pairs of which
  * 13,590 are true hits — 95% verify precision — and wall drops
  * 26.1 s → 9.7 s vs the single-gram form (PERFNOTES r11). The
  * groupBy replaces the candidate `distinct()` the single-gram form
  * needed anyway, so the filter is free of extra exchanges.
  *
  * Every surviving candidate is VERIFIED with exact `levenshtein` —
  * both Spark and DuckDB implement the identical unit-cost Levenshtein,
  * so the whole operator is hash-exact cross-engine (`q_fuzzy_join`).
  * The verifier is the 3-arg bounded form (O(k·L) banded DP, −1 when
  * the band overflows) rather than the full O(L²) matrix.
  *
  * Scale: the gram join's cost is Σ df(g)² over shared grams — the
  * same bill as the exact Jaccard join's inverted index, borne on the
  * DISTINCT-string table (vocabulary-scale, not corpus-scale). No
  * frequency caps: this is the completeness-guaranteed tier; the
  * banded/LSH tiers are the approximate ones.
  */
object FuzzyJoin {

  /** Padded q-gram hashes of `s` with multiset occurrence indexes:
    * array&lt;struct&lt;g: long, occ: int&gt;&gt; where `occ` numbers
    * repeated grams 1..cnt in position order. Computed inside the row
    * (nested higher-order functions, O(L²) per string — strings here
    * are vocabulary entries, not documents) so the occurrence numbering
    * costs no window exchange.
    */
  private def occGrams(s: org.apache.spark.sql.Column, q: Int) = {
    val pad = "".toString * (q - 1)
    val arr = TextFunctions.charShingleHashes(
      concat(lit(pad), s, lit(pad)), q)
    transform(arr, (g, i) =>
      struct(g.as("g"),
        size(filter(slice(arr, lit(1), i + lit(1)), x => x === g)).as("occ")))
  }

  /** The shared candidate pipeline (ADVICE r11: written ONCE so the
    * benchmark's "verify set" number measures the exact pipeline the
    * operator runs): (gram-join pairs surviving the count bound,
    * short-string all-pairs bucket), both as (s_a, s_b) with the union
    * disjoint by construction.
    */
  private def candidates(df: DataFrame, strCol: String, maxDist: Int,
                         q: Int): (DataFrame, DataFrame) = {
    require(maxDist >= 1, "editDistancePairs: maxDist must be >= 1")
    require(q >= 2, "editDistancePairs: q must be >= 2")
    val s = df.select(col(strCol).as("s")).distinct()
      .withColumn("len", length(col("s")))
    val shortLen = q * maxDist // count bound can reach 0 at or below this
    val grams = s.select(col("s"), col("len"),
        explode(occGrams(col("s"), q)).as("go"))
      .select(col("s"), col("len"),
        col("go.g").as("g"), col("go.occ").as("occ"))
    val gramPairs = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist &&
          // short×short pairs belong to the all-pairs bucket below;
          // excluding them here makes the union disjoint (no distinct)
          greatest(col("a.len"), col("b.len")) > shortLen)
      .groupBy(col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.len").as("__la"), col("b.len").as("__lb"))
      .agg(count(lit(1)).as("__shared"))
      // Gravano count filter: ed ≤ k ⇒ multiset-shared ≥ max(len)+q−1−k·q
      .filter(col("__shared") >=
        greatest(col("__la"), col("__lb")) + lit(q - 1 - maxDist * q))
      .select(col("s_a"), col("s_b"))
    val shorts = s.filter(col("len") <= shortLen)
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
    (gramPairs, shortPairs)
  }

  /** (s_a, s_b, dist) for every distinct pair of `strCol` values with
    * levenshtein ≤ maxDist, s_a &lt; s_b.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
                        q: Int = 2): DataFrame = {
    val (gramPairs, shortPairs) = candidates(df, strCol, maxDist, q)
    gramPairs.unionByName(shortPairs)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // bounded form returns −1 above maxDist
  }

  /** Surviving-candidate count for [[editDistancePairs]]'s verify stage
    * — the COUNT filter's output size, measured by ScaleBench `fuzzy`
    * against the single-gram candidate bill (Σ df·(df−1)/2). Built on
    * the same [[candidates]] pipeline the operator runs.
    */
  def countFilterCandidates(df: DataFrame, strCol: String, maxDist: Int,
                            q: Int = 2): Long = {
    val (gramPairs, shortPairs) = candidates(df, strCol, maxDist, q)
    gramPairs.count() + shortPairs.count()
  }
}
