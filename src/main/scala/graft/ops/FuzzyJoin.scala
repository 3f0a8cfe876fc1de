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
  * The POSITIONAL count filter (Gravano et al.'s Q3 — the cut
  * PERFNOTES r11 named as next, landed r16): gram-join rows carry the
  * gram's POSITION in the padded string, the join demands
  * |pos_a − pos_b| ≤ k on top of gram equality (an edit shifts a
  * surviving gram by at most 1 position per operation, so true pairs
  * always meet inside the band), the join groups by pair, and only
  * pairs meeting the count bound reach the verifier. Completeness: a
  * pair within distance k has ≥ max(len)+q−1−k·q SURVIVING gram
  * copies, each a banded join row, so its row count meets the bound.
  * The band replaces the r11 occurrence-index equi-key — (g, occ)
  * equality composed with the band would be INCOMPLETE (an edit that
  * destroys the first copy of a repeated gram shifts every later
  * copy's occurrence index, so the surviving copy pairs under
  * occ-equality can sit outside the band); position-only is complete
  * and cuts where the cost actually lives — the JOIN VOLUME: same
  * grams at distant positions, the dominant hit source in natural
  * vocabulary, no longer join at all. On repeat-heavy grams the row
  * count can exceed the true matching (cnt_a×cnt_b banded pairs vs
  * min — it only loosens the filter, never drops a true pair; the
  * verifier owns precision). Measured (ScaleBench `fuzzy`, 20k
  * seeded-random vocab): gram-join output rows drop to 6.66M against
  * the 24.0M unbanded single-gram bill (3.6×), wall 9.7 s (r11 occ
  * form) → 8.6 s, the surviving verify set stays at the occ form's
  * level (14,313 vs 14,281; 13,590 true hits — the count bound was
  * already near-saturated at q=2, k=1), and the candidate stage no
  * longer pays the O(L²) per-row occurrence numbering. The groupBy
  * replaces the candidate `distinct()` the single-gram form needed
  * anyway, so the filter is free of extra exchanges.
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

  /** Padded q-gram hashes of `s` with their positions:
    * array&lt;struct&lt;g: long, pos: int&gt;&gt;, `pos` 1-based in the
    * padded string — one linear transform per row (the r11
    * occurrence-index form paid an O(L²) nested filter per string for
    * its multiset numbering; positions come free with the transform
    * index).
    */
  private def posGrams(s: org.apache.spark.sql.Column, q: Int) = {
    val pad = "".toString * (q - 1)
    val arr = TextFunctions.charShingleHashes(
      concat(lit(pad), s, lit(pad)), q)
    transform(arr, (g, i) =>
      struct(g.as("g"), (i + lit(1)).as("pos")))
  }

  /** Distinct strings with their lengths — the vocabulary-scale table
    * every stage below runs on.
    */
  private def distinctStrings(df: DataFrame, strCol: String): DataFrame =
    df.select(col(strCol).as("s")).distinct()
      .withColumn("len", length(col("s")))

  /** The pre-aggregation gram join — the positional band, length band,
    * ordering, and short-pair exclusion written ONCE (ADVICE r16:
    * [[gramJoinRows]] previously re-implemented this 4-clause predicate,
    * so a band tweak in [[candidates]] could silently diverge the
    * benchmark metric from the operator it claims to measure). Output:
    * one row per surviving banded gram co-occurrence,
    * (s_a, s_b, __la, __lb).
    */
  private def gramJoinRaw(s: DataFrame, maxDist: Int, q: Int): DataFrame = {
    val shortLen = q * maxDist // count bound can reach 0 at or below this
    val grams = s.select(col("s"), col("len"),
        explode(posGrams(col("s"), q)).as("go"))
      .select(col("s"), col("len"),
        col("go.g").as("g"), col("go.pos").as("pos"))
    grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") &&
          // positional band (Gravano Q3): a surviving gram shifts by at
          // most one position per edit, so true pairs meet inside ±k;
          // distant same-gram hits — the dominant false-candidate
          // source — no longer join at all
          abs(col("a.pos") - col("b.pos")) <= maxDist &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist &&
          // short×short pairs belong to the all-pairs bucket;
          // excluding them here makes the union disjoint (no distinct)
          greatest(col("a.len"), col("b.len")) > shortLen)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.len").as("__la"), col("b.len").as("__lb"))
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
    val s = distinctStrings(df, strCol)
    val shortLen = q * maxDist // count bound can reach 0 at or below this
    val gramPairs = gramJoinRaw(s, maxDist, q)
      .groupBy(col("s_a"), col("s_b"), col("__la"), col("__lb"))
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

  /** Gram-join OUTPUT rows (pre-aggregation) — the stage whose volume
    * the positional band cuts relative to the unbanded Σ df(g)² bill;
    * ScaleBench `fuzzy` reports it next to the single-gram bill and the
    * surviving verify set. Counts the SAME [[gramJoinRaw]] frame
    * [[candidates]] aggregates, so the metric can never diverge from
    * the operator.
    */
  def gramJoinRows(df: DataFrame, strCol: String, maxDist: Int,
                   q: Int = 2): Long =
    gramJoinRaw(distinctStrings(df, strCol), maxDist, q).count()
}
