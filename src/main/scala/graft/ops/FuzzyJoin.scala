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
  *    pair within distance k shares ≥ max(len)+q−1−k·q padded q-grams;
  *    whenever that bound is ≥ 1 the pair meets in the gram join
  *    (shared-gram hash + length-band filter |Δlen| ≤ k);
  *  - strings short enough that the bound can hit 0 (len ≤ q·k) go
  *    through a length-banded all-pairs bucket instead — a set bounded
  *    by the alphabet, not the corpus.
  * Every candidate is then VERIFIED with exact `levenshtein` — both
  * Spark and DuckDB implement the identical unit-cost Levenshtein, so
  * the whole operator is hash-exact cross-engine (`q_fuzzy_join`).
  *
  * Scale: the gram join's cost is Σ df(g)² over shared grams — the
  * same bill as the exact Jaccard join's inverted index, borne on the
  * DISTINCT-string table (vocabulary-scale, not corpus-scale). No
  * frequency caps: this is the completeness-guaranteed tier; the
  * banded/LSH tiers are the approximate ones.
  */
object FuzzyJoin {

  /** (s_a, s_b, dist) for every distinct pair of `strCol` values with
    * levenshtein ≤ maxDist, s_a &lt; s_b.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
                        q: Int = 2): DataFrame = {
    require(maxDist >= 1, "editDistancePairs: maxDist must be >= 1")
    require(q >= 2, "editDistancePairs: q must be >= 2")
    val pad = "\u0001".toString * (q - 1)
    val s = df.select(col(strCol).as("s")).distinct()
      .withColumn("len", length(col("s")))
    val grams = s.withColumn("g", explode(array_distinct(
      TextFunctions.charShingleHashes(
        concat(lit(pad), col("s"), lit(pad)), q))))
    val gramPairs = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
    val shorts = s.filter(col("len") <= q * maxDist)
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
    gramPairs.unionByName(shortPairs).distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }
}
