package graft.llm

/** Driver-side estimators over [[org.apache.spark.sql.graft.KmvSketch]]
  * summaries (sorted-ascending k-min hash arrays from the engine's
  * non-negative 60-bit hash domain).
  *
  * Exact regime: a summary with fewer than k values IS its distinct
  * set, so every estimator below returns exact integers there (the
  * oracle-checkable regime). Saturated regime: standard KMV theory —
  * distinct ~ (k-1)/u_k with relative error ~1/sqrt(k-2); intersection
  * via the Jaccard of the combined k-min sample (Beyer et al. 2007,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations").
  */
object Kmv {

  /** Upper bound of the hash domain: [[TextFunctions.hash64]]-style
    * hashes are the first 15 hex digits of an md5 — uniform on
    * [0, 2^60).
    */
  val Domain: Double = math.pow(2.0, 60)

  final case class Summary(k: Int, hashes: Array[Long]) {
    require(hashes.length <= k, s"summary holds ${hashes.length} > k=$k values")
    def saturated: Boolean = hashes.length >= k
  }

  /** Estimated (exact when unsaturated) distinct count. */
  def distinct(s: Summary): Double =
    if (!s.saturated) s.hashes.length.toDouble
    else (s.k - 1).toDouble * Domain / s.hashes.last.toDouble

  /** Union summary: merged distinct hashes re-pruned to min(ka, kb). */
  def union(a: Summary, b: Summary): Summary = {
    val k = math.min(a.k, b.k)
    val merged = (a.hashes ++ b.hashes).distinct.sorted
    Summary(k, merged.take(k))
  }

  /** Estimated (exact when both unsaturated) intersection size:
    * exact set intersection in the exact regime; otherwise Jaccard of
    * the combined k-min sample scaled by the union estimate.
    */
  def intersection(a: Summary, b: Summary): Double = {
    val sa = a.hashes.toSet
    val sb = b.hashes.toSet
    if (!a.saturated && !b.saturated) (sa & sb).size.toDouble
    else {
      val u = union(a, b)
      val shared = u.hashes.count(h => sa.contains(h) && sb.contains(h))
      shared.toDouble / u.hashes.length * distinct(u)
    }
  }

  /** Estimated (exact when both unsaturated) Jaccard similarity. */
  def jaccard(a: Summary, b: Summary): Double = {
    val u = union(a, b)
    if (u.hashes.isEmpty) 0.0
    else if (!a.saturated && !b.saturated) {
      val inter = (a.hashes.toSet & b.hashes.toSet).size.toDouble
      inter / (a.hashes.length + b.hashes.length - inter)
    } else {
      val sa = a.hashes.toSet
      val sb = b.hashes.toSet
      u.hashes.count(h => sa.contains(h) && sb.contains(h)).toDouble / u.hashes.length
    }
  }
}
