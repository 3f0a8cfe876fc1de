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

  /** Bottom-k-by-hash value sample
    * ([[org.apache.spark.sql.graft.QuantileKmvSketch]]): the rows whose
    * hashes are the k smallest, as parallel (hash ascending, value)
    * arrays. Exact regime: under k rows the sample IS the multiset.
    */
  final case class VSummary(k: Int, hashes: Array[Long], values: Array[Double]) {
    require(hashes.length == values.length,
      s"parallel arrays disagree: ${hashes.length} vs ${values.length}")
    require(hashes.length <= k, s"summary holds ${hashes.length} > k=$k values")
    def saturated: Boolean = hashes.length >= k
  }

  /** Quantile estimate from a value sample — the engine's pinned rank
    * rule: over the sample's values sorted ascending, the value at
    * 1-based rank max(1, ceil(p * n)). Exact order statistic when the
    * summary is unsaturated (the oracle-checkable regime); a uniform-
    * sample estimate with ~1/sqrt(k) rank error when saturated.
    */
  def quantile(s: VSummary, p: Double): Double = {
    require(p >= 0.0 && p <= 1.0, s"quantile p out of range: $p")
    require(s.values.nonEmpty, "quantile of an empty summary")
    val sorted = s.values.sorted
    val r = math.max(1L, math.ceil(p * sorted.length).toLong).toInt
    sorted(r - 1)
  }

  /** Union of value samples — bottom-k of the merged entries, pruned to
    * min(ka, kb); hash collisions keep the smaller value (the sketch's
    * own update rule), so folding per-snapshot summaries equals
    * sketching the unioned corpus EXACTLY (SketchSpec pins it).
    */
  def vunion(a: VSummary, b: VSummary): VSummary = {
    val k = math.min(a.k, b.k)
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    def addAll(s: VSummary): Unit = {
      var i = 0
      while (i < s.hashes.length) {
        val prev = m.get(s.hashes(i))
        if (prev == null || s.values(i) < prev.doubleValue())
          m.put(s.hashes(i), s.values(i))
        i += 1
      }
    }
    addAll(a); addAll(b)
    while (m.size() > k) m.pollLastEntry()
    val hs = new Array[Long](m.size())
    val vs = new Array[Double](m.size())
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); hs(i) = e.getKey; vs(i) = e.getValue; i += 1
    }
    VSummary(k, hs, vs)
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
