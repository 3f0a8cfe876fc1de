package graft.llm

/** Shared brute-force oracle helpers for the exact-Jaccard specs
  * (JaccardJoinSpec, JaccardIncrementalSpec, SnapshotsSpec): ONE
  * definition of the template corpus generator, the word-trigram
  * shingler, and the unrounded Jaccard — so a future change to the
  * shingle convention cannot silently diverge the specs' ground
  * truths from each other.
  */
object JaccardFixture {

  /** Templated sentences with seeded word substitutions at varying
    * edit density, so pairwise Jaccard spans the whole (0, 1] range.
    */
  def corpus(seed: Int, n: Int, idBase: Long = 0L): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0L until n.toLong).map { i =>
      val base = Vector.tabulate(12)(j => vocab((j + i.toInt / 4) % vocab.size))
      val edits = rnd.nextInt(6)
      val words = (0 until edits).foldLeft(base) { (w, _) =>
        w.updated(rnd.nextInt(w.size), vocab(rnd.nextInt(vocab.size)))
      }
      (idBase + i, words.mkString(" "))
    }
  }

  /** Word trigrams — MUST mirror the library's shingle convention
    * (single-space split, 3-gram windows, distinct).
    */
  def shingles(s: String): Set[String] =
    s.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  /** Unrounded Jaccard, empty/empty scores 0 — the operator's decision
    * boundary (display values round at 1e-6 separately).
    */
  def jac(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size
}
