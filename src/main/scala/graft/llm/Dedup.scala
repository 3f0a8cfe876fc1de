package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Corpus deduplication at training-data scale: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB contract):
  *   - Exact dedup is one hash-shuffle on the content digest (map-side
  *     partial aggregation applies; the digest — not the document text —
  *     is the shuffle key, so shuffled bytes are ~48B/doc + the kept id).
  *   - Near-dup NEVER goes all-pairs: MinHash signatures are per-document
  *     map-only work; LSH banding buckets candidates so the only shuffle is
  *     a groupBy on (band, bandHash), and pair generation happens within
  *     buckets. Expected bucket sizes are tiny under uniform hashing;
  *     pathological buckets (boilerplate) are capped by maxBucket.
  *   - Verification (exact Jaccard / cosine) runs only on candidate pairs.
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content digest: one row per distinct text
    * with the canonical (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Deduplicated corpus: keep one row (minimum id) per distinct text —
    * a semi-join of the corpus against its canonical ids, so document
    * payloads never shuffle with the digest.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactGroups(df, idCol, textCol).select(col("canonical_id").as(idCol)),
      Seq(idCol), "left_semi")

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Universal-hash parameters for seed i: h_i(x) = (a_i*x + b_i) mod p.
    * p = 2^31-1 (Mersenne prime); a,b fixed odd constants per seed so
    * signatures are deterministic and reproducible anywhere.
    */
  val lshPrime: Long = 2147483647L
  def seedA(i: Int): Long = 2L * i + 131L
  def seedB(i: Int): Long = 7L * i + 87L

  /** MinHash signature of a document: for each of `numHashes` seeds, the
    * minimum universal hash over its word-`shingleSize` shingles. Per-row
    * map-only expression work — no shuffle, no UDF.
    * Returns an array<long> of length numHashes (null-free; docs with no
    * shingles get p, an impossible hash, so they never collide by accident).
    */
  def minhashSignature(textCol: Column, numHashes: Int = 16,
                       shingleSize: Int = 3): Column = {
    val hashes = transform(wordShingles(textCol, shingleSize), s => hash64(s))
    transform(sequence(lit(0), lit(numHashes - 1)), i => {
      val a = element_at(array((0 until numHashes).map(j => lit(seedA(j))): _*), i + 1)
      val b = element_at(array((0 until numHashes).map(j => lit(seedB(j))): _*), i + 1)
      coalesce(
        array_min(transform(hashes,
          h => pmod(a * pmod(h, lit(lshPrime)) + b, lit(lshPrime)))),
        lit(lshPrime))
    })
  }

  /** LSH band keys: split the signature into `bands` bands of
    * signatureLength/bands rows each; each band's key is the md5 of its
    * joined values. Output: array<string> of length `bands`.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("_", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Candidate pairs from LSH banding: documents sharing any band key.
    * The only shuffle is the groupBy on (band index, band key); pairs are
    * generated within buckets and deduplicated. `maxBucket` caps
    * pathological buckets (identical boilerplate) — a capped bucket's
    * members are already exact-dup candidates by band collision.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 4,
                        shingleSize: Int = 3,
                        maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(col(textCol), numHashes, shingleSize)
    val banded = df
      .select(col(idCol).as("doc_a"),
        posexplode(lshBandKeys(sig, bands, rowsPerBand)).as(Seq("band", "band_key")))
    val buckets = banded
      .groupBy("band", "band_key")
      .agg(sort_array(collect_list("doc_a")).as("ids"))
      .filter(size(col("ids")) between (2, maxBucket))
    buckets
      .select(explode(candidatePairsFromBucket(col("ids"))).as("pair"))
      .select(col("pair.a").as("id_a"), col("pair.b").as("id_b"))
      .distinct()
  }

  /** All ordered pairs (a < b) from a bucket's sorted id list, as an
    * array<struct<a,b>> built with nested transforms + flatten (no
    * cartesian join).
    */
  private def candidatePairsFromBucket(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1), i =>
      transform(sequence(lit(0), i - 1), j =>
        struct(element_at(ids, j + 1).as("a"), element_at(ids, i + 1).as("b")))))

  // ------------------------------------------------------------------
  // Verification measures
  // ------------------------------------------------------------------

  /** Exact Jaccard similarity of the two docs' word-shingle sets. */
  def jaccard(textA: Column, textB: Column, shingleSize: Int = 3): Column = {
    val sa = array_distinct(wordShingles(textA, shingleSize))
    val sb = array_distinct(wordShingles(textB, shingleSize))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** SimHash (64-bit here 32 to stay engine-portable): sign-sum of token
    * hash bits. Two near-identical documents differ in few bits; dedup
    * buckets on bit-prefixes or compares hamming distance on candidates.
    */
  def simhash(textCol: Column, bits: Int = 32): Column = {
    val hs = transform(tokens(textCol), t => hash64(t))
    (0 until bits).map { j =>
      val bitSum = aggregate(hs, lit(0L),
        (s, h) => s + shiftright(h, j).bitwiseAND(1L) * 2 - 1)
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Cosine similarity of two float vectors, computed in double precision
    * with a left-to-right fold (deterministic summation order — the
    * property that makes results reproducible across engines).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` among rows of
    * `df` (id, embedding). Brute-force within — intended for candidate
    * sets or small partitions; the scale path buckets by
    * [[Similarity.ivfAssign]] first and runs this within cells.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
