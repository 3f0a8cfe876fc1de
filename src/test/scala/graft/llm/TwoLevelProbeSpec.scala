package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Two-level IVF multi-probe (VERDICT r15 #5): the coarse × fine probe
  * must (a) degenerate to the single-probe two-level assignment at
  * coarseProbe = fineProbe = 1, (b) equal the FLAT multi-probe forms at
  * m = 1 (one coarse group owning every fine cell), (c) be monotone —
  * more probes never lose a candidate cell and never worsen a rank's
  * cosine — and (d) reach exact brute force over the assigned rows when
  * everything is probed. Fixture is SemDedupTableSpec's engineered-tie
  * corpus (same rays, twins, zero vector) so the (cos desc, cell/id
  * asc) tie rules are load-bearing, not accidental.
  */
class TwoLevelProbeSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def vec(i: Long): Array[Float] = {
    val m = (i % 6).toInt
    m match {
      case 0 => Array(1f, 0f, 0f, 0f)
      case 1 => Array(0f, 1f, 0f, 0f)
      case 2 => Array(1f, 1f, 0f, 0f)
      case 3 => Array(1f, 1f, 0.1f, 0f)
      case 4 => Array(0f, 0f, 1f, 0f)
      case 5 => Array(2f, 0f, 0f, 0f)
    }
  }

  private val corpus = {
    val base = (1L to 36L).map(i => (i, vec(i)))
    val twins = Seq(2L, 9L, 14L).map(i => (i + 100L, vec(i)))
    (base ++ twins :+ (999L, Array(0f, 0f, 0f, 0f)))
      .toDF("id", "v")
  }
  private val queries = corpus.filter(col("id") <= 6L || col("id") === 999L)

  private val k = 6
  private def centArrays: Array[Array[Float]] =
    (1L to k.toLong).map(vec).toArray
  private def centLit = array(centArrays.map(a =>
    array(a.toIndexedSeq.map(lit(_)): _*)).toIndexedSeq: _*)
  private def centTable = centArrays.zipWithIndex
    .map { case (a, i) => (i + 1, a) }.toSeq.toDF("cell", "cvec")

  private def cellSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Int]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getInt(1)).toSet }

  private def resultRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    .toSet

  test("coarseProbe = fineProbe = 1 reproduces the single-probe assignment") {
    val (coarseLit, fine) =
      Similarity.twoLevelCodebook(corpus, "id", "v", m = 2, nlist = 6)
    val probed = cellSets(Similarity.ivfProbeCellsTwoLevel(
      corpus, "id", "v", coarseLit, fine, coarseProbe = 1, fineProbe = 1))
    val assigned = Similarity.ivfAssignTwoLevel(corpus, "id", "v", coarseLit, fine)
      .collect().map(r => r.getLong(0) -> Set(r.getInt(1))).toMap
    assert(probed == assigned)
    // and the top-k search agrees with the single-probe search form
    assert(resultRows(Similarity.ivfTopKTwoLevelProbed(queries, corpus,
        "id", "v", coarseLit, fine, k = 3, coarseProbe = 1, fineProbe = 1))
      == resultRows(Similarity.ivfTopKTwoLevel(queries, corpus,
        "id", "v", coarseLit, fine, k = 3)))
  }

  test("m = 1: two-level probe == flat multi-probe (cells and top-k)") {
    val coarse1 = array(array(centArrays.head.toIndexedSeq.map(lit(_)): _*))
    val fine1 = centTable.withColumn("coarse", lit(1))
    for (nprobe <- Seq(1, 3)) {
      val twoLevel = cellSets(Similarity.ivfProbeCellsTwoLevel(
        corpus, "id", "v", coarse1, fine1, coarseProbe = 1, fineProbe = nprobe))
      val flat = cellSets(Similarity.ivfProbeCellsTable(
        corpus, "id", "v", centTable, nprobe))
      assert(twoLevel == flat, s"nprobe=$nprobe cell sets differ")
    }
    assert(resultRows(Similarity.ivfTopKTwoLevelProbed(queries, corpus,
        "id", "v", coarse1, fine1, k = 3, coarseProbe = 1, fineProbe = 3))
      == resultRows(Similarity.ivfTopKProbed(queries, corpus,
        "id", "v", centLit, k = 3, nprobe = 3)))
  }

  test("probing is monotone: more probes never lose a cell, never worsen " +
      "a rank's cosine") {
    val (coarseLit, fine) =
      Similarity.twoLevelCodebook(corpus, "id", "v", m = 2, nlist = 6)
    val small = cellSets(Similarity.ivfProbeCellsTwoLevel(
      corpus, "id", "v", coarseLit, fine, coarseProbe = 1, fineProbe = 1))
    val big = cellSets(Similarity.ivfProbeCellsTwoLevel(
      corpus, "id", "v", coarseLit, fine, coarseProbe = 2, fineProbe = 4))
    small.foreach { case (id, cells) =>
      assert(cells.subsetOf(big.getOrElse(id, Set.empty)),
        s"id $id lost probe cells when probing widened")
    }
    def rankCos(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Double] =
      df.collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val topSmall = rankCos(Similarity.ivfTopKTwoLevelProbed(queries, corpus,
      "id", "v", coarseLit, fine, k = 3, coarseProbe = 1, fineProbe = 1))
    val topBig = rankCos(Similarity.ivfTopKTwoLevelProbed(queries, corpus,
      "id", "v", coarseLit, fine, k = 3, coarseProbe = 2, fineProbe = 4))
    topSmall.foreach { case (key, cosSmall) =>
      assert(topBig.contains(key), s"$key vanished under wider probing")
      assert(topBig(key) >= cosSmall - 1e-12,
        s"$key cosine worsened under wider probing")
    }
  }

  test("probed two-level near-dup pairs: (1,1) == single-probe form, " +
      "m = 1 == flat table form, monotone in the probes") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (coarseLit, fine) =
      Similarity.twoLevelCodebook(corpus, "id", "v", m = 2, nlist = 6)
    val single = pairs(Dedup.embeddingNearDupsBucketedTwoLevel(
      corpus, "id", "v", 0.99, coarseLit, fine))
    val p11 = pairs(Dedup.embeddingNearDupsBucketedTwoLevelProbed(
      corpus, "id", "v", 0.99, coarseLit, fine, 1, 1))
    assert(p11 == single)
    val wide = pairs(Dedup.embeddingNearDupsBucketedTwoLevelProbed(
      corpus, "id", "v", 0.99, coarseLit, fine, 2, 4))
    assert(single.subsetOf(wide), "wider probing must never lose a pair")
    // m = 1: one coarse group owning all fine cells == flat table mode
    val coarse1 = array(array(centArrays.head.toIndexedSeq.map(lit(_)): _*))
    val fine1 = centTable.withColumn("coarse", lit(1))
    for (np <- Seq(1, 3)) {
      val twoLevel = pairs(Dedup.embeddingNearDupsBucketedTwoLevelProbed(
        corpus, "id", "v", 0.99, coarse1, fine1, 1, np))
      val flat = pairs(Dedup.embeddingNearDupsBucketedTable(
        corpus, "id", "v", 0.99, centTable, np))
      assert(twoLevel == flat, s"nprobe=$np pair sets differ")
      assert(flat.nonEmpty)
    }
  }

  test("probing everything (coarseProbe = m, fineProbe = nlist) is exact " +
      "brute force over the assigned rows") {
    val (coarseLit, fine) =
      Similarity.twoLevelCodebook(corpus, "id", "v", m = 2, nlist = 6)
    val assignedIds = Similarity
      .ivfAssignTwoLevel(corpus, "id", "v", coarseLit, fine)
      .select(col("id")).as[Long].collect().toSet
    assert(!assignedIds.contains(999L), "zero vector must be unassigned")
    val assigned = corpus.filter(col("id").isInCollection(assignedIds))
    val q = queries.filter(col("id").isInCollection(assignedIds))
    val full = resultRows(Similarity.ivfTopKTwoLevelProbed(q, assigned,
      "id", "v", coarseLit, fine, k = 3, coarseProbe = 2, fineProbe = 6))
    val brute = resultRows(Similarity.bruteForceTopK(q, assigned, "id", "v", 3))
    assert(full == brute && brute.nonEmpty)
  }
}
