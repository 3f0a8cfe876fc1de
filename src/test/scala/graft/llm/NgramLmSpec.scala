package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Interpolated Kneser-Ney trigram LM: the scorer's backoff cascade is a
  * true probability distribution (sums to 1 over the model vocabulary
  * from ANY context — seen, partially-seen, or unseen), scores match a
  * from-scratch brute-force reimplementation bit-for-bit (same IEEE
  * expression trees, same round9/decimal/round6 discipline as the
  * DuckDB oracle), and OOV/null-text edges are counted, not dropped.
  */
class NgramLmSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val D = NgramLm.Discount

  private val trainTexts = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog ate",
    "a cat and a dog",
    "")
  private val heldOut = Seq(
    "the fish sat on the log", // seen words, mostly unseen trigrams
    "a zebra ate the cat",     // zebra is OOV
    "cat cat cat",             // repeated seen word, unseen contexts
    "")                        // empty: single (<s>,<s>,</s>) term

  private def trainDf = trainTexts.zipWithIndex
    .map { case (t, i) => (i.toLong * 2, t) }.toDF("doc_id", "text")
  private def scoreDf = (trainTexts.zipWithIndex
    .map { case (t, i) => (i.toLong * 2, t) } ++
    heldOut.zipWithIndex.map { case (t, i) => (i.toLong * 2 + 1, t) })
    .toDF("doc_id", "text")

  // ---- brute-force reference (plain Scala maps, same formulas) ----

  private def pad(t: String): Seq[String] =
    Seq(NgramLm.Bos, NgramLm.Bos) ++
      t.split("\\s+").toSeq.filter(_.nonEmpty) :+ NgramLm.Eos

  private case class Brute(texts: Seq[String]) {
    val c3: Map[(String, String, String), Long] =
      texts.flatMap(t => pad(t).sliding(3).map(s => (s(0), s(1), s(2))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx3: Map[(String, String), (Long, Long)] =
      c3.toSeq.groupBy { case ((u, v, _), _) => (u, v) }
        .view.mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val mid: Map[(String, String), Long] =
      c3.keys.toSeq.groupBy { case (_, v, w) => (v, w) }
        .view.mapValues(_.size.toLong).toMap
    val ctx2: Map[String, (Long, Long)] =
      mid.toSeq.groupBy { case ((v, _), _) => v }
        .view.mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val uniC: Map[String, Long] =
      mid.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total: Long = mid.size.toLong

    def p1(w: String): Option[Double] =
      uniC.get(w).map(_.toDouble / total.toDouble)
    def p2Seen(v: String, w: String): Option[Double] =
      mid.get((v, w)).map { n =>
        val (all, dot) = ctx2(v)
        math.max(n.toDouble - D, 0.0) / all.toDouble +
          ((D * dot.toDouble) / all.toDouble) * p1(w).get
      }
    // the scorer's coalesce(p2, bow2*p1, p1)
    def p2Cascade(v: String, w: String): Option[Double] =
      p2Seen(v, w).orElse(ctx2.get(v) match {
        case Some((all, dot)) =>
          p1(w).map(((D * dot.toDouble) / all.toDouble) * _)
        case None => p1(w)
      })
    def p(u: String, v: String, w: String): Option[Double] =
      c3.get((u, v, w)) match {
        case Some(c) =>
          val (cuv, n1p) = ctx3((u, v))
          Some(math.max(c.toDouble - D, 0.0) / cuv.toDouble +
            ((D * n1p.toDouble) / cuv.toDouble) * p2Seen(v, w).get)
        case None => ctx3.get((u, v)) match {
          case Some((cuv, n1p)) =>
            p2Cascade(v, w).map(((D * n1p.toDouble) / cuv.toDouble) * _)
          case None => p2Cascade(v, w)
        }
      }

    def nll(text: String): (Long, Long, Option[Double]) = {
      val ps = pad(text).sliding(3).map(s => p(s(0), s(1), s(2))).toSeq
      val known = ps.flatten
      val nOov = ps.size.toLong - known.size.toLong
      val score =
        if (known.isEmpty) None
        else {
          val dec = known
            .map(x => math.floor(math.log(x) * 1e9 + 0.5) / 1e9)
            .map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
            .sum
          Some(math.floor(
            -(dec.toDouble / known.size.toDouble) * 1e6 + 0.5) / 1e6)
        }
      (ps.size.toLong, nOov, score)
    }
  }

  test("backoff cascade sums to 1 over the vocabulary from any context") {
    val m = NgramLm.train(trainDf, "doc_id", "text")
    val vocab = m.uni.select("w").as[String].collect().toSeq
    // seen trigram context / unseen pair of seen words / unseen u with
    // seen v / unseen v entirely
    val contexts = Seq(("the", "cat"), ("mat", "dog"), ("zzz", "cat"),
      ("the", "zzz"), ("zzz", "qqq"))
    val probe = contexts.flatMap { case (u, v) => vocab.map((u, v, _)) }
      .toDF("u", "v", "w")
    val sums = probe
      .join(m.tri.select("u", "v", "w", "p3"), Seq("u", "v", "w"), "left")
      .join(m.ctx3.select("u", "v", "bow3"), Seq("u", "v"), "left")
      .join(m.bi.select("v", "w", "p2"), Seq("v", "w"), "left")
      .join(m.ctx2.select("v", "bow2"), Seq("v"), "left")
      .join(m.uni.select("w", "p1"), Seq("w"), "left")
      .withColumn("p", NgramLm.backoffP)
      .groupBy("u", "v").agg(sum("p").as("s"))
      .as[(String, String, Double)].collect()
    assert(sums.length == contexts.size)
    sums.foreach { case (u, v, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"sum over vocab from ($u,$v) = $s")
    }
  }

  test("model table and scores match the brute-force reference exactly") {
    val brute = Brute(trainTexts)
    val m = NgramLm.train(trainDf, "doc_id", "text")
    val tri = NgramLm.modelTable(m)
      .as[(String, String, String, Long, Double)].collect()
    assert(tri.length == brute.c3.size)
    tri.foreach { case (u, v, w, c, p) =>
      assert(c == brute.c3((u, v, w)))
      val expect = math.floor(brute.p(u, v, w).get * 1e6 + 0.5) / 1e6
      assert(p == expect, s"p($w|$u,$v): $p != $expect")
    }
    val scored = NgramLm.score(scoreDf, "doc_id", "text", m)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val all = trainTexts.zipWithIndex.map { case (t, i) => (i * 2L, t) } ++
      heldOut.zipWithIndex.map { case (t, i) => (i * 2L + 1, t) }
    assert(scored.size == all.size)
    all.foreach { case (id, t) =>
      val (n, oov, s) = brute.nll(t)
      assert(scored(id) == ((n, oov, s)), s"doc $id: ${scored(id)} != ${(n, oov, s)}")
    }
  }

  test("incremental count merge == retrain on the union") {
    val a = trainTexts.take(3).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val b = trainTexts.drop(3).zipWithIndex
      .map { case (t, i) => (i.toLong + 100, t) }.toDF("doc_id", "text")
    val merged = NgramLm.trainFromCounts(NgramLm.mergeCounts(
      NgramLm.trigramCounts(a, "doc_id", "text"),
      NgramLm.trigramCounts(b, "doc_id", "text")))
    val retrained = NgramLm.train(a.unionByName(b), "doc_id", "text")
    val mt = NgramLm.modelTable(merged)
      .as[(String, String, String, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    val rt = NgramLm.modelTable(retrained)
      .as[(String, String, String, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(mt.toSeq == rt.toSeq)
  }

  test("OOV terms are counted and empty/null text scores as one term") {
    val m = NgramLm.train(trainDf, "doc_id", "text")
    val odd = Seq((1L, "a zebra ate the cat"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NgramLm.score(odd, "doc_id", "text", m)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // "a zebra ate the cat" -> 6 terms; zebra is OOV as w in exactly one
    val (n1, oov1, s1) = out(1L)
    assert(n1 == 6 && oov1 == 1 && s1.isDefined)
    // null text = empty sentence = single (<s>,<s>,</s>) term, in-vocab
    val (n3, oov3, s3) = out(3L)
    assert(n3 == 1 && oov3 == 0 && s3.isDefined)
  }
}
