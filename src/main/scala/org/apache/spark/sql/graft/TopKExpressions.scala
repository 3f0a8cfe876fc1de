package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) entries seen so far,
  * kept sorted best-first in parallel primitive arrays.
  *
  * Ordering matches a Spark window `ORDER BY score DESC, id ASC` exactly:
  *   - non-null scores before null scores (DESC default NULLS LAST),
  *   - scores compared with [[SQLOrderingUtil.compareDoubles]] (the SAME
  *     total order Spark's sort uses: NaN greatest, -0.0 == 0.0) — a
  *     plain `java.lang.Double.compare` would order -0.0 < 0.0 and flip
  *     the id tie-break,
  *   - ties break on id ascending.
  *
  * Inserts are a linear shift (k is small — 10..100 in every caller);
  * the common case on a saturated buffer is one compare against the
  * current cutoff and no shift.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val hasScore: Array[Boolean] = new Array[Boolean](k)
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** true iff (h1,s1,i1) ranks strictly before (h2,s2,i2). */
  private def before(h1: Boolean, s1: Double, i1: Long,
                     h2: Boolean, s2: Double, i2: Long): Boolean = {
    if (h1 != h2) return h1 // non-null first
    if (h1) {
      val c = SQLOrderingUtil.compareDoubles(s1, s2)
      if (c != 0) return c > 0 // higher score first
    }
    i1 < i2
  }

  def insert(h: Boolean, s: Double, id: Long): Unit = {
    if (n == k && !before(h, s, id, hasScore(k - 1), scores(k - 1), ids(k - 1))) return
    // find insertion point scanning from the tail
    var pos = math.min(n, k - 1)
    while (pos > 0 && before(h, s, id, hasScore(pos - 1), scores(pos - 1), ids(pos - 1))) pos -= 1
    // shift [pos, last) right by one
    var j = math.min(n, k - 1)
    while (j > pos) {
      hasScore(j) = hasScore(j - 1); scores(j) = scores(j - 1); ids(j) = ids(j - 1)
      j -= 1
    }
    hasScore(pos) = h; scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.hasScore(i), other.scores(i), other.ids(i)); i += 1 }
  }
}

/** Native partial top-k aggregate: per group, the k best (id, score)
  * pairs by (score DESC NULLS LAST, id ASC), returned sorted as
  * `array<struct<id: bigint, score: double>>`. Runs inside
  * ObjectHashAggregate with a partial-merge phase: each map task
  * reduces its slice to at most k entries per group before the
  * exchange.
  *
  * Role (see [[graft.ops.TopK]] for the measured comparison): Spark 4's
  * `InferWindowGroupLimit` gives the `row_number <= k` window form the
  * same O(groups x k)-per-task exchange, so the engine's hot paths keep
  * the codegen'd window; this aggregate is the A/B surface for that
  * claim and the building block for compositions that want a group's
  * top-k as a VALUE (one array per group) rather than as rows.
  *
  * Result equality with the window form is pinned in TopKAggSpec
  * (including null scores, +/-0.0 and id tie-breaks).
  */
case class TopKPairs(score: Expression, id: Expression, kExpr: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_pairs: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"topk_pairs: k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idV = id.eval(input)
    if (idV != null) { // a null id cannot appear in the window form's output either
      val sV = score.eval(input)
      if (sV == null) buffer.insert(h = false, 0.0, idV.asInstanceOf[Long])
      else buffer.insert(h = true, sV.asInstanceOf[Double], idV.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val out = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      val row = new GenericInternalRow(2)
      row.setLong(0, buffer.ids(i))
      if (buffer.hasScore(i)) row.setDouble(1, buffer.scores(i)) else row.setNullAt(1)
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 17 * buffer.n)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeBoolean(buffer.hasScore(i))
      out.writeDouble(buffer.scores(i))
      out.writeLong(buffer.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val buf = new TopKBuffer(kk)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.hasScore(i) = in.readBoolean()
      buf.scores(i) = in.readDouble()
      buf.ids(i) = in.readLong()
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "topk_pairs"
}

object TopKExpressions {

  /** Aggregate column: top-k (id, score) pairs by (score DESC NULLS
    * LAST, id ASC), as a sorted `array<struct<id, score>>`. Use under
    * `groupBy(queryCol).agg(...)` then `posexplode` for ranks.
    */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairs(ExpressionUtils.expression(score),
        ExpressionUtils.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
