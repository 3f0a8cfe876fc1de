package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-set summary over NON-NEGATIVE long
  * hashes (the engine's 60-bit md5-derived hash domain): the k smallest
  * distinct hash values seen. Mergeable (union of summaries re-pruned
  * to k), O(k) state per group.
  *
  * What it adds over HyperLogLog (`approx_count_distinct`): the summary
  * is a uniform SAMPLE of the hash domain, so two groups' summaries
  * support SET operations — union size, intersection size, Jaccard —
  * which HLL registers cannot answer. This is the corpus-overlap
  * primitive ("how much of crawl B is already in crawl A's
  * vocabulary") at O(k) per corpus instead of a distinct-join.
  *
  * Exactness contract (the same one the MG sketch uses): while a
  * summary holds fewer than k values it IS the exact distinct set, so
  * estimators return exact counts — which is what lets the driver
  * hash-check `q_corpus_overlap` against an exact DuckDB join at test
  * scale while the identical plan degrades gracefully to bounded-error
  * estimates at 100 TB.
  */
final class KmvBuffer(val k: Int) {
  // bounded sorted set; boxing is fine — at most k live entries
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (set.size() < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** See [[KmvBuffer]]. Returns the summary as a sorted-ascending
  * `array<bigint>` (at most k values); pair it with
  * [[graft.llm.Kmv]]'s estimators.
  */
case class KmvSketch(child: Expression, kExpr: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "kmv_sketch: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"kmv_sketch: k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)

  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0, s"kmv_sketch: hash domain is non-negative longs, got $h")
      buffer.add(h)
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, input: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val out = new Array[Any](buffer.set.size())
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(12 + 8 * buffer.set.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.set.size())
    val it = buffer.set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_sketch"
}

/** Bottom-k-by-hash VALUE sample — the KMV idea applied to quantiles:
  * keep the (hash, value) pairs whose hashes are the k smallest seen.
  * Because the hash is uniform on the 60-bit domain and independent of
  * the value, the retained values are a uniform k-sample of the rows,
  * so sample quantiles estimate population quantiles with the usual
  * O(1/sqrt(k)) error — and the summary is MERGEABLE (bottom-k of a
  * union is the bottom-k of the merged bottom-ks, exactly), unlike
  * `percentile_approx`'s engine-private digest, so per-snapshot
  * summaries persist and fold across days ([[graft.llm.Kmv.vunion]]).
  *
  * Exactness contract (the [[KmvBuffer]] one): under k rows the sample
  * IS the row multiset, so quantiles are exact order statistics — the
  * driver-checkable regime. Hash collisions (two rows, one hash) keep
  * the SMALLER value, deterministically, on update and merge alike —
  * that is what makes fold(s1, s2) == sketch(union) an identity rather
  * than an approximation (SketchSpec pins it).
  */
final class VKmvBuffer(val k: Int) {
  // hash -> value, bounded at k entries with the largest hash evicted
  val map = new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  def add(h: Long, v: Double): Unit = {
    val prev = map.get(h)
    if (prev != null) {
      if (v < prev.doubleValue()) { map.put(h, v); () }
    } else if (map.size() < k) { map.put(h, v); () }
    else if (h < map.lastKey()) { map.put(h, v); map.pollLastEntry(); () }
  }

  def mergeFrom(other: VKmvBuffer): Unit = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
  }
}

/** See [[VKmvBuffer]]. Returns `array<struct<h: bigint, v: double>>`
  * sorted ascending by hash (at most k entries); pair it with
  * [[graft.llm.Kmv.quantile]] / [[graft.llm.Kmv.vunion]].
  */
case class QuantileKmvSketch(hashExpr: Expression, valueExpr: Expression,
                             kExpr: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VKmvBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "quantile_kmv: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v > 0, s"quantile_kmv: k must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, DoubleType, IntegerType)

  override def children: Seq[Expression] = Seq(hashExpr, valueExpr, kExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileKmvSketch =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1),
      kExpr = newChildren(2))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): VKmvBuffer = new VKmvBuffer(k)

  override def update(buffer: VKmvBuffer, input: InternalRow): VKmvBuffer = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null) {
      val hl = h.asInstanceOf[Long]
      require(hl >= 0, s"quantile_kmv: hash domain is non-negative longs, got $hl")
      buffer.add(hl, v.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: VKmvBuffer, input: VKmvBuffer): VKmvBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: VKmvBuffer): Any = {
    val out = new Array[Any](buffer.map.size())
    val it = buffer.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: VKmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(12 + 16 * buffer.map.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.map.size())
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      out.writeDouble(e.getValue.doubleValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VKmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VKmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.map.put(in.readLong(), in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileKmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): QuantileKmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "quantile_kmv"
}

object KmvExpressions {

  def kmvSketch(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketch(ExpressionUtils.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  def quantileKmv(hash: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(
      QuantileKmvSketch(ExpressionUtils.expression(hash),
        ExpressionUtils.expression(value),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
