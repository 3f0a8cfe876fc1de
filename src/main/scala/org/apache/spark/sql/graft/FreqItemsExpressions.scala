package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters summary over string keys.
  *
  * At most `capacity` counters; when a new key overflows the summary,
  * every counter is decremented (classic MG) and zeroed keys drop; on
  * merge, summaries sum and re-prune by the (capacity+1)-th largest
  * count. The decrement total is tracked, giving the standard
  * guarantee per surviving item:
  *   est <= true_count <= est + maxError,  maxError <= N/(capacity+1),
  * and every item with true_count > N/(capacity+1) is PRESENT.
  *
  * When `capacity` >= the number of distinct keys no decrement ever
  * fires and the summary is exact (maxError 0) — which is what lets
  * the driver hash-check `q_top_ngrams_sketch` against the exact
  * oracle at test scale while the same plan stays O(capacity) state
  * per partition at 100 TB (the exact form's hash-agg keys grow with
  * the vocabulary; this never holds more than `capacity` entries no
  * matter how many grams stream through).
  */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](capacity * 2)
  var maxError: Long = 0L

  def add(key: UTF8String, weight: Long): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) {
      counts.put(key, cur + weight)
    } else if (counts.size < capacity) {
      // clone: the incoming UTF8String may view reused row memory
      counts.put(key.clone(), weight)
    } else {
      // decrement-all by the arrival's weight, capped at the current min
      val m = math.min(weight, minCount())
      decrementAll(m)
      val rest = weight - m
      if (rest > 0) add(key, rest) // space freed or weight absorbed
      else maxError += m
    }
  }

  private def minCount(): Long = {
    var m = Long.MaxValue
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v < m) m = v }
    m
  }

  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  def mergeFrom(other: MGBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != 0L || counts.containsKey(e.getKey)) counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey.clone(), e.getValue)
    }
    maxError += other.maxError
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count; > capacity can't survive
      val arr = new Array[Long](counts.size)
      var i = 0
      val vs = counts.values().iterator()
      while (vs.hasNext) { arr(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(arr)
      val t = arr(arr.length - capacity - 1)
      decrementAll(t)
      maxError += t
    }
  }
}

/** See [[MGBuffer]]. Returns `array<struct<item string, est bigint,
  * ub bigint>>` sorted (est DESC, item ASC); `ub` = est + the summary's
  * total decrement (a certain upper bound on the true count).
  */
case class FreqItemsSketch(child: Expression, capacityExpr: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] with ImplicitCastInputTypes {

  private lazy val capacity: Int = {
    require(capacityExpr.foldable, "freq_items_sketch: capacity must be a literal")
    val v = capacityExpr.eval().asInstanceOf[Int]
    require(v > 0, s"freq_items_sketch: capacity must be positive, got $v")
    v
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)

  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren(0), capacityExpr = newChildren(1))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: MGBuffer, input: MGBuffer): MGBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val entries = new Array[(UTF8String, Long)](buffer.counts.size)
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    val out = new Array[Any](sorted.length)
    i = 0
    while (i < sorted.length) {
      val row = new GenericInternalRow(3)
      row.update(0, sorted(i)._1)
      row.setLong(1, sorted(i)._2)
      row.setLong(2, sorted(i)._2 + buffer.maxError)
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.maxError)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    buf.maxError = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "freq_items_sketch"
}

object FreqItemsExpressions {

  def freqItemsSketch(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      FreqItemsSketch(ExpressionUtils.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(capacity))
        .toAggregateExpression())
}
