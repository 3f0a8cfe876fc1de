package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership test against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (public Spark sketch
  * API — the same filter `DataFrame.stat.bloomFilter` builds).
  *
  * The filter rides serialized inside the expression (a few MB for
  * tens of millions of items); each task deserializes it once
  * (transient lazy) and the generated code calls straight into
  * `mightContainLong` — no UDF boxing, stays inside whole-stage
  * codegen. One-sided error: false positives possible, false
  * negatives impossible — callers use it as a map-side PRE-screen in
  * front of an exact join, which keeps results exact while the
  * shuffle only carries survivors.
  */
case class LongBloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = BooleanType

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from both interpreted eval and generated code. */
  def mightContain(v: Long): Boolean = bf.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[LongBloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.mightContain($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): LongBloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}

object BloomExpressions {

  /** Serialize a built filter for embedding in [[LongBloomMightContain]]. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mightContainLong(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(
      LongBloomMightContain(ExpressionUtils.expression(c), bloomBytes))
}
