package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT dot_product_f(a,b)")`
  * and the DataFrame API share one implementation.
  *
  * Activate with:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  * or
  *   --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(ext: SparkSessionExtensions, name: String, arity: Int,
                       clazz: Class[_], build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity,
          s"$name expects $arity arguments, got ${children.length}")
        build(children)
      }))

  /** Evaluate a size/width argument that must be a constant: foldable and
    * a non-null integer. Raises a clear AnalysisException naming the
    * function instead of an opaque eval/ClassCast failure when a column
    * reference or null slips in.
    */
  private def constInt(fn: String, argName: String, e: Expression): Int = {
    if (!e.foldable)
      throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> fn, "paramName" -> argName, "paramType" -> "INT"))
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new AnalysisException(
          errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
          messageParameters = Map(
            "functionName" -> fn, "parameter" -> argName,
            "invalidValue" -> String.valueOf(other)))
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "dot_product_f", 2, classOf[DotProductFloat],
      cs => DotProductFloat(cs.head, cs(1)))
    register(ext, "md5_prefix64", 1, classOf[Md5Prefix64],
      cs => Md5Prefix64(cs.head))
    register(ext, "md5_suffix60", 1, classOf[Md5Suffix60],
      cs => Md5Suffix60(cs.head))
    // shingle size arrives as a SQL literal: shingle_hashes64(text, 3)
    register(ext, "shingle_hashes64", 2, classOf[ShingleHashes64],
      cs => ShingleHashes64(cs.head,
        constInt("shingle_hashes64", "n", cs(1))))
    register(ext, "token_stats64", 1, classOf[TokenStats64],
      cs => TokenStats64(cs.head))
    register(ext, "compression_ratio", 1, classOf[DeflateRatio],
      cs => DeflateRatio(cs.head))
    register(ext, "char_shingle_hashes64", 2, classOf[CharShingleHashes64],
      cs => CharShingleHashes64(cs.head,
        constInt("char_shingle_hashes64", "n", cs(1))))
    // xx64 fast mode (NOT engine-portable; see Md5Util.xx64)
    register(ext, "xx_shingle_hashes64", 2, classOf[ShingleHashes64],
      cs => ShingleHashes64(cs.head,
        constInt("xx_shingle_hashes64", "n", cs(1)), fast = true))
    register(ext, "xx_char_shingle_hashes64", 2, classOf[CharShingleHashes64],
      cs => CharShingleHashes64(cs.head,
        constInt("xx_char_shingle_hashes64", "n", cs(1)), fast = true))
    register(ext, "quantize8", 1, classOf[Quantize8],
      cs => Quantize8(cs.head))
    register(ext, "dot_product_i8", 2, classOf[DotProductInt8],
      cs => DotProductInt8(cs.head, cs(1)))
    register(ext, "cosine_argmax", 2, classOf[CosineArgmax],
      cs => CosineArgmax(cs.head, cs(1)))
    register(ext, "l2_argmin", 2, classOf[L2Argmin],
      cs => L2Argmin(cs.head, cs(1)))
    // nprobe arrives as a SQL literal: cosine_top_cells(vec, cents, 2)
    register(ext, "cosine_top_cells", 3, classOf[CosineTopCells],
      cs => CosineTopCells(cs.head, cs(1),
        constInt("cosine_top_cells", "n", cs(2))))
    // SQL input is arbitrary: array_compact drops null elements (the
    // kernel would read them as 0 and fake intersections with genuine
    // zeros) and array_distinct drops duplicates that would skew the
    // |a|+|b|-|inter| union identity; the internal Column path feeds
    // pre-distinct non-null shingle sets and skips both passes
    register(ext, "long_set_jaccard", 2, classOf[LongSetJaccard],
      cs => LongSetJaccard(
        org.apache.spark.sql.catalyst.expressions.ArrayDistinct(
          org.apache.spark.sql.catalyst.expressions.ArrayCompact(cs.head)),
        org.apache.spark.sql.catalyst.expressions.ArrayDistinct(
          org.apache.spark.sql.catalyst.expressions.ArrayCompact(cs(1)))))
    register(ext, "pq_adc_score", 2, classOf[PqAdcScore],
      cs => PqAdcScore(cs.head, cs(1)))
  }
}
