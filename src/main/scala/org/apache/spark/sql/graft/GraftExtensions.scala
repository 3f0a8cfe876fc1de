package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductFloat].getCanonicalName,
        "dot_product_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product_f expects 2 arguments, got ${children.length}")
        DotProductFloat(children.head, children(1))
      }))
  }
}
