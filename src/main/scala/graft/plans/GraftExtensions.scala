package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions under SQL names, so `spark.sql("SELECT dot_product_f(a,b)")`
  * works next to the Column API. Install with:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "dot_product_f(arrayFloat, arrayFloat) takes exactly 2 arguments")
        // SQL array literals default to array<double>; the expression
        // reads float slots, so coerce explicitly (no-op for float input)
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, FloatType}
        val coerced = children.map(c => Cast(c, ArrayType(FloatType)))
        DotProductF(coerced.head, coerced(1))
      }))
  }
}
