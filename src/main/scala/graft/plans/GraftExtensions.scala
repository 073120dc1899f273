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
    ext.injectFunction((
      new FunctionIdentifier("sq8_dot_f"),
      new ExpressionInfo(classOf[Sq8DotF].getName, "sq8_dot_f"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "sq8_dot_f(codes, query, mins, scales) takes exactly 4 arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType,
          FloatType, IntegerType}
        Sq8DotF(
          Cast(children(0), ArrayType(IntegerType)),
          Cast(children(1), ArrayType(FloatType)),
          Cast(children(2), ArrayType(DoubleType)),
          Cast(children(3), ArrayType(DoubleType)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.length <= 2,
          "md5_long60(value[, prefix]) takes 1 or 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        import org.apache.spark.sql.types.StringType
        val prefix = children.lift(1).map {
          case Literal(p, StringType) if p != null => p.toString
          case other => throw new IllegalArgumentException(
            s"md5_long60 prefix must be a string literal, got $other")
        }.getOrElse("")
        Md5Long60(Cast(children.head, StringType), prefix)
      }))
  }
}
