package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for embedding dot products.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * evaluate their lambdas per element through the interpreted expression
  * path (no whole-stage codegen inside the lambda), which costs ~µs per
  * 64-dim pair — the dominant term in pairwise similarity scans. This
  * expression generates a tight Java loop instead (and participates in
  * whole-stage codegen), an order of magnitude faster per pair.
  *
  * Numeric contract (bit-compatibility with the portable fold used by
  * the oracle): elements are widened to double, multiplied, and
  * accumulated LEFT-TO-RIGHT starting from 0.0 — identical IEEE-754 op
  * sequence to `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)),
  * 0.0, +)`, so scores are bit-identical to the HOF form and to any
  * engine that folds sequentially. A null element poisons the result to
  * NULL, matching the fold's `acc + NULL` propagation.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must be array<float>: VectorFunctions.dot and the SQL
  // surface (GraftExtensions) insert explicit Casts. ExpectsInputTypes
  // is sql-private, so enforce via checkInputDataTypes instead — a raw
  // array<double> child would otherwise getFloat() halves of 8-byte
  // slots and return silently wrong scores.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        bad.map(_.catalogString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  // the result can be NULL even for non-null children (null element, or
  // mismatched vector lengths) — without this override, codegen would
  // emit an assignment to a FalseLiteral isNull slot (invalid Java)
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    // mismatched lengths → NULL, matching the HOF fold (zip_with pads
    // with null and the null product poisons the aggregate)
    if (arrA.numElements() != arrB.numElements()) return null
    val n = arrA.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      acc += arrA.getFloat(i).toDouble * arrB.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductF = copy(newLeft, newRight)
}
