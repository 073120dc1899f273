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

/** Native sign-bit binary code: bit i set iff `vec[i] > 0f`, packed
  * into one LONG — [[graft.operators.Similarity.binaryCode]]'s
  * semantics as one tight codegen loop instead of the interpreted
  * `aggregate(zip_with(vec, pows, ...))` per row. Exact integer
  * arithmetic (distinct powers of two cannot carry), so the packed
  * value is identical to the HOF fold's sum; a null element → NULL,
  * matching the fold's null poisoning. dim must be ≤ 64 (enforced by
  * the caller, as before).
  */
case class BinaryCodeF(vec: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    vec.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${t.catalogString}")
    }
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def prettyName: String = "binary_code_f"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      if (arr.getFloat(i) > 0f) acc |= (1L << i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  if ($v.getFloat($i) > 0f) $acc |= (1L << $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BinaryCodeF = copy(vec = newChild)
}

/** Native SQ8 encoder: per component,
  * `clamp(floor((double(v_i) − min_i) / scale_i + 0.5), 0, 255)` as an
  * int (0 where scale_i == 0) — [[graft.operators.Similarity.sq8Encode]]
  * as one codegen loop instead of two nested interpreted `transform`s
  * with per-element `element_at` on the range literals. The double
  * arithmetic and the cast-then-clamp order replicate the HOF form
  * exactly, so codes are bit-identical. A null element or a ranges/vec
  * length mismatch → NULL (the HOF form kept a null ELEMENT instead;
  * the corpus contract has none, and a NULL result is the conservative
  * poison).
  */
case class Sq8EncodeF(vec: Expression, mins: Expression,
    scales: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mins
  override def third: Expression = scales

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    (vec.dataType, mins.dataType, scales.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _),
        ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>, " +
          "array<double>), got " +
          Seq(vec, mins, scales).map(_.dataType.catalogString)
            .mkString(", "))
    }
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "sq8_encode_f"

  override protected def nullSafeEval(v: Any, m: Any, s: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val minA = m.asInstanceOf[ArrayData]
    val scaleA = s.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (minA.numElements() < n || scaleA.numElements() < n) return null
    val codes = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i) || minA.isNullAt(i) || scaleA.isNullAt(i))
        return null
      val sc = scaleA.getDouble(i)
      codes(i) =
        if (sc == 0.0) 0
        else {
          val q = math.floor(
            (arr.getFloat(i).toDouble - minA.getDouble(i)) / sc + 0.5)
          math.max(0, math.min(255, q.toInt))
        }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val unsafeArr =
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    nullSafeCodeGen(ctx, ev, (v, m, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val sc = ctx.freshName("sc")
      val q = ctx.freshName("q")
      val qi = ctx.freshName("qi")
      val done = ctx.freshName("done")
      s"""
         |int $n = $v.numElements();
         |boolean $done = false;
         |if ($m.numElements() < $n || $s.numElements() < $n) {
         |  ${ev.isNull} = true; $done = true;
         |}
         |int[] $codes = new int[$n];
         |for (int $i = 0; !$done && $i < $n; $i++) {
         |  if ($v.isNullAt($i) || $m.isNullAt($i) || $s.isNullAt($i)) {
         |    ${ev.isNull} = true; $done = true; break;
         |  }
         |  double $sc = $s.getDouble($i);
         |  if ($sc == 0.0) { $codes[$i] = 0; }
         |  else {
         |    double $q = java.lang.Math.floor(
         |      ((double) $v.getFloat($i) - $m.getDouble($i)) / $sc + 0.5);
         |    int $qi = (int) $q;
         |    $codes[$i] = java.lang.Math.max(0, java.lang.Math.min(255, $qi));
         |  }
         |}
         |${ev.value} = $done ? null : $unsafeArr.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8EncodeF =
    copy(vec = newFirst, mins = newSecond, scales = newThird)
}

/** Native PQ encoder: per subspace `s` of `m`, the 0-based index of the
  * codebook entry with the smallest squared L2 distance to the
  * sub-vector — [[graft.operators.Similarity.pqEncode]]'s semantics as
  * one tight codegen loop instead of `m·ksub·subDim` interpreted HOF
  * lambda evaluations per row (transform/aggregate/zip_with), which
  * dominated the PQ family's corpus-side encode.
  *
  * Numeric contract (bit-identical to the HOF form): per (s, j) the
  * distance is a LEFT fold from 0.0 of `(double(v_i) − c_i)²` over the
  * subspace's elements, and the winning code is the FIRST j attaining
  * the minimum (strict `<` scan ≡ `array_position(dists,
  * array_min(dists))` first-match over finite doubles). `cb` is the
  * flattened codebook literal (m·ksub·subDim doubles, entry (s, j)
  * element i at `(s·ksub + j)·subDim + i`). A null element, a vector
  * whose length isn't m·subDim, or a malformed codebook → NULL, like
  * the HOF form's null poisoning.
  */
case class PqEncodeF(vec: Expression, cb: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cb

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    (vec.dataType, cb.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _))
        if m > 0 && ksub > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>) and " +
          s"positive m/ksub, got ${vec.dataType.catalogString}, " +
          s"${cb.dataType.catalogString}, m=$m, ksub=$ksub")
    }
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode_f"

  override protected def nullSafeEval(v: Any, c: Any): Any = {
    val vecA = v.asInstanceOf[ArrayData]
    val cbA = c.asInstanceOf[ArrayData]
    val dim = vecA.numElements()
    if (dim % m != 0) return null
    val subDim = dim / m
    if (cbA.numElements() != m * ksub * subDim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val vi = s * subDim + i
          if (vecA.isNullAt(vi)) return null
          val ci = (s * ksub + j) * subDim + i
          if (cbA.isNullAt(ci)) return null
          val d = vecA.getFloat(vi).toDouble - cbA.getDouble(ci)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val arrayDataCls =
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val dim = ctx.freshName("dim")
      val subDim = ctx.freshName("subDim")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val vi = ctx.freshName("vi")
      val ci = ctx.freshName("ci")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestJ = ctx.freshName("bestJ")
      val bestD = ctx.freshName("bestD")
      val done = ctx.freshName("done")
      s"""
         |int $dim = $v.numElements();
         |boolean $done = false;
         |if ($dim % $m != 0) { ${ev.isNull} = true; $done = true; }
         |int $subDim = $dim / $m;
         |if (!$done && $c.numElements() != $m * $ksub * $subDim) {
         |  ${ev.isNull} = true; $done = true;
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; !$done && $s < $m; $s++) {
         |  int $bestJ = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; !$done && $j < $ksub; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      int $vi = $s * $subDim + $i;
         |      int $ci = ($s * $ksub + $j) * $subDim + $i;
         |      if ($v.isNullAt($vi) || $c.isNullAt($ci)) {
         |        ${ev.isNull} = true; $done = true; break;
         |      }
         |      double $d = (double) $v.getFloat($vi) - $c.getDouble($ci);
         |      $acc += $d * $d;
         |    }
         |    if (!$done && $acc < $bestD) { $bestD = $acc; $bestJ = $j; }
         |  }
         |  $codes[$s] = $bestJ;
         |}
         |${ev.value} = $done ? null : $arrayDataCls.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncodeF =
    copy(vec = newLeft, cb = newRight)
}

/** [[DotProductF]]'s array<double> sibling — the same tight codegen
  * loop over DOUBLE elements, for the scorers whose operands are double
  * arrays (JL-reduced vectors, PQ codebook reconstructions): there the
  * HOF fold (`aggregate(zip_with(...))`) runs interpreted PER CANDIDATE
  * PAIR, and a float-flavored cast through [[DotProductF]] would change
  * the IEEE values. Numeric contract: left-to-right accumulation from
  * 0.0 of `a_i * b_i` over doubles — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, +)` when elements are
  * already doubles, and to the fold over `cast(x as double)` when a
  * caller widens a float array first (float→double widening is exact).
  * Mismatched lengths or a null element → NULL, like the fold's null
  * poisoning.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.ArrayType
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        bad.map(_.catalogString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "dot_product_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    if (arrA.numElements() != arrB.numElements()) return null
    val n = arrA.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      acc += arrA.getDouble(i) * arrB.getDouble(i)
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
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductD = copy(newLeft, newRight)
}

/** Fused SQ8 asymmetric score: `Σ q_i · (min_i + code_i · scale_i)` —
  * full-precision query against the uint8-quantized corpus WITHOUT
  * materializing the reconstruction.
  *
  * Why: the HOF form (`aggregate(transform(codes, ...))`) evaluates its
  * lambda per element through the interpreted path, and in a pairwise
  * probe it runs per CANDIDATE PAIR — it was the dominant term of the
  * indexed SQ8 probe (~4 s vs the exact probe's 0.4 s at sf0.1). This
  * expression generates one tight loop inside whole-stage codegen.
  *
  * Numeric contract: identical IEEE-754 op sequence to the HOF form —
  * left-to-right accumulation from 0.0 of
  * `double(q_i) * (min_i + double(code_i) * scale_i)` — so scores stay
  * bit-identical to the fold the DuckDB oracles replay. Mismatched
  * lengths or a null element → NULL, like the fold's null poisoning.
  */
case class Sq8DotF(codes: Expression, query: Expression,
    mins: Expression, scales: Expression)
    extends org.apache.spark.sql.catalyst.expressions
      .QuaternaryExpression {

  override def first: Expression = codes
  override def second: Expression = query
  override def third: Expression = mins
  override def fourth: Expression = scales

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    def ok(e: Expression, elem: DataType) = e.dataType match {
      case ArrayType(t, _) => t == elem
      case _ => false
    }
    if (ok(codes, IntegerType) && ok(query, FloatType) &&
      ok(mins, DoubleType) && ok(scales, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<float>, array<double>, " +
        "array<double>), got " +
        Seq(codes, query, mins, scales).map(_.dataType.catalogString)
          .mkString(", "))
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "sq8_dot_f"

  override def nullSafeEval(c: Any, q: Any, m: Any, s: Any): Any = {
    val codesA = c.asInstanceOf[ArrayData]
    val qA = q.asInstanceOf[ArrayData]
    val minA = m.asInstanceOf[ArrayData]
    val scaleA = s.asInstanceOf[ArrayData]
    val n = codesA.numElements()
    if (qA.numElements() != n || minA.numElements() < n ||
      scaleA.numElements() < n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (codesA.isNullAt(i) || qA.isNullAt(i) || minA.isNullAt(i) ||
        scaleA.isNullAt(i)) return null
      acc += qA.getFloat(i).toDouble *
        (minA.getDouble(i) + codesA.getInt(i).toDouble * scaleA.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, (c, q, m, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |int $n = $c.numElements();
         |if ($q.numElements() != $n || $m.numElements() < $n ||
         |    $s.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i) || $q.isNullAt($i) || $m.isNullAt($i) ||
         |        $s.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $q.getFloat($i) *
         |      ($m.getDouble($i) + (double) $c.getInt($i) * $s.getDouble($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Sq8DotF =
    copy(newFirst, newSecond, newThird, newFourth)
}
