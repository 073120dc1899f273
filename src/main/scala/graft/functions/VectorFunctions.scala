package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`, `aggregate`) — no UDFs,
  * so whole-stage codegen stays intact around them.
  *
  * Numeric contract: every elementwise product is computed in DOUBLE and
  * accumulated left-to-right from 0.0. A strict sequential fold is
  * bit-reproducible in ANY engine (IEEE-754 double ops are deterministic),
  * which makes scores comparable across engines — important when an
  * external system (or the validation oracle) recomputes them.
  */
object VectorFunctions {

  /** Σ a_i * b_i over array<float>, double accumulation, left fold —
    * native codegen'd expression (see plans.DotProductF; bit-identical
    * to `dotFold`).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    // normalize to array<float> here (like the SQL surface does in
    // GraftExtensions): without the cast, an array<double> child would
    // read 4 bytes of 8-byte slots via getFloat — silently wrong scores.
    // DotProductF.checkInputDataTypes rejects anything the cast can't fix.
    ColumnBridge.column(graft.plans.DotProductF(
      ColumnBridge.expression(a.cast("array<float>")),
      ColumnBridge.expression(b.cast("array<float>"))))
  }

  /** The same fold via built-in higher-order functions (interpreted
    * lambda path) — kept as the portable reference form; tests assert
    * dot === dotFold bit-for-bit.
    */
  /** Codegen'd fused SQ8 asymmetric dot: `Σ q_i·(min_i + code_i·scale_i)`
    * — same IEEE sequence as the HOF fold, one tight loop per pair (see
    * [[graft.plans.Sq8DotF]]).
    */
  def sq8Dot(codes: Column, q: Column, mins: Seq[Double],
      scales: Seq[Double]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.plans.Sq8DotF(
      ColumnBridge.expression(codes.cast("array<int>")),
      ColumnBridge.expression(q.cast("array<float>")),
      ColumnBridge.expression(
        array(mins.map(lit(_)): _*).cast("array<double>")),
      ColumnBridge.expression(
        array(scales.map(lit(_)): _*).cast("array<double>"))))
  }

  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  /** `dotFold` as a native codegen'd expression over array<double>
    * operands (see plans.DotProductD) — bit-identical to the HOF fold:
    * both sides are cast to array<double> first (a no-op for doubles,
    * exact widening for floats — the same cast the fold's lambda
    * applies per element), then accumulated left-to-right from 0.0.
    * Use for per-PAIR scoring of double-array vectors (JL reductions,
    * PQ reconstructions), where the interpreted HOF lambda dominates.
    */
  def dotD(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.plans.DotProductD(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  }

  /** Σ a_i^2 (squared L2 norm). */
  def normSq(a: Column): Column = dot(a, a)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; NULL when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(normSq(a)) * sqrt(normSq(b)), lit(0.0))

  /** Cosine from a precomputed dot and squared norms (lets callers compute
    * norms once per row instead of once per pair — the O(n·k) savings that
    * matters in a top-k scan).
    */
  def cosineFrom(dotCol: Column, normSqA: Column, normSqB: Column): Column =
    dotCol / nullif(sqrt(normSqA) * sqrt(normSqB), lit(0.0))
}
