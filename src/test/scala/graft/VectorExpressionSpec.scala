package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import scala.util.Random

/** Pins the r20 codegen expressions to the interpreted HOF forms they
  * replaced — the same bit-identity contract HashExpressionSpec pins
  * for Md5Long60 and DiffEngineSpec for DotProductF. Any divergence
  * would silently break the hash-checked ANN/simhash oracles, so each
  * pin compares raw IEEE bits (or exact integers), not tolerances.
  */
class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20241220)
  private def fvec(n: Int): Array[Float] =
    Array.fill(n)((rnd.nextFloat() - 0.5f) * (1 << rnd.nextInt(8)))

  test("dotD is bit-identical to the double HOF fold") {
    val rows = Seq.fill(50)((fvec(16).map(_.toDouble), fvec(16).map(_.toDouble)))
      .toDF("a", "b")
    val r = rows.select(
      VectorFunctions.dotD($"a", $"b").as("fast"),
      VectorFunctions.dotFold($"a", $"b").as("fold")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
    // float operand: dotD's widening cast must equal the fold's
    // per-element cast
    val mixed = Seq.fill(20)((fvec(8), fvec(8).map(_.toDouble)))
      .toDF("a", "b")
      .select(VectorFunctions.dotD($"a", $"b").as("fast"),
        VectorFunctions.dotFold($"a", $"b").as("fold")).collect()
    mixed.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
    // mismatched lengths: both forms must agree on NULL
    val mism = Seq((Array(1.0, 2.0), Array(3.0)))
      .toDF("a", "b")
      .select(VectorFunctions.dotD($"a", $"b").as("fast"),
        VectorFunctions.dotFold($"a", $"b").as("fold"))
      .head()
    assert(mism.isNullAt(0) && mism.isNullAt(1))
  }

  test("binaryCode matches the HOF sign-pack fold") {
    def hofCode(vec: Column, dim: Int): Column = {
      val pows = array((0 until dim).map(i => lit(1L << i)): _*)
      aggregate(
        zip_with(vec, pows,
          (v, p) => when(v > lit(0f), p).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
    }
    // include exact zeros and sign flips — the > 0f boundary
    val vecs = (Seq.fill(40)(fvec(64)) :+
      Array.fill(64)(0f) :+ Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f))
      .map(Tuple1(_)).toDF("v")
    val r = vecs.select(
      graft.operators.Similarity.binaryCode($"v", 64).as("fast"),
      hofCode($"v", 64).as("fold")).collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
  }

  test("sq8Encode matches the HOF clamp form incl. out-of-range batches") {
    val dim = 16
    val mins = Seq.fill(dim)(rnd.nextDouble() - 0.5)
    val scales = Seq.tabulate(dim)(i =>
      if (i == 3) 0.0 else rnd.nextDouble() / 64.0) // one degenerate dim
    def hofEncode(vec: Column): Column = {
      val minA = array(mins.map(lit(_)): _*)
      val scaleA = array(scales.map(lit(_)): _*)
      val raw = transform(vec, (v, i) =>
        when(element_at(scaleA, i + 1) === 0.0, lit(0.0))
          .otherwise(floor(
            (v.cast(DoubleType) - element_at(minA, i + 1)) /
              element_at(scaleA, i + 1) + lit(0.5))))
      transform(raw, q => greatest(lit(0), least(lit(255), q.cast("int"))))
    }
    // saturating vectors (×100 the range) exercise both clamp edges —
    // the incremental encode-outside-training-range contract
    val vecs = (Seq.fill(40)(fvec(dim)) ++
      Seq.fill(10)(fvec(dim).map(_ * 100f)))
      .map(Tuple1(_)).toDF("v")
    val r = vecs.select(
      graft.operators.Similarity.sq8Encode($"v", mins, scales).as("fast"),
      hofEncode($"v").as("fold")).collect()
    r.foreach { row =>
      assert(row.getSeq[Int](0) === row.getSeq[Int](1))
    }
  }

  test("pqEncode matches the HOF argmin incl. duplicate-entry ties") {
    val m = 4; val ksub = 8; val dim = 16
    val subDim = dim / m
    val cbs0: Seq[Seq[Seq[Double]]] = Seq.tabulate(m)(_ =>
      Seq.fill(ksub)(Seq.fill(subDim)(rnd.nextDouble() - 0.5)))
    // duplicate entry j=2 == j=5 in subspace 0: the argmin must keep
    // the FIRST index (array_position first-match ≡ strict-< scan)
    val cbs = cbs0.updated(0, cbs0.head.updated(5, cbs0.head(2)))
    def hofEncode(vec: Column): Column = {
      val codes = cbs.zipWithIndex.map { case (cb, s) =>
        val sub = slice(vec, s * subDim + 1, subDim)
        val cbLit = array(cb.map(cj => array(cj.map(lit(_)): _*)): _*)
        val dists = transform(cbLit, cj =>
          aggregate(
            zip_with(sub, cj, (a, b) =>
              (a.cast(DoubleType) - b) * (a.cast(DoubleType) - b)),
            lit(0.0), (acc, x) => acc + x))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      array(codes: _*)
    }
    val vecs = Seq.fill(50)(fvec(dim)).map(Tuple1(_)).toDF("v")
    val r = vecs.select(
      graft.operators.Similarity.pqEncode($"v", cbs).as("fast"),
      hofEncode($"v").as("fold")).collect()
    r.foreach { row =>
      assert(row.getSeq[Int](0) === row.getSeq[Int](1))
    }
    // the duplicated entry j=5 can NEVER win (j=2 is identical and
    // earlier): any 5 in subspace 0 means the first-match tie-break
    // was lost
    val codes0 = vecs.select(
      graft.operators.Similarity.pqEncode($"v", cbs).as("c"))
      .collect().map(_.getSeq[Int](0).head)
    assert(!codes0.contains(5),
      "first-match tie-break lost: j=5 returned where j=2 is identical")
  }
}
