package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV sketch result: how many distinct hashes the bounded sample holds
  * and the largest (= k-th smallest overall when saturated).
  */
final case class KmvSketch(n_sample: Int, kth_hash: Long)

/** Typed Aggregator building a KMV (k-minimum-values) distinct-count
  * sketch per group: the k smallest DISTINCT hash values, kept in a
  * bounded ascending buffer that combines map-side — per-group state is
  * k longs no matter how many rows a group has, so counting distinct
  * per slice never pays a distinct-expand shuffle (the reason sketches
  * exist at 100 TB).
  *
  * The estimate derives from [[KmvSketch]] as (k-1) · 2^60 / kth_hash
  * (hashes uniform in [0, 2^60) — `PortableHash.md5Long`), which is
  * pure integer state + one IEEE division: an external engine
  * reproduces it bit-for-bit, unlike HLL internals.
  */
class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, List[Long], KmvSketch] {
  require(k > 0, s"k must be > 0, got $k")

  override def zero: List[Long] = Nil

  /** Insert keeping the buffer sorted DESCENDING, distinct, capped at k:
    * the head is the current k-th-smallest, so the saturated-rejection
    * fast path — the common case once a big group fills the sketch — is
    * one head comparison, not a walk to the tail.
    */
  private def insert(buf: List[Long], v: Long): List[Long] = {
    if (buf.lengthCompare(k) >= 0 && v >= buf.head) buf
    else {
      val (front, back) = buf.span(_ > v)
      if (back.headOption.contains(v)) buf
      else {
        val merged = front ::: v :: back
        // over capacity by exactly one → evict the largest (the head)
        if (merged.lengthCompare(k) > 0) merged.tail else merged
      }
    }
  }

  override def reduce(buf: List[Long], v: Long): List[Long] = insert(buf, v)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Long]): KmvSketch =
    KmvSketch(buf.size, if (buf.isEmpty) 0L else buf.head)

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[KmvSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvSketch]()
}
