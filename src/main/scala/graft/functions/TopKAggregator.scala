package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed Aggregator keeping the k best (score, id) pairs per group — the
  * UDAF surface of the engine (SURVEY.md §2.2 "UDF/UDAF": the reference
  * exposes none; the north-star similarity ops want one).
  *
  * Versus `row_number() over (order by score desc) <= k`: a window sorts
  * EVERY row of the group after a full shuffle; this aggregator keeps a
  * bounded k-element buffer, combines map-side (partial aggregation), and
  * ships at most k pairs per group per map task across the shuffle —
  * the difference between O(n log n) sort-shuffle and O(n log k) with
  * k-size network volume at 100 TB.
  *
  * Determinism: ties break on the smaller id, matching the window-rank
  * formulation `ORDER BY score DESC, id ASC`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  /** Insert keeping the list sorted best-first, truncated at k. */
  private def insert(buf: List[(Double, Long)], v: (Double, Long))
      : List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && better(buf.last, v)) buf
    else {
      val (front, back) = buf.span(better(_, v))
      (front ::: v :: back).take(k)
    }
  }

  override def reduce(buf: List[(Double, Long)], v: (Double, Long))
      : List[(Double, Long)] = insert(buf, v)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)])
      : List[(Double, Long)] = b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
