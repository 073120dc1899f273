package graft

import graft.functions.{KmvSketch, KmvSketchAggregator}

/** The bounded KMV buffer must behave identically however rows are
  * split across partial buffers (map-side combine correctness), dedup
  * repeated hashes, and report exact counts below saturation.
  */
class KmvSketchAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("sketch is partition-order invariant, distinct, and exact below k") {
    val agg = new KmvSketchAggregator(8)
    // below saturation: n_sample is the exact distinct count
    val small = Seq(5L, 3L, 5L, 9L, 3L).toDS().repartition(3)
      .groupByKey(_ => 0).agg(agg.toColumn.name("sk")).collect().head._2
    assert(small === KmvSketch(3, 9L))
    // saturated: kth_hash = 8th smallest distinct value regardless of
    // partitioning (merge correctness)
    val vals = (1L to 100L).map(v => v * 7L % 101L) // permutation of 1..100
    val expectedKth = vals.distinct.sorted.apply(7)
    Seq(1, 2, 7).foreach { parts =>
      val sk = vals.toDS().repartition(parts)
        .groupByKey(_ => 0).agg(agg.toColumn.name("sk")).collect().head._2
      assert(sk === KmvSketch(8, expectedKth), s"parts=$parts")
    }
  }
}
