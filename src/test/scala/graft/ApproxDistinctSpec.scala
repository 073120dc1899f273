package graft

import graft.queries.AdvancedQueries

/** The driver can only rows-check `q_approx_distinct` (HLL++ internals
  * have no cross-engine oracle), so the accuracy contract is pinned
  * HERE: every estimate in the result must sit within a generous
  * multiple of the configured rsd of the exact count carried beside it.
  * HLL++'s relative error is approximately normal with sd = rsd, so a
  * 5×rsd band is a ≫5-sigma bound — a failure means the sketch (or the
  * query wiring) broke, not bad luck.
  */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct estimates sit within 5×rsd of exact") {
    val bound = 5 * AdvancedQueries.ApproxDistinctRsd
    val rows = AdvancedQueries
      .qApproxDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def relErr(approx: String, exact: String): Double = {
        val a = r.getAs[Long](approx).toDouble
        val e = r.getAs[Long](exact).toDouble
        math.abs(a - e) / e
      }
      val parts = relErr("approx_parts", "exact_parts")
      val orders = relErr("approx_orders", "exact_orders")
      assert(parts <= bound, s"approx_parts off by $parts > $bound")
      assert(orders <= bound, s"approx_orders off by $orders > $bound")
    }
  }
}
