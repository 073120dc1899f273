package graft

import graft.queries.AdvancedQueries

/** HLL++ internals have no cross-engine oracle, so the accuracy contract
  * is enforced twice: the declared `q_approx_distinct` folds each
  * estimate into a `within_eps` boolean that the DuckDB oracle asserts
  * is true (a drifted sketch becomes a hash MISMATCH), and this spec
  * checks the raw estimates via the detail form. eps = 5×rsd: HLL++'s
  * relative error is approximately normal with sd = rsd, so the band is
  * a ≫5-sigma bound — a failure means the sketch (or the query wiring)
  * broke, not bad luck.
  */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct estimates sit within 5×rsd of exact") {
    val bound = AdvancedQueries.ApproxDistinctEps
    val rows = AdvancedQueries
      .qApproxDistinctDetail(spark, "/root/testdata/sf0.001")
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

  test("gated q_approx_distinct reports every estimate within eps") {
    val rows = AdvancedQueries
      .qApproxDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_eps"),
        s"parts out of bounds for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Boolean]("orders_within_eps"),
        s"orders out of bounds for ${r.getAs[String]("l_returnflag")}")
    }
  }
}
