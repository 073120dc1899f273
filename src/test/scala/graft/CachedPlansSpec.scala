package graft

import graft.plans.CachedPlans
import org.apache.spark.sql.functions._

/** The plan-keyed persist registry: semantically identical plans share
  * ONE cache entry (no duplicate persist, no duplicate fill job), and
  * `clear()` releases everything.
  */
class CachedPlansSpec extends SparkSpec {
  import spark.implicits._

  test("identical plans share one cached DataFrame; clear unpersists") {
    CachedPlans.clear()
    def build() = (1 to 100).toDF("n")
      .withColumn("sq", col("n") * col("n"))
      .filter(col("n") % 3 === 0)
    val a = CachedPlans.cached(build())
    val b = CachedPlans.cached(build())
    // the SAME DataFrame instance comes back — the second call never
    // touched persist() (which would log the duplicate-cache warning)
    assert(a eq b)
    assert(a.storageLevel.useMemory, "registry entry must be persisted")
    assert(a.count() === 33)
    // a semantically DIFFERENT plan gets its own entry
    val c = CachedPlans.cached(build().filter(col("n") > 50))
    assert(!(c eq a) && c.count() === 17)
    CachedPlans.clear()
    assert(!a.storageLevel.useMemory && !c.storageLevel.useMemory,
      "clear() must unpersist registered entries")
    // re-registering after clear works (fresh persist)
    val d = CachedPlans.cached(build())
    assert(d.storageLevel.useMemory && d.count() === 33)
    CachedPlans.clear()
  }
}
