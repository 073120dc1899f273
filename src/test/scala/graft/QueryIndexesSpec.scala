package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the prewarm registry's coverage: every public fixture getter on
  * [[graft.queries.QueryIndexes]] must appear in `prewarmFixtures`. A
  * getter added to the query set but left off the registry would
  * silently revert to the serial in-rep-1 build the concurrent prewarm
  * exists to eliminate — no failure, just a build-polluted rep-1 bench
  * max (the exact regression r16 diagnosed). Reflection keeps the spec
  * maintenance-free: a fixture getter is any public method of shape
  * `(SparkSession, String) => DedupIndex.<SomeIndex>`.
  */
class QueryIndexesSpec extends AnyFunSuite {

  private def snake(s: String): String =
    s.replaceAll("([A-Z])", "_$1").toLowerCase

  test("prewarmFixtures covers every public fixture getter (reflection)") {
    val obj = graft.queries.QueryIndexes
    val registered = obj.prewarmFixtures.map(_._1)
    assert(registered.size === registered.distinct.size,
      "duplicate names in prewarmFixtures")
    val getters = obj.getClass.getDeclaredMethods.toSeq
      .filter { m =>
        // the registry's own lambdas compile to synthetic $anonfun$
        // methods with the same erased signature — real getters only
        !m.isSynthetic && !m.getName.contains("$") &&
        java.lang.reflect.Modifier.isPublic(m.getModifiers) &&
        m.getParameterTypes.toSeq == Seq(
          classOf[org.apache.spark.sql.SparkSession], classOf[String]) &&
        m.getReturnType.getName.startsWith("graft.operators.DedupIndex$")
      }
      .map(_.getName).distinct
    assert(getters.size >= 38,
      s"reflection found only ${getters.size} fixture getters — filter broke")
    val missing = getters.filterNot(g => registered.contains(snake(g)))
    assert(missing.isEmpty,
      s"fixture getters missing from prewarmFixtures (add them so the " +
        s"bench prewarm keeps covering them): ${missing.sorted}")
    // and the registry names all correspond to a real getter — a typo'd
    // entry would "cover" nothing
    val getterSnakes = getters.map(snake).toSet
    val orphans = registered.filterNot(getterSnakes.contains)
    assert(orphans.isEmpty,
      s"prewarmFixtures entries with no matching getter: $orphans")
  }
}
