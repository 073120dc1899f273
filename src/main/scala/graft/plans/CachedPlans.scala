package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import scala.collection.mutable

/** Session-scoped registry of persisted intermediates, keyed by the
  * CANONICALIZED analyzed plan — the same semantic dedup Spark's
  * CacheManager applies, surfaced so pipelines can share one persisted
  * branch instead of each calling `persist()` on an identical plan
  * (which logs "Asked to cache already cached data" and re-runs the
  * eager fill job per caller).
  *
  * The dedup/similarity pipelines derive the same shingle/edge tables in
  * several declared queries (minhash, components, decontaminate); routing
  * every branch-shared persist through [[cached]] means:
  *   - `persist()` + the eager fill `count()` run ONCE per distinct plan
  *     per session (the count is load-bearing: concurrent lazy branch
  *     materialization would race and recompute the upstream pipeline);
  *   - repeated query construction (benchmark reps, verify reruns) reuses
  *     the already-warm cache with zero extra jobs.
  *
  * Lifetime contract: entries live until [[clear]] (which unpersists) or
  * session end — the same "long-lived sessions call clearCache() between
  * corpora" contract the Dedup pipelines already document. Entries are
  * tiny (a plan reference + DataFrame), the cached BLOCKS are governed by
  * Spark's MEMORY_AND_DISK storage with LRU eviction.
  */
object CachedPlans {

  // per-key lazy holder: the registry lock guards only the map insert;
  // the (possibly minutes-long) Spark action inside `thunk` runs under
  // the HOLDER's lock, so concurrent callers on DIFFERENT keys (e.g. the
  // per-table validate fan-out) proceed in parallel while same-key
  // callers still share one fill
  private final class Lazy(thunk: () => DataFrame) {
    @volatile private var result: Option[DataFrame] = None
    lazy val value: DataFrame = { val r = thunk(); result = Some(r); r }
    /** The built value if the fill completed — clear() must not trigger
      * a (re)build just to unpersist.
      */
    def peek: Option[DataFrame] = result
  }

  // key includes the session: identical plans from different sessions
  // must not share a DataFrame (its execution is bound to its session)
  private val entries =
    mutable.Map.empty[(org.apache.spark.sql.SparkSession, LogicalPlan), Lazy]

  /** Persist-and-eagerly-fill `df` once per (session, canonical plan);
    * later calls with a semantically identical plan return the SAME
    * cached DataFrame without touching the CacheManager again.
    */
  def cached(df: DataFrame): DataFrame = {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    val holder = synchronized {
      entries.getOrElseUpdate(key, new Lazy(() => {
        df.persist()
        df.count() // eager: populate ONCE before branches fan out
        df
      }))
    }
    holder.value
  }

  // iterative operators (connected components) materialize checkpoints,
  // so their OUTPUT plan is unique per run and [[cached]] can never
  // dedup them; memoizing on the INPUT plan + an operator tag shares one
  // run across queries deriving the same upstream
  private val memos =
    mutable.Map.empty[(org.apache.spark.sql.SparkSession, LogicalPlan, String), Lazy]

  /** Memoize `build` once per (session, canonical plan of `key`, `tag`).
    * Same lifetime contract as [[cached]]: entries live until [[clear]]
    * or session end — callers re-running against CHANGED underlying data
    * in one session must clear first. The build runs outside the
    * registry lock (see [[Lazy]]).
    */
  def memo(tag: String, key: DataFrame)(build: => DataFrame): DataFrame = {
    val holder = synchronized {
      memos.getOrElseUpdate(
        (key.sparkSession, key.queryExecution.analyzed.canonicalized, tag),
        new Lazy(() => build))
    }
    holder.value
  }

  /** Unpersist every registered intermediate and forget it. */
  def clear(): Unit = synchronized {
    entries.values.foreach(_.peek.foreach(_.unpersist(false)))
    entries.clear()
    memos.clear()
  }
}
