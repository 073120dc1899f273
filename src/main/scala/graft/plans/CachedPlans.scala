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
  * Staleness guard: the key also carries a SNAPSHOT FINGERPRINT — the
  * digest of the plan's input-file listing, each file tagged with its
  * length and modification time. Two reads of the same path canonicalize
  * to the same plan even when the files underneath were rewritten in
  * between; fingerprinting the listing makes the post-rewrite build MISS
  * the stale entry and rebuild from current data, while unchanged
  * re-reads still hit. Including length+mtime covers SAME-NAME in-place
  * rewrites too (Spark's own writers use fresh UUID part names, but the
  * streaming state sink's `bucket_<k>` swap keeps names stable). Non-file
  * sources (JDBC, in-memory) have an empty listing and fall back to pure
  * plan keying. Cost: one `listStatus` per distinct input directory per
  * key computation.
  *
  * Lifetime contract: entries live until [[clear]] (which unpersists
  * registry persists AND releases checkpoint blocks backing memoized
  * results) or session end. Entries are tiny (a plan reference + a
  * DataFrame); the cached BLOCKS are governed by Spark's MEMORY_AND_DISK
  * storage with LRU eviction.
  */
object CachedPlans {

  // per-key fill holder: the registry lock guards only the map insert;
  // the (possibly minutes-long) Spark action inside `thunk` runs under
  // the HOLDER's own monitor, so concurrent callers on DIFFERENT keys
  // (e.g. the per-table validate fan-out) proceed in parallel while
  // same-key callers still share one fill. An explicit state machine
  // rather than a `lazy val`: a lazy val whose initializer threw is not
  // memoized, so eviction code that forces it "to release it" would
  // RE-RUN the whole corpus-scale fill (over possibly already-rewritten
  // files) — [[settle]] is the release-side read that never fills.
  private final class Lazy[T <: AnyRef](thunk: () => T) {
    // 0 = never started, 1 = filling, 2 = completed. A FAILED fill
    // resets to 0 (retry semantics: a transient failure heals on the
    // next force instead of poisoning the entry forever).
    private[this] var state = 0
    private[this] var result: T = _
    def value: T = {
      synchronized {
        while (state == 1) wait()
        if (state == 2) return result
        state = 1
      }
      val r =
        try thunk()
        catch {
          case t: Throwable =>
            synchronized { state = 0; notifyAll() }
            throw t
        }
      synchronized { state = 2; result = r; notifyAll() }
      r
    }
    /** The built value if the fill completed — clear() must not trigger
      * a (re)build just to unpersist.
      */
    def peek: Option[T] = synchronized {
      if (state == 2) Some(result) else None
    }
    /** Wait out an in-flight fill (if any), then return the COMPLETED
      * result — None when the fill never started or failed, in which
      * case nothing is persisted and there is nothing to release.
      */
    def settle(): Option[T] = synchronized {
      while (state == 1) wait()
      if (state == 2) Some(result) else None
    }
  }

  /** MD5 of the sorted input-file listing PLUS each file's length and
    * modification time — the plan's data snapshot identity. Empty string
    * for non-file-backed plans.
    *
    * Name alone is not enough: an in-place rewrite that keeps file names
    * (the streaming state sink's `bucket_<k>` swap, any overwrite with
    * stable names) would leave a name-only digest unchanged and serve
    * stale results. Length+mtime comes from one `listStatus` per distinct
    * parent directory (not one RPC per file); a file deleted between
    * listing and stat simply digests as absent, which still changes the
    * key.
    */
  /** [[snapshot]] for external cache keys: callers that memoize
    * derived artifacts of a file-backed plan (e.g. QueryIndexes' on-disk
    * corpus indexes) fold this into THEIR keys so a regenerated source
    * re-keys the artifact instead of serving a stale one.
    */
  def dataFingerprint(df: DataFrame): String = snapshot(df)

  /** Input files read from the ANALYZED plan's file relations, unioned
    * with `Dataset.inputFiles`. The union matters: once ANY plan is
    * persisted, the CacheManager substitutes InMemoryRelations into
    * later same-shaped plans' EXECUTED form, and `Dataset.inputFiles`
    * (which reads the post-substitution plan) comes back EMPTY — the
    * snapshot would degrade to "" and the registry key to plan-only, at
    * which point a same-shaped plan over files changed by a NON-Spark
    * writer (the dedup indexes' staged FS-rename commits) silently hits
    * a stale entry (observed: a replayed index retire double-committing
    * its tombstones). The analyzed plan is resolved BEFORE cache
    * substitution, so its file listing survives shadowing.
    */
  private def inputFileList(df: DataFrame): Seq[String] = {
    val fromAnalyzed = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fsr: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => fsr.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
    (fromAnalyzed ++ df.inputFiles).distinct
  }

  private def snapshot(df: DataFrame): String = {
    val files = inputFileList(df)
    if (files.isEmpty) ""
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      // one listStatus per parent dir: (path -> (len, mtime)) for every
      // sibling, probed below per input file
      val stats = files.map(new org.apache.hadoop.fs.Path(_).getParent)
        .distinct.flatMap { dir =>
          try {
            dir.getFileSystem(conf).listStatus(dir).map(s =>
              s.getPath.toUri.getPath ->
                (s.getLen, s.getModificationTime))
          } catch { case _: java.io.IOException => Array.empty[
            (String, (Long, Long))] }
        }.toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      files.sorted.foreach { f =>
        md.update(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.update(0.toByte)
        val (len, mtime) = stats.getOrElse(
          new org.apache.hadoop.fs.Path(f).toUri.getPath, (-1L, -1L))
        md.update(s"$len:$mtime".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        md.update(0.toByte)
      }
      java.util.Base64.getEncoder.encodeToString(md.digest())
    }
  }

  // key includes the session: identical plans from different sessions
  // must not share a DataFrame (its execution is bound to its session).
  // ONE live snapshot per (session, plan): a snapshot miss REPLACES the
  // entry (the stale twin must go anyway — see [[cached]]), which keeps
  // the lookup O(1) instead of scanning every registered plan for
  // structural equality under the global lock.
  private val entries = mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, LogicalPlan),
    (String, Lazy[DataFrame])]

  /** Release a displaced holder whose fill is (or may be) still IN
    * FLIGHT — called from INSIDE the replacement holder's fill thunk
    * (outside the registry lock), so the ordering is airtight: any
    * caller forcing the replacement — the displacing caller or a
    * concurrent same-key one — first waits out the stale fill and
    * unpersists it, and only then runs the replacement's `persist()`.
    * Evicting without that wait would leave the stale blocks registered
    * in Spark's CacheManager, where the replacement's `persist()` would
    * plan-match them ("already cached") and silently adopt the
    * pre-rewrite data: the exact stale hit the snapshot key exists to
    * prevent. (A COMPLETED stale fill is instead released inside the
    * registry lock, before the replacement entry becomes visible.)
    * [[Lazy.settle]] never forces: a fill that never started or failed
    * has nothing persisted, so there is nothing to release — and
    * forcing it would re-run a corpus-scale job over stale files purely
    * for its own funeral. The wait is bounded by the in-flight fill; a
    * stale caller that starts its fill AFTER this check leaks one
    * persist until [[clear]], which only a pathological interleaving
    * (forcing a holder it was handed before the displacement) reaches.
    */
  private def releaseHolder(h: Lazy[DataFrame]): Unit =
    try h.settle().foreach(release)
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }

  /** Persist-and-eagerly-fill `df` once per (session, canonical plan,
    * input snapshot); later calls with a semantically identical plan
    * over the SAME files return the SAME cached DataFrame without
    * touching the CacheManager again.
    *
    * A snapshot MISS against an existing same-plan entry also EVICTS
    * that entry (unpersist + forget): Spark's CacheManager substitutes
    * cached data into any execution whose canonical plan matches —
    * file listing NOT consulted — so a stale twin left persisted would
    * serve its pre-rewrite blocks to the rebuilt frame's execution and
    * the rebuild would silently recompute nothing (bitten in practice
    * by the dedup indexes' FS-rename staged commits, which — unlike
    * Spark writers — never call recacheByPath).
    */
  def cached(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.canonicalized
    val snap = snapshot(df)
    val key = (df.sparkSession, plan)
    val holder = synchronized {
      entries.get(key) match {
        case Some((s, h)) if s == snap => h
        case prior =>
          // a COMPLETED stale twin unpersists here, inside the lock:
          // its CacheManager entry must be gone before any caller can
          // force the replacement's persist (which would plan-match
          // the stale blocks). An IN-FLIGHT twin is instead released
          // from inside the replacement's own fill thunk — waiting here
          // would hold the global lock for the length of its fill, and
          // releasing after the insert (outside the thunk) would let a
          // concurrent same-key caller force the replacement's persist
          // while the stale blocks are still registered.
          val pending = prior.map(_._2).filter { h =>
            h.peek match {
              case Some(d) => release(d); false
              case None => true
            }
          }
          val h = new Lazy[DataFrame](() => {
            pending.foreach(releaseHolder)
            df.persist()
            df.count() // eager: populate ONCE before branches fan out
            df
          })
          entries(key) = (snap, h)
          h
      }
    }
    holder.value
  }

  // iterative operators (connected components) materialize checkpoints,
  // so their OUTPUT plan is unique per run and [[cached]] can never
  // dedup them; memoizing on the INPUT plan + an operator tag shares one
  // run across queries deriving the same upstream. Same one-snapshot
  // shape as [[entries]] so a rewritten input evicts its stale memo
  // (checkpoint blocks included) instead of orphaning it until clear().
  private val memos = mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, LogicalPlan, String),
    (String, Lazy[DataFrame])]

  /** Memoize `build` once per (session, canonical plan of `key`, input
    * snapshot of `key`, `tag`). Same lifetime contract as [[cached]]:
    * entries live until [[clear]] or session end; a rewrite of the
    * underlying files changes the snapshot, EVICTS the stale build's
    * storage, and triggers a fresh build. The build runs outside the
    * registry lock (see [[Lazy]]).
    */
  def memo(tag: String, key: DataFrame)(build: => DataFrame): DataFrame = {
    val plan = key.queryExecution.analyzed.canonicalized
    val snap = snapshot(key)
    val mkey = (key.sparkSession, plan, tag)
    val holder = synchronized {
      memos.get(mkey) match {
        case Some((s, h)) if s == snap => h
        case prior =>
          // same completed-inside-the-lock / in-flight-inside-the-thunk
          // split as [[cached]]
          val pending = prior.map(_._2).filter { h =>
            h.peek match {
              case Some(d) => release(d); false
              case None => true
            }
          }
          val h = new Lazy[DataFrame](() =>
            { pending.foreach(releaseHolder); build })
          memos(mkey) = (snap, h)
          h
      }
    }
    holder.value
  }

  // driver-side VALUE memos (bounded collected artifacts — the indexed
  // probes' query-token In-lists), keyed like [[memo]]. Without this,
  // every EXECUTION of a probe that prunes a stored component to its
  // query vocabulary re-pays a driver collect (a whole Spark job of
  // fixed overhead): measured +22% on retrieval_hybrid_rrf_phrase and
  // +17% on retrieval_e2e in the r20 driver bench. Nothing is persisted
  // behind a value, so snapshot-miss eviction is plain replacement.
  private val valMemos = mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, LogicalPlan, String),
    (String, Lazy[AnyRef])]

  /** Memoize a driver-side value derived from a (file-backed) plan,
    * once per (session, canonical plan of `key`, input snapshot of
    * `key`, `tag`). Same staleness contract as [[memo]]: a rewrite of
    * the files under `key` changes the snapshot and rebuilds; same
    * concurrency contract: same-key callers share one in-flight build,
    * different keys build in parallel. Entries die with [[clear]] or
    * the session — never across processes.
    */
  def memoValue[T <: AnyRef](tag: String, key: DataFrame)
      (build: => T): T = {
    val plan = key.queryExecution.analyzed.canonicalized
    val snap = snapshot(key)
    val mkey = (key.sparkSession, plan, tag)
    val holder = synchronized {
      valMemos.get(mkey) match {
        case Some((s, h)) if s == snap => h
        case _ =>
          val h = new Lazy[AnyRef](() => build)
          valMemos(mkey) = (snap, h)
          h
      }
    }
    holder.value.asInstanceOf[T]
  }

  /** Release the storage behind a built result: the registry persist
    * (if any) and any checkpoint blocks its plan reads from —
    * `localCheckpoint` results are LogicalRDD leaves over persisted
    * RDDs that `DataFrame.unpersist` alone would never touch. Reliable
    * checkpoint files are left to the ContextCleaner (they survive
    * executor loss by design; deleting them under a live reference
    * would be worse than the leak).
    */
  private def release(df: DataFrame): Unit = {
    df.unpersist(false)
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Unpersist every registered intermediate (including checkpoint
    * blocks backing memoized iterative results) and forget it.
    */
  def clear(): Unit = synchronized {
    entries.values.foreach(_._2.peek.foreach(release))
    memos.values.foreach(_._2.peek.foreach(release))
    entries.clear()
    memos.clear()
    valMemos.clear()
  }
}
