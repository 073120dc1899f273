package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed token-budget bins in a deterministic global order (the standard
  * "concat-and-chunk" packing used to build fixed-length training
  * examples; each bin holds ~`budget` tokens, with documents straddling
  * bin boundaries split by the downstream tokenizer at `bin_offset`).
  *
  * `bin_id = cum_tokens_before DIV budget` — a function of the global
  * EXCLUSIVE running token sum in `idCol` order. Computed scale-safely
  * with the same shape as `DiffEngine.chunkDigest`: range-partition on
  * the id, per-partition token totals collected in one light pre-job
  * (one row per partition), partition-local running sums lifted to
  * global ones with the collected offsets. No global window, no single
  * reducer — at 100 TB the only full-data motions are one range exchange
  * and one keyed window.
  */
object Packing {

  /** @return (idCol, tokenCol, cum_before, bin_id, bin_offset) — one row
    *         per input document.
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"packByTokenBudget: budget must be > 0, got $budget")
    val localIdxBits = 33 // monotonically_increasing_id: pid << 33 | local idx
    // PERSIST is load-bearing (same contract as chunkDigest): the totals
    // pre-job and the final projection are separate executions, and
    // RangePartitioner re-samples boundaries per execution — the cache
    // pins ONE layout for both.
    // null token counts fold as 0 in BOTH running-sum halves (the
    // per-partition totals and the window) — without the coalesce an
    // all-null partition makes sum() NULL and the driver-side getLong NPEs
    val sorted = graft.plans.CachedPlans.cached(
      docs.select(col(idCol),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as(tokenCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("_mid", monotonically_increasing_id()))
    val pidOf = shiftright(col("_mid"), localIdxBits)
    val totals = sorted.groupBy(pidOf.as("_pid"))
      .agg(sum(col(tokenCol)).as("_t"))
      .collect() // one row per shuffle partition — tiny
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*), pidOf)
    // keyed (per-pid) window — rows are already co-located and sorted, so
    // the window exchange moves only (id, tokens, mid)
    val w = Window.partitionBy(pidOf).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(col(tokenCol)).over(w), lit(0L)) + offsetExpr
    sorted
      .withColumn("cum_before", cumBefore)
      // integral DIV, not floating floor(a/b): cumulative token counts at
      // 100 TB exceed a double's 2^53 exact-integer range
      .withColumn("bin_id", expr(s"cum_before DIV ${budget}L"))
      .withColumn("bin_offset", col("cum_before") % budget)
      .select(col(idCol), col(tokenCol), col("cum_before"), col("bin_id"),
        col("bin_offset"))
  }

  /** Global 1-based rank of every row under `sortExprs` — which MUST be
    * a total order (include an id tiebreaker) — with the same scale
    * shape as [[packByTokenBudget]]: range-partition on the sort key,
    * a one-row-per-partition counts pre-job, partition-local
    * `row_number`s lifted to global ranks by the collected offsets. No
    * global window, no single reducer — the replacement for
    * `row_number() OVER (ORDER BY …)` wherever a corpus-wide rank
    * feeds a downstream decision (quantile bucketing, head/tail cuts).
    *
    * The cache on the sorted layout is load-bearing for the same reason
    * as in [[packByTokenBudget]]: RangePartitioner re-samples boundaries
    * per execution, and the counts pre-job and final projection must see
    * ONE layout.
    */
  def globalRank(df: DataFrame, rankCol: String,
      sortExprs: org.apache.spark.sql.Column*): DataFrame = {
    val localIdxBits = 33
    val sorted = graft.plans.CachedPlans.cached(
      df.repartitionByRange(sortExprs: _*)
        .sortWithinPartitions(sortExprs: _*)
        .withColumn("_mid", monotonically_increasing_id()))
    val pidOf = shiftright(col("_mid"), localIdxBits)
    val totals = sorted.groupBy(pidOf.as("_pid"))
      .agg(count(lit(1)).as("_t"))
      .collect() // one row per shuffle partition — tiny
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*), pidOf)
    // _mid is monotone within a partition over the sorted layout, so the
    // keyed window ranks in sortExprs order without re-sorting
    val w = Window.partitionBy(pidOf).orderBy(col("_mid"))
    sorted
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("_mid")
  }
}
