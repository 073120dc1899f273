package graft.operators

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bounded-memory probabilistic sketches over unbounded corpora —
  * count-min frequency estimation and Bloom membership — in the
  * portable-hash flavor (md5-derived positions, so a DuckDB oracle
  * replays every counter and bit exactly; see
  * [[graft.functions.PortableHash]]).
  *
  * Both sketches share the scale property the exact forms lack: their
  * state is a FIXED-SIZE table (depth×width counters / m bits) no matter
  * how large the input grows, built with one map-side-combined groupBy —
  * the mergeable-summary pattern (Cormode & Muthukrishnan 2005 for CMS;
  * Bloom 1970). Spark ships native `bloom_filter_agg` /
  * `approx_count_distinct` sketches, but their binary internals have no
  * cross-engine oracle — these relational forms trade a constant factor
  * for bit-exact gateability, same deal as `q_kmv_distinct`.
  */
object Sketches {

  /** Hash-row position: portable 60-bit hash of `v` under seed `r`,
    * reduced mod `width` (non-negative, so `%` is safe in any engine).
    * DuckDB replica:
    * `('0x' || substr(md5(concat_ws('|', r, v)), 1, 15))::BIGINT % width`.
    */
  private def pos(r: Int, v: Column, width: Int): Column =
    PortableHash.seededLong(r, v) % width

  /** Count-min sketch counters for a value column, WITH multiplicity:
    * one `(r, c, cnt)` row per non-empty cell. The result is bounded at
    * depth×width rows regardless of input size, and the groupBy
    * partial-aggregates map-side — each partition ships at most
    * depth×width rows into the shuffle. Counters are mergeable across
    * corpora (cell-wise sum), the property that lets a 100 TB corpus
    * build per-shard sketches and fold them.
    */
  def cmsCounters(vals: DataFrame, valCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad CMS shape ($depth × $width)")
    vals.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), pos(r, col(valCol), width).as("c"))): _*))
        .as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from CMS counters for a candidate set: for each
    * candidate, `min` over the depth rows of its cell counter (0 when
    * the cell is empty — possible only for candidates absent from the
    * sketched input). Always an OVERestimate of the true count, never
    * an under — the CMS guarantee the spec pins.
    *
    * `counters` is bounded (depth×width), so the join broadcasts; the
    * only input-sized work is one explode and the final per-candidate
    * min, both map-side-friendly.
    */
  def cmsEstimates(candidates: DataFrame, valCol: String,
      counters: DataFrame, depth: Int, width: Int): DataFrame = {
    val probe = candidates.select(col(valCol),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), pos(r, col(valCol), width).as("c"))): _*))
          .as("rc"))
      .select(col(valCol), col("rc.r").as("r"), col("rc.c").as("c"))
    probe.join(broadcast(counters), Seq("r", "c"), "left")
      .groupBy(col(valCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters over word n-grams via CMS: n-gram occurrences (with
    * multiplicity — frequency, not document frequency) feed a
    * depth×width counter table; every distinct n-gram is then estimated
    * from the sketch and the top `topK` by `(est desc, ngram)` returned
    * alongside the true count, exposing the one-sided CMS error.
    *
    * The declared query estimates EVERY distinct gram so the whole
    * sketch surface is oracle-gated; at 100 TB the candidate set would
    * instead come from per-shard local heavy hitters (bounded, merged),
    * with the sketch — whose build cost and size are corpus-bounded —
    * providing the global counts. Output:
    * (ngram, est, exact_cnt).
    */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, n: Int,
      depth: Int, width: Int, topK: Int): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    // all occurrences, NOT array_distinct — counting frequency
    val grams = docs.select(explode(
        when(size(toks) < n, array(concat_ws(" ", toks)))
          .otherwise(transform(sequence(lit(0), size(toks) - lit(n)),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("g"))
    val cached = graft.plans.CachedPlans.cached(grams)
    val counters = cmsCounters(cached, "g", depth, width)
    val exact = cached.groupBy(col("g")).agg(count(lit(1)).as("exact_cnt"))
    cmsEstimates(exact.select("g"), "g", counters, depth, width)
      .join(exact, Seq("g"))
      .select(col("g").as("ngram"), col("est"), col("exact_cnt"))
      .orderBy(col("est").desc, col("ngram"))
      .limit(topK)
  }

  /** Bloom-filter bit set for a value column: the distinct hash
    * positions (k rows × mod m) the values light up, one row per set
    * bit — at most m rows however large the input. Built with one
    * distinct (map-side partial), mergeable by union — the classic
    * pre-filter a 100 TB incremental-dedup pipeline broadcasts to
    * probe a new batch without touching the corpus.
    */
  def bloomBits(vals: DataFrame, valCol: String, k: Int,
      m: Int): DataFrame = {
    require(k > 0 && m > 0, s"bad Bloom shape (k=$k, m=$m)")
    vals.select(explode(array((0 until k).map(r =>
        pos(r, col(valCol), m)): _*)).as("bit"))
      .distinct()
  }

  /** Probe a batch against a Bloom bit set: `bloom_hit` is true iff
    * ALL k positions of the value are set. No false negatives —
    * structurally: a value that went into [[bloomBits]] finds every one
    * of its own positions. The bit table is ≤ m rows, so the probe is
    * a broadcast join sized by the batch; the corpus is not touched.
    * Output: input columns + `bloom_hit`.
    */
  def bloomProbe(batch: DataFrame, idCol: String, valCol: String,
      bits: DataFrame, k: Int, m: Int): DataFrame = {
    val probe = batch.select(col(idCol), col(valCol),
      explode(array((0 until k).map(r =>
        pos(r, col(valCol), m)): _*)).as("bit"))
    probe.join(broadcast(bits).withColumn("_set", lit(true)),
        Seq("bit"), "left")
      .groupBy(col(idCol), col(valCol))
      .agg((sum(when(col("_set"), 1L).otherwise(0L)) === k)
        .as("bloom_hit"))
  }
}
