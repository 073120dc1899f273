package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Second-ring relational coverage (SURVEY.md §2.2): CUBE grouping sets,
  * multi-distinct aggregation, gap-based sessionization, interpolated
  * percentiles, and an as-of join expressed with running-window maxima.
  */
object AdvancedQueries {

  /** CUBE over two dimensions (all four grouping sets in one pass). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  def qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Multiple exact COUNT(DISTINCT) in one aggregation (expand-based). */
  def qDistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  def qDistinctAggSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Gap-based sessionization of the event stream: a >30-minute silence
    * starts a new session; one output row per (user, session) with span
    * and exact value total. The lag + running-sum idiom — the batch form
    * of streaming session windows.
    */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = tbl(spark, sfDir, "events")
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(wOrd)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts").cast("timestamp")) -
        unix_micros(prevTs.cast("timestamp")) > 1800L * 1000000L, 1L)
      .otherwise(0L)
    ev.withColumn("is_new", isNew)
      .withColumn("session_ord", sum(col("is_new"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_ord"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("user_id"), col("session_ord"))
  }

  def qSessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_ord
      |  FROM marked)
      |SELECT user_id, session_ord, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, session_ord
      |ORDER BY user_id, session_ord""".stripMargin

  /** Interpolated percentiles (PERCENTILE_CONT semantics) per group. */
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  def qPercentileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** PIVOT: order counts per priority pivoted across statuses (explicit
    * value list keeps output columns deterministic in both engines).
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  def qPivotSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT/melt: wide part metrics to (key, metric, value) long form,
    * then aggregate — schema-reshaping coverage.
    */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "part")
      .select(col("p_brand"), col("p_size").cast(DoubleType).as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_brand")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .groupBy(col("p_brand"), col("metric"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total"))
      .orderBy(col("p_brand"), col("metric"))

  def qUnpivotSql: String =
    """WITH long AS (
      |  SELECT p_brand, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |  UNION ALL
      |  SELECT p_brand, 'p_retailprice', p_retailprice FROM part)
      |SELECT p_brand, metric, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM long GROUP BY p_brand, metric ORDER BY p_brand, metric""".stripMargin

  /** Correlated scalar subquery through the SQL text surface
    * (spark.sql + temp views): parts priced above their brand's average.
    * Catalyst decorrelates the subquery into a join.
    */
  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    tbl(spark, sfDir, "part").createOrReplaceTempView("part_v")
    spark.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part_v p
        |WHERE CAST(p_retailprice AS DOUBLE) > (
        |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE)
        |  FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  def qScalarSubquerySql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |WHERE CAST(p_retailprice AS DOUBLE) > (
      |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |       / CAST(count(*) AS DOUBLE)
      |  FROM part p2 WHERE p2.p_brand = p.p_brand)
      |ORDER BY p_partkey""".stripMargin

  /** HLL sketch aggregation (approx_count_distinct) next to exact
    * counts. No cross-engine oracle exists for HLL INTERNALS (Spark's
    * relative-error HLL++ differs from other engines' sketches), but the
    * accuracy CONTRACT is oracle-expressible: the declared query
    * ([[qApproxDistinct]]) folds each estimate into a boolean
    * `|approx-exact|/exact <= eps` next to the exact count, and the
    * DuckDB oracle computes the exact counts and asserts the booleans
    * are all true — so a sketch drifting outside its error bound is a
    * HASH MISMATCH, not an unreviewable rows-only pass. eps = 5×rsd is a
    * ≫5-sigma band (HLL++ relative error is ~normal with sd = rsd): a
    * failure means the sketch broke, not bad luck. The raw estimates
    * stay inspectable via [[qApproxDistinctDetail]] (spec-gated). At
    * 100 TB, sketches are how you count distinct URLs/users per slice
    * without a distinct-expand shuffle.
    */
  val ApproxDistinctRsd = 0.02
  val ApproxDistinctEps = 5 * ApproxDistinctRsd

  def qApproxDistinctDetail(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), ApproxDistinctRsd)
          .as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), ApproxDistinctRsd)
          .as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy(col("l_returnflag"))

  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    def withinEps(approx: String, exact: String) =
      (abs(col(approx).cast(DoubleType) - col(exact).cast(DoubleType)) /
        col(exact).cast(DoubleType)) <= lit(ApproxDistinctEps)
    qApproxDistinctDetail(spark, sfDir)
      .select(col("l_returnflag"),
        col("exact_parts"), col("exact_orders"),
        withinEps("approx_parts", "exact_parts").as("parts_within_eps"),
        withinEps("approx_orders", "exact_orders").as("orders_within_eps"))
      .orderBy(col("l_returnflag"))
  }

  def qApproxDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  true AS parts_within_eps,
      |  true AS orders_within_eps
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** KMV (k-minimum-values) distinct-count sketch — the PORTABLE sketch:
    * unlike HLL (whose internals differ per engine, forcing
    * q_approx_distinct to a rows-only check), KMV is pure integer
    * hashing + one IEEE division, so an external engine reproduces the
    * ESTIMATE bit-for-bit. The k smallest distinct 60-bit md5 hashes of
    * the key give est = (k-1) · 2^60 / h_k; with fewer than k distinct
    * values the sample IS the exact count.
    *
    * Scale shape: distinct-hash → global k-smallest is a TakeOrdered
    * (per-partition heads, no full sort); the sketch state is k longs no
    * matter the corpus size — the same reason you'd run it at 100 TB.
    */
  def qKmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 512
    val li = tbl(spark, sfDir, "lineitem")
    val topk = li
      .select(graft.functions.PortableHash.md5Long(col("l_orderkey")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
    val sketch = topk.agg(
      count(lit(1)).as("n_sample"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_sample") < k, col("n_sample").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            col("kth_hash").cast(DoubleType)))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sketch.crossJoin(exact)
      .select(col("n_sample"), col("kth_hash"), col("est_distinct"),
        col("exact_distinct"))
  }

  def qKmvDistinctSql: String =
    """WITH h AS (
      |  SELECT DISTINCT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM lineitem),
      |topk AS (SELECT h FROM h ORDER BY h LIMIT 512),
      |sketch AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_sample, max(h) AS kth_hash,
      |    CASE WHEN count(*) < 512 THEN CAST(count(*) AS DOUBLE)
      |         ELSE (511.0 * 1152921504606846976.0) / CAST(max(h) AS DOUBLE)
      |         END AS est_distinct
      |  FROM topk)
      |SELECT n_sample, kth_hash, est_distinct, exact_distinct
      |FROM sketch CROSS JOIN (
      |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      |  FROM lineitem)""".stripMargin

  /** Per-group KMV sketches via the bounded typed Aggregator — distinct
    * orders per return flag with k longs of state per group (partial
    * aggregation combines map-side), next to nothing at any scale; the
    * window-rank oracle formulation sorts every group row, which is
    * exactly the cost the aggregator avoids.
    */
  def qKmvGroups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 256
    val pow60 = math.pow(2, 60) // exact: power of two
    val hashed = tbl(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        graft.functions.PortableHash.md5Long(col("l_orderkey")).as("h"))
      .as[(String, Long)]
    val sketch = new graft.functions.KmvSketchAggregator(k).toColumn
    hashed.groupByKey(_._1)
      .mapValues(_._2)
      .agg(sketch.name("sk"))
      .map { case (flag, sk) =>
        val est =
          if (sk.n_sample < k) sk.n_sample.toDouble
          else ((k - 1).toDouble * pow60) / sk.kth_hash.toDouble
        (flag, sk.n_sample, sk.kth_hash, est)
      }
      .toDF("l_returnflag", "n_sample", "kth_hash", "est_distinct")
      .orderBy(col("l_returnflag"))
  }

  def qKmvGroupsSql: String =
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM lineitem),
      |rk AS (
      |  SELECT l_returnflag, h,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
      |  FROM h),
      |topk AS (SELECT * FROM rk WHERE rk <= 256)
      |SELECT l_returnflag, CAST(count(*) AS INTEGER) AS n_sample,
      |  max(h) AS kth_hash,
      |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
      |       ELSE (255.0 * 1152921504606846976.0) / CAST(max(h) AS DOUBLE)
      |       END AS est_distinct
      |FROM topk GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** As-of join via running-window maxima: for every `error` event, the
    * most recent preceding `click` by the same user (NULL if none) and
    * the gap in microseconds. The union-then-running-max idiom is the
    * shuffle-minimal way to express as-of joins on a shared key.
    */
  def qAsOfJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = tbl(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_click_ts"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("last_click_ts").cast("timestamp")))
          .as("gap_micros"))
      .orderBy(col("event_id"))
  }

  def qAsOfJoinSql: String =
    """WITH runup AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      |  FROM events)
      |SELECT event_id, user_id, ts, last_click_ts,
      |  epoch_us(ts) - epoch_us(last_click_ts) AS gap_micros
      |FROM runup WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin
}
