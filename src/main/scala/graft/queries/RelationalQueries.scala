package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import Tables._

/** Classic relational coverage (SURVEY.md §2.2): scan+filter+aggregate,
  * joins (broadcast + shuffle), top-k, window functions, rollup, set ops,
  * semi/anti joins. Each query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]; all float aggregation is decimal-exact
  * (see Tables.dec2).
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: full-scan aggregate, the partial-agg
    * (map-side combine) workhorse. Catalyst pushes the shipdate filter to
    * the parquet scan.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tbl(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec2(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style: tight filter + single scalar aggregate — tests
    * predicate pushdown + column pruning (scan should read 3 columns).
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tbl(spark, sfDir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        dec2(col("l_discount")).between(lit(0.03), lit(0.07)) &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  def q6Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style shipping-priority top-k: 3-way join (customer side
    * broadcast — dimension tables stay small relative to lineitem at every
    * SF), aggregate, deterministic top 10.
    */
  def q3TopRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = tbl(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = tbl(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = tbl(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(3, 2)) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: 5-way join through two dimension chains — exercises
    * join planning with multiple broadcastable dims.
    */
  def q5LocalRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val region = tbl(spark, sfDir, "region")
    val nation = tbl(spark, sfDir, "nation")
    val cust = tbl(spark, sfDir, "customer")
    val ord = tbl(spark, sfDir, "orders")
    val li = tbl(spark, sfDir, "lineitem")
    val supp = tbl(spark, sfDir, "supplier")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(3, 2)) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window functions: per-supplier running revenue ranking (dense top-3
    * shipments per supplier) — window shuffle partitions by supplier.
    */
  def qWindowTopShipments(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = tbl(spark, sfDir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("l_suppkey"), col("rk"))
  }

  def qWindowSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem) t
      |WHERE rk <= 3
      |ORDER BY l_suppkey, rk""".stripMargin

  /** ROLLUP aggregate over orders: hierarchical totals. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = tbl(spark, sfDir, "orders")
    ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  def qRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Anti + semi join: customers with no orders above a price, and their
    * count vs customers having any urgent order.
    */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = tbl(spark, sfDir, "customer")
    val ord = tbl(spark, sfDir, "orders")
    val bigSpenders = ord.filter(col("o_totalprice") > 100000)
      .select(col("o_custkey"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val noBig = cust.join(bigSpenders, col("c_custkey") === col("o_custkey"),
      "left_anti").agg(count(lit(1)).as("n")).withColumn("kind", lit("no_big_order"))
    val hasUrgent = cust.join(urgent, col("c_custkey") === col("o_custkey"),
      "left_semi").agg(count(lit(1)).as("n")).withColumn("kind", lit("has_urgent"))
    noBig.unionByName(hasUrgent).select(col("kind"), col("n")).orderBy(col("kind"))
  }

  def qSemiAntiSql: String =
    """SELECT 'has_urgent' AS kind, count(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT 'no_big_order' AS kind, count(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY kind""".stripMargin

  /** Set operations: EXCEPT both ways + INTERSECT over two genuinely
    * different key sets — parts sold in bulk (quantity > 45) vs parts
    * stocked small (size < 30). Every sold partkey exists in the full
    * catalog, so the round-10 form (sold vs all parts) proved only that
    * both engines agree on emptiness; these predicates make all three
    * set-algebra outputs non-empty at every SF, gating the VALUES the
    * operators produce, not just their cardinality.
    */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val sold = tbl(spark, sfDir, "lineitem").filter(col("l_quantity") > 45)
      .select(col("l_partkey").as("partkey")).distinct()
    val parts = tbl(spark, sfDir, "part").filter(col("p_size") < 30)
      .select(col("p_partkey").as("partkey")).distinct()
    val onlySold = sold.except(parts).withColumn("side", lit("bulk_only"))
    val onlyCat = parts.except(sold).withColumn("side", lit("small_only"))
    val both = sold.intersect(parts).withColumn("side", lit("both"))
    onlySold.unionByName(onlyCat).unionByName(both)
      .groupBy(col("side")).agg(count(lit(1)).as("n"),
        min(col("partkey")).as("min_key"), max(col("partkey")).as("max_key"))
      .orderBy(col("side"))
  }

  def qSetOpsSql: String =
    """WITH sold AS (SELECT DISTINCT l_partkey AS partkey FROM lineitem WHERE l_quantity > 45),
      |  cat AS (SELECT DISTINCT p_partkey AS partkey FROM part WHERE p_size < 30),
      |  bulk_only AS (SELECT partkey, 'bulk_only' AS side FROM (SELECT partkey FROM sold EXCEPT SELECT partkey FROM cat)),
      |  small_only AS (SELECT partkey, 'small_only' AS side FROM (SELECT partkey FROM cat EXCEPT SELECT partkey FROM sold)),
      |  both_sides AS (SELECT partkey, 'both' AS side FROM (SELECT partkey FROM sold INTERSECT SELECT partkey FROM cat))
      |SELECT side, count(*) AS n, min(partkey) AS min_key, max(partkey) AS max_key
      |FROM (SELECT * FROM bulk_only UNION ALL SELECT * FROM small_only UNION ALL SELECT * FROM both_sides)
      |GROUP BY side ORDER BY side""".stripMargin

  /** Tumbling-window event aggregation (batch form of the streaming op):
    * 1-hour windows per event_type with count + exact value sum.
    */
  def qEventWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = tbl(spark, sfDir, "events")
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("total_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  def qEventWindowsSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  /** JSON extraction from the events `props` column (semi-structured
    * path): per-type stats over a JSON-embedded metric.
    */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = tbl(spark, sfDir, "events")
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  def qJsonExtractSql: String =
    """SELECT event_type,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** String + math scalar function coverage over part (upper, substring,
    * length, abs, sqrt/ln with deterministic floor-truncation instead of
    * rounding — round() half-way rules differ across engines).
    */
  def qScalarFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val part = tbl(spark, sfDir, "part")
    part.select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        (floor(sqrt(col("p_retailprice")) * 100) / lit(100.0)).as("sqrt_price_2dp"),
        (floor(ln(col("p_retailprice") + 1) * 10000) / lit(10000.0)).as("ln_price_4dp"),
        abs(col("p_size") - 25).as("size_dev"))
      .orderBy(col("p_partkey"))
  }

  def qScalarFuncsSql: String =
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 8)) AS name_prefix,
      |  CAST(len(p_name) AS BIGINT) AS name_len,
      |  concat_ws('/', p_brand, p_type) AS brand_type,
      |  floor(sqrt(p_retailprice) * 100) / 100.0 AS sqrt_price_2dp,
      |  floor(ln(p_retailprice + 1) * 10000) / 10000.0 AS ln_price_4dp,
      |  abs(p_size - 25) AS size_dev
      |FROM part ORDER BY p_partkey""".stripMargin
}
