package graft.queries

import graft.model.{CdcColumns => C}
import graft.operators.{ChangeLogReducer, DiffEngine}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** CDC-core queries: the reference's two verbs (snapshot-replay and
  * validate) exercised over a change log synthesized DETERMINISTICALLY
  * from `lineitem`, so a SQL oracle can derive the identical log and the
  * driver can hash-compare end states.
  *
  * Synthetic log shape: PK = l_orderkey; events for a key are its line
  * items applied in (l_linenumber, payload-columns) order — the
  * plain-column tie-break matters because the synthetic data contains
  * repeated (l_orderkey, l_linenumber) pairs; a total order keeps both
  * physical strategies and the oracle in exact agreement. Op derives from
  * l_quantity: <3 → D, <25 → U, else I. This produces keys whose last
  * event is a delete (dropped), updated keys, and plain inserts — the
  * reference's replay semantics (last-event-wins per PK, trailing D
  * removes the key — src/cdc/cdc_operator.rs:170-215, SURVEY.md §7.3).
  */
object CdcQueries {

  private val LineitemCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  private val opExpr =
    when(col("l_quantity") < 3, lit("D"))
      .when(col("l_quantity") < 25, lit("U"))
      .otherwise(lit("I"))

  /** Deterministic total-order tie-break over the duplicate
    * (l_orderkey, l_linenumber) rows in the synthetic data: plain column
    * comparisons (struct ordering is lexicographic), no hashing — 2-4×
    * cheaper than an md5 row hash at the same determinism, and trivially
    * portable (numeric/string/timestamp comparisons agree across
    * engines). Columns cover the full payload, so only byte-identical
    * rows tie — and those produce identical results either way.
    */
  private val tieBreakCols = Seq("l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** Oracle ORDER BY mirror of the seq struct's DESC lexicographic max. */
  private val tieBreakOrderSql =
    tieBreakCols.map(c => s"$c DESC").mkString(", ")

  /** The deterministic synthetic change log. */
  def syntheticChangeLog(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .withColumn(C.Op, opExpr)
      .withColumn(C.IngestTs,
        date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))

  private val eventSeq: Column =
    graft.sources.ChangeLogReader.seqStruct(
      col("l_linenumber") +: tieBreakCols.map(col))

  /** Replay the change log to final state with the set-based reducer
    * (single shuffle, map-side partial agg — the plan that replaces the
    * reference's per-row SQL round-trips).
    */
  def cdcReduce(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    ChangeLogReducer.reduce(log, Seq("l_orderkey"), eventSeq)
      .orderBy(col("l_orderkey"))
  }

  def cdcReduceSql: String =
    s"""WITH cl AS (
      |  SELECT *, CASE WHEN l_quantity < 3 THEN 'D'
      |                 WHEN l_quantity < 25 THEN 'U' ELSE 'I' END AS op
      |  FROM lineitem),
      |last AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber DESC, $tieBreakOrderSql) AS rn
      |  FROM cl)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  l_shipdate
      |FROM last WHERE rn = 1 AND op <> 'D'
      |ORDER BY l_orderkey""".stripMargin

  /** max_by-aggregation reduction variant — must agree with cdcReduce
    * (same oracle); kept as a declared op so the driver verifies both
    * physical strategies (window default vs partial-aggregating max_by —
    * see ChangeLogReducer for the measured trade-off).
    */
  def cdcReduceMaxBy(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    ChangeLogReducer.reduceViaMaxBy(log, Seq("l_orderkey"), eventSeq)
      .select(LineitemCols.map(col): _*)
      .orderBy(col("l_orderkey"))
  }

  /** Oracle ORDER BY mirror of the seq struct's ASC lexicographic order
    * (SCD2 history runs time-forward, unlike the reducers' DESC max).
    */
  private val tieBreakAscSql =
    tieBreakCols.map(c => s"$c ASC").mkString(", ")

  /** Point-in-time cutoffs over the synthetic log's l_shipdate event
    * time (data spans 1995-01..2001-11 — both cutoffs split it well
    * inside the range at every SF).
    */
  private val AsofCutoff = "1998-06-30 00:00:00"
  private val MergeCutoff = "1999-01-01 00:00:00"

  /** Ingest-time event order: shipdate first, then the linenumber +
    * payload tie-break. Under this order a later-dated batch is wholly
    * later than the history before it — the property [[ChangeLogReducer
    * .mergeBatch]]'s snapshot+delta merge needs to equal full replay.
    */
  private val timeSeq: Column =
    graft.sources.ChangeLogReader.seqStruct(
      col("l_shipdate") +: col("l_linenumber") +: tieBreakCols.map(col))

  /** Snapshot AS OF a point in time: replay only the events at or before
    * the cutoff — the time-travel verb (reconstruct what the table
    * looked like last June). Same single-shuffle reduction as
    * [[cdcReduce]]; the cutoff is a pushable scan predicate, so at scale
    * this reads the ≤cutoff slice of the log, not all of it.
    */
  def cdcSnapshotAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit(AsofCutoff)))
    ChangeLogReducer.reduce(log, Seq("l_orderkey"), eventSeq)
      .orderBy(col("l_orderkey"))
  }

  def cdcSnapshotAsofSql: String =
    s"""WITH cl AS (
      |  SELECT *, CASE WHEN l_quantity < 3 THEN 'D'
      |                 WHEN l_quantity < 25 THEN 'U' ELSE 'I' END AS op
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '$AsofCutoff'),
      |last AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber DESC, $tieBreakOrderSql) AS rn
      |  FROM cl)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  l_shipdate
      |FROM last WHERE rn = 1 AND op <> 'D'
      |ORDER BY l_orderkey""".stripMargin

  /** SCD-2 dimension history from the change log: one versioned row per
    * non-delete event with its validity interval (valid_from = event
    * time, valid_to = next event's time, NULL while current; a tombstone
    * closes its predecessor's interval and emits nothing). Event order
    * within a key is ingest time ([[timeSeq]]).
    */
  def cdcScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    ChangeLogReducer.history(log, Seq("l_orderkey"), timeSeq,
        col("l_shipdate"))
      .select(col("l_orderkey"), col("version"), col("l_quantity"),
        col("l_extendedprice"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy(col("l_orderkey"), col("version"))
  }

  def cdcScd2Sql: String =
    s"""WITH cl AS (
      |  SELECT *, CASE WHEN l_quantity < 3 THEN 'D'
      |                 WHEN l_quantity < 25 THEN 'U' ELSE 'I' END AS op
      |  FROM lineitem),
      |v AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_shipdate ASC, l_linenumber ASC, $tieBreakAscSql)
      |      AS version,
      |    lead(l_shipdate) OVER (PARTITION BY l_orderkey
      |      ORDER BY l_shipdate ASC, l_linenumber ASC, $tieBreakAscSql)
      |      AS valid_to
      |  FROM cl)
      |SELECT l_orderkey, version, l_quantity, l_extendedprice,
      |  l_shipdate AS valid_from, valid_to,
      |  CAST(valid_to IS NULL AS INT) AS is_current
      |FROM v WHERE op <> 'D'
      |ORDER BY l_orderkey, version""".stripMargin

  /** Incremental SCD2 maintenance: build the history for the events
    * before the cutoff, then fold the after-cutoff batch in with
    * [[ChangeLogReducer.historyMerge]] (open intervals close at the
    * key's first batch event, version ordinals continue from the stored
    * cursor) — and the ORACLE is the full-replay history of the whole
    * log ([[cdcScd2Sql]]), so the driver verifies stored-history+delta
    * equals recomputing from scratch, tombstone ordinal gaps included.
    */
  def cdcScd2Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    val cut = to_timestamp(lit(MergeCutoff))
    val pre = log.filter(col("l_shipdate") <= cut)
    val post = log.filter(col("l_shipdate") > cut)
    val hist0 = ChangeLogReducer.history(pre, Seq("l_orderkey"), timeSeq,
      col("l_shipdate"))
    val cursor = ChangeLogReducer.historyCursor(pre, Seq("l_orderkey"))
    // timeSeq leads with l_shipdate — exactly the merge's ts — so the
    // seqTimeLeading fast path (plain min(ts), HashAggregate) applies
    ChangeLogReducer.historyMerge(hist0, cursor, post, Seq("l_orderkey"),
        timeSeq, col("l_shipdate"), seqTimeLeading = true)
      .select(col("l_orderkey"), col("version"), col("l_quantity"),
        col("l_extendedprice"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy(col("l_orderkey"), col("version"))
  }

  /** The general-contract flavor of [[cdcScd2Merge]]: `min_by(ts, seq)`
    * for the per-key first batch event instead of the time-leading
    * `min(ts)` fast path. Bench-only A/B partner — the struct ordering
    * buffer plans interpreted SortAggregate (the Tungsten limitation),
    * which is what the fast path exists to avoid; CdcTemporalSpec pins
    * the two bit-identical, PlanShapeSpec pins their physical split.
    */
  def cdcScd2MergeMinBy(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    val cut = to_timestamp(lit(MergeCutoff))
    val pre = log.filter(col("l_shipdate") <= cut)
    val post = log.filter(col("l_shipdate") > cut)
    val hist0 = ChangeLogReducer.history(pre, Seq("l_orderkey"), timeSeq,
      col("l_shipdate"))
    val cursor = ChangeLogReducer.historyCursor(pre, Seq("l_orderkey"))
    ChangeLogReducer.historyMerge(hist0, cursor, post, Seq("l_orderkey"),
        timeSeq, col("l_shipdate"), seqTimeLeading = false)
      .select(col("l_orderkey"), col("version"), col("l_quantity"),
        col("l_extendedprice"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy(col("l_orderkey"), col("version"))
  }

  /** Incremental snapshot maintenance: reduce the history before the
    * cutoff into a snapshot (tombstones retained), then fold the
    * after-cutoff batch in with [[ChangeLogReducer.mergeBatch]] — and the
    * ORACLE is the full replay of the whole log, so the driver verifies
    * the snapshot+delta merge is bit-identical to recomputing from
    * scratch. Ordering is ingest time, the regime where the merge is
    * exact (see mergeBatch's contract).
    */
  def cdcMergeIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val log = syntheticChangeLog(spark, sfDir)
    val cut = to_timestamp(lit(MergeCutoff))
    val snap0 = ChangeLogReducer.reduceKeepOp(
      log.filter(col("l_shipdate") <= cut), Seq("l_orderkey"), timeSeq)
    ChangeLogReducer.mergeBatch(snap0,
        log.filter(col("l_shipdate") > cut), Seq("l_orderkey"), timeSeq)
      .select(LineitemCols.map(col): _*)
      .orderBy(col("l_orderkey"))
  }

  def cdcMergeIncrementalSql: String =
    s"""WITH cl AS (
      |  SELECT *, CASE WHEN l_quantity < 3 THEN 'D'
      |                 WHEN l_quantity < 25 THEN 'U' ELSE 'I' END AS op
      |  FROM lineitem),
      |last AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_shipdate DESC, l_linenumber DESC, $tieBreakOrderSql)
      |    AS rn
      |  FROM cl)
      |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  l_shipdate
      |FROM last WHERE rn = 1 AND op <> 'D'
      |ORDER BY l_orderkey""".stripMargin

  /** Deterministically mutated copy of orders for diff testing
    * (o_orderkey is unique, unlike lineitem's (orderkey, linenumber)):
    *  - o_orderkey % 997 = 3 deleted (→ only_left)
    *  - o_orderkey % 1000 = 7 gets totalprice+1.50 (→ mismatch)
    *  - o_orderkey % 998 = 5 duplicated with key+10000000 (→ only_right)
    */
  def mutatedOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = tbl(spark, sfDir, "orders")
    val kept = ord.filter(col("o_orderkey") % 997 =!= 3)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 1000 === 7,
          (dec2(col("o_totalprice")) + dec2(lit(1.5))).cast("double"))
          .otherwise(col("o_totalprice")))
    val extra = ord.filter(col("o_orderkey") % 998 === 5)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    kept.unionByName(extra)
  }

  private val mutatedSql =
    """mut AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 1000 = 7
      |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(1.5 AS DECIMAL(18,2)) AS DOUBLE)
      |      ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 997 <> 3
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
      |    o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 998 = 5)""".stripMargin

  private val payloadCols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** Row-level diff detail (non-matching rows only), pk + status +
    * comma-joined mismatching column names.
    */
  def diffDetail(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = tbl(spark, sfDir, "orders")
    val mut = mutatedOrders(spark, sfDir)
    DiffEngine.rowDiff(ord, mut, Seq("o_orderkey"))
      .filter(col(DiffEngine.StatusCol) =!= "match")
      .select(col("o_orderkey"), col(DiffEngine.StatusCol),
        array_join(col(DiffEngine.MismatchCol), ",").as("mismatch_cols"))
      .orderBy(col("o_orderkey"))
  }

  private def notSame(c: String) =
    s"NOT (a.$c IS NOT DISTINCT FROM b.$c)"

  def diffDetailSql: String =
    s"""WITH $mutatedSql
      |SELECT
      |  coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN a.o_orderkey IS NULL THEN 'only_right'
      |       WHEN b.o_orderkey IS NULL THEN 'only_left'
      |       ELSE 'mismatch' END AS diff_status,
      |  CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN ''
      |       ELSE array_to_string(list_filter([
      |${payloadCols.map(c => s"    CASE WHEN ${notSame(c)} THEN '$c' END").mkString(",\n")}
      |  ], x -> x IS NOT NULL), ',') END AS mismatch_cols
      |FROM orders a
      |FULL OUTER JOIN mut b ON a.o_orderkey = b.o_orderkey
      |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |   OR ${payloadCols.map(notSame).mkString("\n   OR ")}
      |ORDER BY o_orderkey""".stripMargin

  /** Per-status diff summary (the per-table report the reference logs). */
  def diffSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = tbl(spark, sfDir, "orders")
    val mut = mutatedOrders(spark, sfDir)
    DiffEngine.summarize(DiffEngine.rowDiff(ord, mut, Seq("o_orderkey")))
  }

  def diffSummarySql: String =
    s"""WITH $mutatedSql
      |SELECT CASE WHEN a.o_orderkey IS NULL THEN 'only_right'
      |            WHEN b.o_orderkey IS NULL THEN 'only_left'
      |            WHEN ${payloadCols.map(c => s"(a.$c IS NOT DISTINCT FROM b.$c)").mkString("\n             AND ")}
      |            THEN 'match' ELSE 'mismatch' END AS diff_status,
      |  count(*) AS n
      |FROM orders a
      |FULL OUTER JOIN mut b ON a.o_orderkey = b.o_orderkey
      |GROUP BY 1 ORDER BY diff_status""".stripMargin

  // digest row hash: columns in sorted NAME order (matches
  // DiffEngine.chunkDigest/bucketDigest layout-independence)
  private val ordersCanonSql =
    """md5(concat_ws(chr(1),
      |      coalesce(CAST(o_custkey AS VARCHAR), chr(1) || 'N'),
      |      coalesce(CAST(epoch_us(o_orderdate) AS VARCHAR), chr(1) || 'N'),
      |      coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || 'N'),
      |      coalesce(o_orderpriority, chr(1) || 'N'),
      |      coalesce(o_orderstatus, chr(1) || 'N'),
      |      coalesce(CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR), chr(1) || 'N')))""".stripMargin

  /** PK-ordered chunk digests over orders (pgdatadiff-parity compare
    * unit, chunk = 1000 like the reference default).
    */
  def chunkDigest(spark: SparkSession, sfDir: String): DataFrame =
    DiffEngine.chunkDigest(tbl(spark, sfDir, "orders"), Seq("o_orderkey"), 1000)
      .orderBy(col("chunk_id"))

  def chunkDigestSql: String =
    s"""WITH h AS (
      |  SELECT row_number() OVER (ORDER BY o_orderkey) AS rn,
      |    $ordersCanonSql AS rh
      |  FROM orders)
      |SELECT CAST(floor((rn - 1) / 1000) AS BIGINT) AS chunk_id,
      |  count(*) AS n_rows,
      |  md5(string_agg(rh, '|' ORDER BY rn)) AS digest
      |FROM h GROUP BY 1 ORDER BY chunk_id""".stripMargin

  /** Order-independent bucketed digests over orders — the no-global-sort
    * 100 TB compare path.
    */
  def bucketDigest(spark: SparkSession, sfDir: String): DataFrame =
    DiffEngine.bucketDigest(tbl(spark, sfDir, "orders"), Seq("o_orderkey"))
      .orderBy(col("bucket"))

  def bucketDigestSql: String =
    s"""WITH h AS (
      |  SELECT substr(md5(coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || 'N')), 1, 2) AS bucket,
      |    ('0x' || substr($ordersCanonSql, 1, 15))::BIGINT % 1000000007 AS h
      |  FROM orders)
      |SELECT bucket, count(*) AS n_rows, CAST(sum(h) AS BIGINT) AS digest
      |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Change log with a DEGENERATE hot key: ~20% of events remapped onto
    * PK 1 (hash-selected rows, so the skew is deterministic and
    * SF-independent). This is the shape AQE's skew handling does NOT fix
    * at modest partition sizes (its byte thresholds never trigger) and
    * the shape a real CDC feed produces when one entity dominates the
    * stream — the case [[graft.operators.ScaleOps.saltedJoin]] exists
    * for.
    */
  private def skewedLog(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .withColumn("l_orderkey",
        when(pmod(xxhash64(col("l_linenumber"), col("l_partkey")),
          lit(5)) === 0, lit(1L)).otherwise(col("l_orderkey")))

  private def skewAgg(joined: DataFrame): DataFrame =
    // md5 per joined row: enough per-row work that the hot key's reducer
    // is compute-bound (the condition being measured), not startup-bound
    joined.agg(count(lit(1)).as("n_events"),
      approx_count_distinct(md5(concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("o_orderpriority"))))
        .as("h"))

  /** Skew probe, UNSALTED: hot-key change log ⋈ orders state on PK with
    * the stock shuffle join — one reducer owns the hot key's 20%.
    * Bench-extras only (the salted twin must agree; ScaleOpsSpec asserts
    * equality, BENCH_NOTES records the measured delta).
    */
  def cdcSkewJoinPlain(spark: SparkSession, sfDir: String): DataFrame =
    skewAgg(skewedLog(spark, sfDir).join(
      tbl(spark, sfDir, "orders"),
      col("l_orderkey") === col("o_orderkey")))

  /** Skew probe, SALTED: same join through saltedJoin(32) — the hot key
    * spreads over 32 reducers at the cost of replicating the right side
    * per salt.
    */
  def cdcSkewJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val right = tbl(spark, sfDir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    skewAgg(graft.operators.ScaleOps.saltedJoin(
      skewedLog(spark, sfDir), right, Seq("l_orderkey"), saltFactor = 32))
  }

  /** Skew probe, SPLIT: hot keys detected from the skew report, routed
    * through a broadcast join of the (one-row-per-key) right side's hot
    * slice; the cold bulk takes the stock shuffle join — the form that
    * neither replicates the right side nor leaves one reducer holding
    * the hot key.
    */
  def cdcSkewJoinSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val log = skewedLog(spark, sfDir)
    val right = tbl(spark, sfDir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val hot = graft.operators.ScaleOps
      .skewReport(log, Seq("l_orderkey"), limit = 20)
      .filter(col("share") > 0.05)
    skewAgg(graft.operators.ScaleOps.skewSplitJoin(
      log, right, Seq("l_orderkey"), hot))
  }
}
