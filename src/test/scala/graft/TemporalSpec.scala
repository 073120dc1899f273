package graft

import graft.model.{CdcColumns => C}
import graft.operators.ChangeLogReducer
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** CDC temporal verbs: SCD2 history intervals and incremental
  * snapshot+delta maintenance, on hand-checked fixtures plus the
  * merge==full-replay invariant on real sf0.001 data.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  /** (op, ts, id, v) events; ts doubles as the event-order key. */
  private def log(rows: (String, Int, Long, String)*): DataFrame =
    rows.toSeq.toDF(C.Op, "ts", "id", "v")

  test("history: intervals chain, tombstone closes without emitting") {
    val events = log(
      ("I", 1, 1L, "a"), ("U", 3, 1L, "b"), ("D", 5, 1L, "b"),
      ("I", 7, 1L, "c"), // re-insert after delete → new open interval
      ("I", 2, 2L, "x")) // single-event key stays current
    val h = ChangeLogReducer.history(events, Seq("id"), col("ts"), col("ts"))
      .select("id", "version", "v", "valid_from", "valid_to", "is_current")
      .sort("id", "version")
    assert(h.collect().toSeq === Seq(
      Row(1L, 1, "a", 1, 3, 0),
      Row(1L, 2, "b", 3, 5, 0), // closed BY the tombstone at ts=5
      Row(1L, 4, "c", 7, null, 1), // version 3 was the delete → gap
      Row(2L, 1, "x", 2, null, 1)))
  }

  test("history: current rows equal the reduced snapshot") {
    val events = log(
      ("I", 1, 1L, "a"), ("U", 2, 1L, "a2"),
      ("I", 1, 2L, "b"), ("D", 9, 2L, "b"),
      ("I", 4, 3L, "c"))
    val current = ChangeLogReducer
      .history(events, Seq("id"), col("ts"), col("ts"))
      .filter(col("is_current") === 1).select("id", "v")
    val snap = ChangeLogReducer
      .reduce(events, Seq("id"), col("ts")).select("id", "v")
    assert(current.sort("id").collect().toSeq ===
      snap.sort("id").collect().toSeq)
  }

  test("mergeBatch equals full replay on a delete/reinsert fixture") {
    val hist = log(
      ("I", 1, 1L, "a"), ("U", 2, 1L, "a2"),
      ("I", 1, 2L, "b"),
      ("I", 1, 3L, "c"), ("D", 3, 3L, "c"), // tombstone in snapshot
      ("I", 2, 4L, "d"))
    val batch = log(
      ("D", 11, 1L, "a2"), // delete a live key
      ("U", 12, 2L, "b2"), // update a live key
      ("I", 13, 3L, "c2"), // resurrect past the tombstone
      ("I", 14, 5L, "e")) // brand-new key; key 4 untouched
    val snap0 = ChangeLogReducer.reduceKeepOp(hist, Seq("id"), col("ts"))
    val merged = ChangeLogReducer
      .mergeBatch(snap0, batch, Seq("id"), col("ts"))
      .select("id", "v").sort("id")
    val full = ChangeLogReducer
      .reduce(hist.unionByName(batch), Seq("id"), col("ts"))
      .select("id", "v").sort("id")
    assert(merged.collect().toSeq === full.collect().toSeq)
    assert(merged.collect().toSeq === Seq(
      Row(2L, "b2"), Row(3L, "c2"), Row(4L, "d"), Row(5L, "e")))
  }

  test("tombstone retention: dropping snapshot tombstones is the bug") {
    // why reduceKeepOp (not reduce) feeds the merge: a batch that never
    // mentions a tombstoned key must NOT resurrect it
    val hist = log(("I", 1, 9L, "z"), ("D", 2, 9L, "z"))
    val batch = log(("I", 3, 8L, "y"))
    val snap0 = ChangeLogReducer.reduceKeepOp(hist, Seq("id"), col("ts"))
    val merged = ChangeLogReducer
      .mergeBatch(snap0, batch, Seq("id"), col("ts")).select("id", "v")
    assert(merged.collect().toSeq === Seq(Row(8L, "y")))
  }

  test("sf0.001: merge-incremental equals the full replay") {
    val sfDir = "/root/testdata/sf0.001"
    val merged = graft.queries.CdcQueries.cdcMergeIncremental(spark, sfDir)
    val full = graft.queries.CdcQueries.cdcReduce(spark, sfDir)
      .select(merged.columns.map(col).toSeq: _*)
    // same survivor keys; payloads agree where the orders differ only in
    // the seq flavor (cdcReduce uses linenumber order, the merge uses
    // ingest-time order — survivors can differ per key, so compare keys)
    assert(merged.count() > 0)
    val mergedKeys = merged.select("l_orderkey").collect().map(_.getLong(0))
    val replayTime = {
      val log = graft.queries.CdcQueries.syntheticChangeLog(spark, sfDir)
      ChangeLogReducer.reduce(log, Seq("l_orderkey"),
        struct(col("l_shipdate"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus")))
    }
    val fullRows = replayTime.select(merged.columns.map(col).toSeq: _*)
      .sort("l_orderkey").collect().toSeq
    assert(merged.sort("l_orderkey").collect().toSeq === fullRows)
    assert(mergedKeys.length === fullRows.length)
    assert(full.count() > 0) // both flavors nonempty on the same log
  }

  test("historyMerge equals full-replay history, tombstone gaps included") {
    val pre = log(
      ("I", 1, 1L, "a"), ("U", 3, 1L, "a2"), // key 1 open at cutoff
      ("I", 1, 2L, "b"), ("D", 4, 2L, "b"), // key 2 ends deleted (gap!)
      ("I", 2, 3L, "c"), // key 3 untouched by the batch
      ("I", 1, 4L, "d"), ("D", 2, 4L, "d"), ("D", 3, 4L, "d")) // 2 gaps
    val batch = log(
      ("U", 11, 1L, "a3"), // closes key 1's open row at ts=11
      ("I", 12, 2L, "b2"), // resurrect: version must be 3 (gap at 2)
      ("D", 13, 5L, "x"), // delete-first on a brand-new key
      ("I", 14, 4L, "d2"), // version must be 4 (two tombstone gaps)
      ("I", 15, 5L, "x2")) // after its own delete → version 2
    val hist0 = ChangeLogReducer.history(pre, Seq("id"), col("ts"),
      col("ts"))
    val cursor = ChangeLogReducer.historyCursor(pre, Seq("id"))
    val merged = ChangeLogReducer.historyMerge(hist0, cursor, batch,
        Seq("id"), col("ts"), col("ts"))
      .select("id", "version", "v", "valid_from", "valid_to", "is_current")
      .sort("id", "version").collect().toSeq
    val full = ChangeLogReducer.history(pre.unionByName(batch), Seq("id"),
        col("ts"), col("ts"))
      .select("id", "version", "v", "valid_from", "valid_to", "is_current")
      .sort("id", "version").collect().toSeq
    assert(merged === full, s"merged $merged\nfull $full")
    // spot-check the corners the cursor exists for
    assert(merged.contains(Row(2L, 3, "b2", 12, null, 1)))
    assert(merged.contains(Row(4L, 4, "d2", 14, null, 1)))
    assert(merged.contains(Row(5L, 2, "x2", 15, null, 1)))
    // cursor maintenance: merged cursor equals recount of the whole log
    val nextCursor = ChangeLogReducer.mergeCursors(cursor,
        ChangeLogReducer.historyCursor(batch, Seq("id")), Seq("id"))
      .sort("id").collect().toSeq
    val recount = ChangeLogReducer
      .historyCursor(pre.unionByName(batch), Seq("id"))
      .sort("id").collect().toSeq
    assert(nextCursor === recount)
  }

  test("scd2 merge fast path (min ts) is bit-identical to min_by flavor") {
    val sf = "/root/testdata/sf0.001"
    val fast = graft.queries.CdcQueries.cdcScd2Merge(spark, sf)
      .collect().toSeq
    val general = graft.queries.CdcQueries.cdcScd2MergeMinBy(spark, sf)
      .collect().toSeq
    assert(fast.nonEmpty)
    assert(fast === general)
  }

  test("asof snapshot is a subset-in-time: no post-cutoff shipdates") {
    val snap = graft.queries.CdcQueries
      .cdcSnapshotAsof(spark, "/root/testdata/sf0.001")
    assert(snap.count() > 0)
    assert(snap.filter(col("l_shipdate") >
      to_timestamp(lit("1998-06-30 00:00:00"))).count() === 0)
  }
}
