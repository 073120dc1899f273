package graft.operators

import graft.model.{CdcColumns => C}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Set-based change-log reduction: final table state = last event per
  * primary key, dropping keys whose last event is a delete.
  *
  * This replaces the reference's row-at-a-time replay (one SQL round-trip
  * per CDC row — src/postgres/postgres_operator_impl.rs:292-401, the
  * scaling cliff called out in SURVEY.md §4.2) with a single distributed
  * aggregation. Semantics match the reference exactly (SURVEY.md §2.3.4):
  * upserts are idempotent per event, a trailing D removes the key, and a
  * later re-insert of a deleted key resurrects it.
  *
  * Two physical strategies:
  *
  *  - `reduce` (default): `groupBy(pk).agg(max_by(payload, seq))` — ONE
  *    shuffle with map-side partial aggregation. At 100 TB this is the
  *    right plan: each map task pre-reduces its partition to at most one
  *    row per key before the exchange, so shuffle volume ∝ distinct keys
  *    touched, not total events.
  *  - `reduceWithWindow`: `row_number() over (partition by pk order by seq
  *    desc) = 1` — shuffles and SORTS every event row. Kept for plan
  *    comparison and because it preserves arbitrary extra columns cheaply.
  *
  * Ordering ties cannot occur: seq = (load_rank, file_path, row_index) is
  * unique per event.
  */
object ChangeLogReducer {

  /** Columns that never belong in the reduced business state. */
  private def dropCols: Seq[String] = C.MetaColumns ++ C.InternalColumns

  /** @param changeLog ordered change log (ChangeLogReader output: business
    *                  columns + Op + ingestion ts + ordering columns)
    * @param pks       primary-key column names (composite PKs as a Seq,
    *                  never concatenated)
    * @param seq       comparable event-order column (ChangeLogReader.eventSeq)
    * @return final state: business columns only, one row per surviving PK
    */
  def reduce(changeLog: DataFrame, pks: Seq[String], seq: Column): DataFrame = {
    require(pks.nonEmpty, "change-log reduction needs a primary key")
    val payloadCols = changeLog.columns.filterNot(pks.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val reduced = changeLog
      .groupBy(pks.map(col): _*)
      .agg(max_by(payload, seq).as("_last"))
    val restored = pks.map(col) ++ payloadCols.map(c => col(s"_last.`$c`").as(c))
    reduced
      .select(restored: _*)
      // null-SAFE: a NULL Op (e.g. a drifted file without the column)
      // must survive as an insert, not vanish (NULL =!= 'D' is NULL)
      .filter(!(col(C.Op) <=> lit("D")))
      .drop(dropCols: _*)
  }

  /** Last event per key INCLUDING delete tombstones, with the `Op`
    * column retained — the feed contract for [[graft.sinks.JdbcSink.upsert]],
    * which routes `Op = D` rows to batched deletes and everything else to
    * upserts. Same single-shuffle `max_by` plan as `reduce`; only the
    * final filter/drop differ.
    */
  def reduceKeepOp(changeLog: DataFrame, pks: Seq[String], seq: Column)
      : DataFrame = {
    require(pks.nonEmpty, "change-log reduction needs a primary key")
    val payloadCols = changeLog.columns.filterNot(pks.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val reduced = changeLog
      .groupBy(pks.map(col): _*)
      .agg(max_by(payload, seq).as("_last"))
    val restored = pks.map(col) ++ payloadCols.map(c => col(s"_last.`$c`").as(c))
    reduced
      .select(restored: _*)
      .drop(dropCols.filterNot(_ == C.Op): _*)
  }

  /** Window-based variant (shuffle + sort). Same semantics as `reduce`. */
  def reduceWithWindow(changeLog: DataFrame, pks: Seq[String], seq: Column)
      : DataFrame = {
    // same guard as reduce: an empty partitionBy would funnel the whole
    // log through one task's sort
    require(pks.nonEmpty, "change-log reduction needs a primary key")
    val w = Window.partitionBy(pks.map(col): _*).orderBy(seq.desc)
    changeLog
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .filter(!(col(C.Op) <=> lit("D")))
      .drop("_rn")
      .drop(dropCols: _*)
  }
}
