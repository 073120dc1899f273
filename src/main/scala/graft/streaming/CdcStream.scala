package graft.streaming

import graft.model.{CdcColumns => C}
import graft.operators.ChangeLogReducer
import graft.sources.ChangeLogReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous CDC replay — the Structured Streaming extension hook the
  * reference lacks (SURVEY.md §2.2 "streaming: ABSENT — batch-only").
  *
  * Model: the DMS folder is a file stream; every micro-batch is a slice
  * of the change log. `foreachBatch` merges each slice into the target
  * parquet state with the SAME set-based reduction used in batch mode —
  * union(current_state_as_inserts, new_events) → last-event-wins. State
  * transitions are therefore identical to a full batch replay at every
  * point (tested against the batch reducer).
  *
  * Scale: each micro-batch shuffles only on touched PKs; the rewrite of
  * the state parquet is the simple-and-correct form (a production deploy
  * would swap the sink for a merge-capable table format — the reduce
  * logic is sink-agnostic).
  */
object CdcStream {

  /** File-source change stream with the same ordering columns the batch
    * reader attaches.
    */
  def changeStream(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)
    ChangeLogReader.withOrdering(raw)
  }

  /** Start continuous replay into a parquet state dir. Each micro-batch:
    * read current state (if any) → stamp it as the earliest events →
    * append the batch slice (which carries real ordering) → reduce.
    */
  def startReplay(spark: SparkSession, stream: DataFrame, pks: Seq[String],
      stateDir: String, checkpointDir: String): StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(spark, batch, pks, stateDir)
      }
      .start()
  }

  /** One merge step; also the unit the tests drive directly. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, pks: Seq[String],
      stateDir: String): Unit = {
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    // resolve the filesystem FROM the path — stateDir may live on a
    // different FS (s3a, abfs) than fs.defaultFS
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState = fs.exists(statePath)

    val events = batch.withColumn("_b_seq", ChangeLogReader.eventSeq(batch))
    val dataCols = batch.columns.toSeq
      .filterNot((C.MetaColumns ++ C.InternalColumns).contains)

    val combined =
      if (!hasState) events
      else {
        // current state re-enters as rank-(-1) inserts: any real event in
        // this batch outranks it, absent keys survive unchanged
        val st = spark.read.parquet(stateDir)
        val asInserts = st
          .withColumn(C.Op, lit(C.OpInsert))
          .withColumn(C.IngestTs, lit(""))
          .withColumn(C.FilePath, lit(""))
          .withColumn(C.RowIndex, lit(0L))
          .withColumn(C.IsLoad, lit(true))
        val stamped = asInserts.withColumn("_b_seq",
          struct(lit(-1).as("load_rank"), lit("").as("file_path"),
            lit(0L).as("row_index")))
        stamped.select(events.columns.toIndexedSeq.map(col): _*)
          .unionByName(events)
      }

    val newState = ChangeLogReducer.reduce(combined, pks, col("_b_seq"))
      .drop("_b_seq")
      .select(dataCols.map(col): _*)

    // rewrite via temp dir (parquet has no atomic overwrite-while-reading)
    val tmp = stateDir + "__tmp"
    newState.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(stateDir)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Event for the stateful sessionizer. */
  final case class SessEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  /** Cross-batch state: last seen event time + current session ordinal. */
  final case class SessState(lastTsMicros: Long, sessionOrd: Long)

  /** Session assignment emitted per event. */
  final case class SessAssign(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, session_ord: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState: a
    * gap > `gapSeconds` of event-time silence per user starts a new
    * session; state (last ts, session ordinal) survives across
    * micro-batches, so a session spanning two triggers keeps its
    * ordinal — the custom-state capability the batch `q_sessionize`
    * cannot express incrementally.
    *
    * Within a batch, a group's events are sorted by (ts, event_id)
    * before folding — the file source guarantees no cross-batch
    * reordering per key here; production deployments add a watermark +
    * event-time timeout to bound state.
    */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessEvent],
      gapSeconds: Long)
      : org.apache.spark.sql.Dataset[SessAssign] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
          val out = sorted.map { e =>
            val tsMicros = e.ts.getTime * 1000L
            val isNew = st.lastTsMicros == Long.MinValue ||
              tsMicros - st.lastTsMicros > gapSeconds * 1000000L
            st = SessState(tsMicros,
              if (isNew) st.sessionOrd + 1 else st.sessionOrd)
            SessAssign(user, e.event_id, e.ts, st.sessionOrd)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming windowed aggregation over an event stream (watermark +
    * tumbling window) — mirrors the batch q_event_windows so stream and
    * batch results can be asserted equal.
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
      window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window)
        .as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("win_start"), col(typeCol), col("n"),
        col("total_value"))
}
