package graft.sinks

import graft.model.{CdcColumns => C}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bulk writers to a JDBC target — the set-based replacement for the
  * reference's K4 (chunked multi-row INSERT,
  * postgres_operator_impl.rs:193-270) and K5/K6 (per-row upsert/delete,
  * :272-404).
  *
  * Key design shift (SURVEY.md §3.2): the engine reduces the change log
  * to FINAL STATE in Spark first, so the dominant write path is a plain
  * batched append of final rows — no per-row round trips ever. The
  * upsert path exists for incremental refreshes of an already-populated
  * target.
  */
object JdbcSink {

  val DefaultBatchSize = 10000 // the reference's rows_per_df (impl.rs:215)

  /** Append a final-state DataFrame through Spark's JDBC writer. Executor
    * parallelism = DataFrame partitions; each task batches
    * `batchsize` rows per statement.
    */
  def append(state: DataFrame, url: String, schema: String, table: String,
      user: String, password: String,
      batchSize: Int = DefaultBatchSize, maxConnections: Int = 8,
      extraProps: Map[String, String] = Map.empty): Unit = {
    val clean = state.drop(C.MetaColumns ++ C.InternalColumns: _*)
    clean.write
      .format("jdbc")
      .options(extraProps) // TLS etc. — explicit options below win
      .option("url", url)
      .option("dbtable", PgDdl.qualified(schema, table))
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      // built-in write-side cap: coalesces to ≤ maxConnections partitions
      .option("numPartitions", maxConnections)
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")
      .save()
  }

  /** Incremental upsert of reduced changes, executed in batches per
    * executor partition — contrast with the reference's one statement per
    * row. Deletes (`Op = D` rows in `reducedLog`) run as batched
    * `DELETE WHERE (pk…) = (?…)`.
    *
    * Dialects: Postgres URLs use one prepared
    * `INSERT … ON CONFLICT (pk) DO UPDATE`; every other JDBC engine gets
    * the portable two-phase form — batch-UPDATE, then batch-INSERT the
    * rows whose update count came back 0 (reducedLog has one row per key,
    * so the two phases never race within a batch).
    *
    * Update counts are interpreted as MATCHED rows (the JDBC default).
    * Drivers configured to report CHANGED rows instead (e.g. MySQL with
    * `useAffectedRows=true`) return 0 for a matched-but-identical update,
    * mis-routing live rows to phase two; duplicate-key failures there are
    * therefore recovered row-by-row (insert if absent, re-update if
    * present) instead of failing the batch.
    *
    * Feed contract: `ChangeLogReducer.reduceKeepOp` output (last event
    * per key INCLUDING delete tombstones, `Op` retained).
    */
  def upsert(reducedLog: DataFrame, url: String, schema: String,
      table: String, pk: Seq[String], user: String, password: String,
      batchSize: Int = DefaultBatchSize,
      extraProps: Map[String, String] = Map.empty): Unit = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    val dataCols = reducedLog.columns.toSeq
      .filterNot((C.MetaColumns ++ C.InternalColumns).contains)
    val deleteSql = PgDdl.deleteByPk(schema, table, pk)
    val opIdx = reducedLog.columns.indexOf(C.Op)
    require(opIdx >= 0, s"upsert needs the ${C.Op} column to route deletes " +
      s"(feed it ChangeLogReducer.reduceKeepOp output)")
    val colIdx = dataCols.map(c => reducedLog.columns.indexOf(c))
    val pkIdx = pk.map(c => reducedLog.columns.indexOf(c))
    val nonPkIdx = dataCols.filterNot(pk.contains)
      .map(c => reducedLog.columns.indexOf(c))
    val pgStyle = url.startsWith("jdbc:postgresql:")
    val upsertSql = PgDdl.upsert(schema, table, dataCols, pk)
    val updateSql =
      if (nonPkIdx.isEmpty) "" else PgDdl.updateByPk(schema, table, dataCols, pk)
    val insertSql = PgDdl.insert(schema, table, dataCols)

    reducedLog.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = java.sql.DriverManager.getConnection(url,
          JdbcProps.toProperties(user, password, extraProps))
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(deleteSql)
          var nDel = 0
          def bindPk(st: java.sql.PreparedStatement, row: org.apache.spark.sql.Row,
              offset: Int): Unit =
            pkIdx.zipWithIndex.foreach { case (src, i) =>
              st.setObject(offset + i + 1, row.get(src))
            }

          if (pgStyle) {
            val up = conn.prepareStatement(upsertSql)
            var nUp = 0
            rows.foreach { row =>
              if (row.getString(opIdx) == C.OpDelete) {
                bindPk(del, row, 0)
                del.addBatch(); nDel += 1
                if (nDel % batchSize == 0) del.executeBatch()
              } else {
                colIdx.zipWithIndex.foreach { case (src, i) =>
                  up.setObject(i + 1, row.get(src))
                }
                up.addBatch(); nUp += 1
                if (nUp % batchSize == 0) up.executeBatch()
              }
            }
            up.executeBatch()
          } else {
            val upd = if (nonPkIdx.isEmpty) null
              else conn.prepareStatement(updateSql)
            val ins = conn.prepareStatement(insertSql)
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            def bindInsert(row: org.apache.spark.sql.Row): Unit = {
              colIdx.zipWithIndex.foreach { case (src, i) =>
                ins.setObject(i + 1, row.get(src))
              }
              ins.addBatch()
            }
            // SQLState class 23 = integrity-constraint violation, walked
            // through the chain (BatchUpdateException nests the cause)
            def dupKey(e: java.sql.SQLException): Boolean =
              Iterator.iterate(e)(_.getNextException)
                .takeWhile(_ != null).take(8)
                .exists(x => Option(x.getSQLState).exists(_.startsWith("23")))
            def flush(): Unit = {
              if (nonPkIdx.isEmpty) {
                // PK-only table: delete+insert is the idempotent upsert
                buf.foreach { row => bindPk(del, row, 0); del.addBatch() }
                del.executeBatch()
                buf.foreach(bindInsert)
                ins.executeBatch()
              } else {
                buf.foreach { row =>
                  nonPkIdx.zipWithIndex.foreach { case (src, i) =>
                    upd.setObject(i + 1, row.get(src))
                  }
                  bindPk(upd, row, nonPkIdx.length)
                  upd.addBatch()
                }
                val counts = upd.executeBatch()
                val insRows = scala.collection.mutable.ArrayBuffer
                  .empty[org.apache.spark.sql.Row]
                buf.iterator.zip(counts.iterator).foreach { case (row, n) =>
                  // drivers configured to continue on batch errors report
                  // EXECUTE_FAILED instead of throwing — that must surface,
                  // not read as "updated"
                  if (n == java.sql.Statement.EXECUTE_FAILED)
                    throw new java.sql.SQLException(
                      s"batched UPDATE failed for a row of $schema.$table")
                  val missed =
                    if (n == java.sql.Statement.SUCCESS_NO_INFO) {
                      // driver hides batch counts: re-check this row alone
                      nonPkIdx.zipWithIndex.foreach { case (src, i) =>
                        upd.setObject(i + 1, row.get(src))
                      }
                      bindPk(upd, row, nonPkIdx.length)
                      upd.executeUpdate() == 0
                    } else n == 0
                  if (missed) { bindInsert(row); insRows += row }
                }
                try ins.executeBatch()
                catch {
                  case e: java.sql.BatchUpdateException if dupKey(e) =>
                    // a changed-rows driver (scaladoc above) sent live rows
                    // here; which batch entries applied is driver-specific,
                    // so recover row-by-row — insert if absent, re-update
                    // (idempotent) if present
                    ins.clearBatch()
                    insRows.foreach { row =>
                      try {
                        colIdx.zipWithIndex.foreach { case (src, i) =>
                          ins.setObject(i + 1, row.get(src))
                        }
                        ins.executeUpdate()
                      } catch {
                        case e2: java.sql.SQLException if dupKey(e2) =>
                          nonPkIdx.zipWithIndex.foreach { case (src, i) =>
                            upd.setObject(i + 1, row.get(src))
                          }
                          bindPk(upd, row, nonPkIdx.length)
                          // class 23 covers MORE than duplicate keys (FK,
                          // NOT NULL, CHECK). Only an actually-present row
                          // proves this was a dup-key mis-route; 0 matched
                          // means a genuine constraint violation — rethrow,
                          // never swallow the row
                          if (upd.executeUpdate() == 0) throw e2
                      }
                    }
                }
              }
              buf.clear()
            }
            rows.foreach { row =>
              if (row.getString(opIdx) == C.OpDelete) {
                bindPk(del, row, 0)
                del.addBatch(); nDel += 1
                if (nDel % batchSize == 0) del.executeBatch()
              } else {
                buf += row
                if (buf.length >= batchSize) flush()
              }
            }
            flush()
          }
          del.executeBatch()
          conn.commit()
        } finally conn.close()
    }
  }

  /** Reconstructed-state parquet sink (the file-side alternative target,
    * used by tests and by validate-against-parquet flows). Partitioned
    * writes keep downstream PK-joins shuffle-friendly.
    */
  def writeParquet(state: DataFrame, path: String,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    val w = state.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
