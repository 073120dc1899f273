package graft.model

/** Constants and config for the DMS-style CDC change-log contract.
  *
  * The reference consumes AWS-DMS Parquet files that carry two metadata
  * columns ahead of the business columns: `Op` (I/U/D) and
  * `_dms_ingestion_timestamp` (reference: src/cdc/cdc_operator.rs:178,
  * src/postgres/postgres_operator_impl.rs:201-204). The reference matches
  * them positionally (`skip(2)`); we match strictly by name, which is
  * behavior-identical for well-formed DMS output (SURVEY.md §2.3.3).
  */
object CdcColumns {
  val Op = "Op"
  val IngestTs = "_dms_ingestion_timestamp"
  val MetaColumns: Seq[String] = Seq(Op, IngestTs)

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Internal ordering/provenance columns attached by ChangeLogReader. */
  val FilePath = "_cdc_file_path"
  val RowIndex = "_cdc_row_index"
  val IsLoad = "_cdc_is_load"
  val InternalColumns: Seq[String] = Seq(FilePath, RowIndex, IsLoad)
}

/** File-listing mode, mirroring the reference's three listing strategies
  * (src/s3/s3_operator.rs:131-202, LoadParquetFilesPayload variants):
  *  - DateAware: all LOAD* files (regardless of date) + CDC files whose
  *    modification time falls in (start, stop) — LOAD files always pass
  *    the date filter (src/s3/s3_operator.rs:251,256).
  *  - FullLoadOnly: only LOAD* files.
  *  - AbsolutePath: exactly one file.
  */
sealed trait ListingMode
object ListingMode {
  final case class DateAware(startMillis: Long, stopMillis: Option[Long])
      extends ListingMode
  case object FullLoadOnly extends ListingMode
  final case class AbsolutePath(path: String) extends ListingMode
}

/** One discovered CDC parquet file. `isLoad` mirrors the reference's
  * `S3ParquetFile::is_load_file` (name contains "LOAD",
  * src/s3/s3_operator.rs:43-45).
  */
final case class CdcFile(path: String, isLoad: Boolean, mtimeMillis: Long,
    sizeBytes: Long)

/** Per-table job spec: where the table's CDC folder lives and its primary
  * key. Composite PKs stay a Seq — never concatenated into one string
  * (SURVEY.md §7.3; the reference concatenates at cdc_operator.rs:200).
  */
final case class TableSpec(name: String, dir: String, primaryKey: Seq[String])
