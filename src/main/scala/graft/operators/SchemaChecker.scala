package graft.operators

import graft.model.{CdcColumns => C}
import org.apache.spark.sql.types.StructType

/** Schema-conformance check between a CDC parquet file set and the source
  * catalog schema.
  *
  * The reference checks LOAD files only, and only one direction: every
  * parquet column (minus the two DMS metadata columns) must exist in the
  * source catalog, else panic (src/cdc/cdc_operator.rs:170-184). Catalog
  * columns missing from the parquet file go undetected (SURVEY.md §2.3.7).
  * We check set equality BOTH ways and report, with the DMS columns and
  * our internal ordering columns allowlisted.
  */
object SchemaChecker {

  final case class SchemaReport(
      extraInParquet: Seq[String],
      missingFromParquet: Seq[String]) {
    def ok: Boolean = extraInParquet.isEmpty && missingFromParquet.isEmpty
  }

  private val Allowlist: Set[String] =
    (C.MetaColumns ++ C.InternalColumns).toSet

  def check(parquetSchema: StructType, catalogColumns: Seq[String])
      : SchemaReport = {
    val parquetCols = parquetSchema.fieldNames.toSeq.filterNot(Allowlist)
    val catalog = catalogColumns.toSet
    SchemaReport(
      extraInParquet = parquetCols.filterNot(catalog),
      missingFromParquet =
        catalogColumns.filterNot(parquetCols.toSet))
  }

  /** Reference-compatible strict mode: throw when the parquet file carries
    * columns unknown to the catalog (the only failure the reference
    * detects).
    */
  def requireSubset(parquetSchema: StructType, catalogColumns: Seq[String])
      : Unit = {
    val rep = check(parquetSchema, catalogColumns)
    require(rep.extraInParquet.isEmpty,
      s"parquet columns missing from source catalog: ${rep.extraInParquet.mkString(", ")}")
  }
}
