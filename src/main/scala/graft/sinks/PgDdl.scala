package graft.sinks

import graft.model.PgTypes
import org.apache.spark.sql.types.StructType

/** Postgres SQL text generation — the engine-side equivalent of the
  * reference's query builders (src/postgres/table_query.rs:1-101, spec'd
  * by its golden-string tests at table_query.rs:103-195).
  *
  * Differences, by design (SURVEY.md §2.3.9): identifiers are always
  * double-quoted (the reference interpolates them raw), and the DDL type
  * map comes from PgTypes rather than passing catalog strings through.
  */
object PgDdl {

  /** Quote an identifier, escaping embedded quotes. */
  def ident(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** Escape a string LITERAL (single-quote doubling) — catalog queries
    * embed schema/table names as literals, which must not break on names
    * containing quotes.
    */
  def literal(s: String): String = "'" + s.replace("'", "''") + "'"

  def qualified(schema: String, table: String): String =
    s"${ident(schema)}.${ident(table)}"

  /** information_schema scan for a table's ordered columns (reference:
    * FindAllColumns, table_query.rs:17-26).
    */
  def findAllColumns(schema: String, table: String): String =
    s"""SELECT column_name, data_type
       |FROM information_schema.columns
       |WHERE table_schema = ${literal(schema)} AND table_name = ${literal(table)}
       |ORDER BY ordinal_position""".stripMargin

  /** Primary-key columns via pg_index (reference: FindPrimaryKey,
    * table_query.rs:48-60).
    */
  def findPrimaryKey(schema: String, table: String): String =
    // regclass literal uses QUOTED identifiers so mixed-case/special
    // names resolve (an unquoted regclass literal would lowercase them)
    s"""SELECT a.attname
       |FROM pg_index i
       |JOIN pg_attribute a ON a.attrelid = i.indrelid
       |  AND a.attnum = ANY(i.indkey)
       |WHERE i.indrelid = ${literal(s"${ident(schema)}.${ident(table)}")}::regclass
       |  AND i.indisprimary
       |ORDER BY array_position(i.indkey, a.attnum)""".stripMargin

  /** Table list with include/exclude mode (reference: FindTablesForSchema,
    * table_query.rs:27-35 + mode resolution snapshot_payload.rs:75-83).
    */
  def findTablesInSchema(schema: String, tables: Seq[String],
      exclude: Boolean): String = {
    val base =
      s"""SELECT table_name FROM information_schema.tables
         |WHERE table_schema = ${literal(schema)} AND table_type = 'BASE TABLE'""".stripMargin
    if (tables.isEmpty) base
    else {
      val list = tables.map(literal).mkString(", ")
      val op = if (exclude) "NOT IN" else "IN"
      s"$base AND table_name $op ($list)"
    }
  }

  /** Idempotent schema creation (reference: CreateSchema,
    * table_query.rs:62-71).
    */
  def createSchema(schema: String): String =
    s"CREATE SCHEMA IF NOT EXISTS ${ident(schema)}"

  /** Cleanup (reference: DropSchema, table_query.rs:89-98). */
  def dropSchema(schema: String): String =
    s"DROP SCHEMA IF EXISTS ${ident(schema)} CASCADE"

  /** CREATE TABLE from a Spark schema, with PRIMARY KEY clause omitted
    * when no key columns (reference: CreateTable, table_query.rs:73-87 —
    * ordered columns, PK appended last).
    */
  def createTable(schema: String, table: String, structType: StructType,
      primaryKey: Seq[String]): String = {
    val cols = structType.fields.map { f =>
      s"${ident(f.name)} ${PgTypes.toPg(f.dataType)}"
    }
    val pk =
      if (primaryKey.isEmpty) Seq.empty
      else Seq(s"PRIMARY KEY (${primaryKey.map(ident).mkString(", ")})")
    s"CREATE TABLE IF NOT EXISTS ${qualified(schema, table)} (" +
      (cols ++ pk).mkString(", ") + ")"
  }

  /** Parameterized delete by composite PK (reference: DeleteRows,
    * table_query.rs:37-47 — which interpolates values; we emit a
    * placeholder form for PreparedStatement batching).
    */
  def deleteByPk(schema: String, table: String, pk: Seq[String]): String = {
    val cond = pk.map(c => s"${ident(c)} = ?").mkString(" AND ")
    s"DELETE FROM ${qualified(schema, table)} WHERE $cond"
  }

  /** Upsert (INSERT … ON CONFLICT (pk) DO UPDATE) placeholder form —
    * the reference builds this per ROW with literal values
    * (postgres_operator_impl.rs:357-378); we emit it once and batch-bind.
    */
  def upsert(schema: String, table: String, columns: Seq[String],
      pk: Seq[String]): String = {
    val collist = columns.map(ident).mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    val updates = columns.filterNot(pk.contains)
      .map(c => s"${ident(c)} = EXCLUDED.${ident(c)}").mkString(", ")
    val conflict =
      if (updates.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET $updates"
    s"INSERT INTO ${qualified(schema, table)} ($collist) VALUES ($params) " +
      s"ON CONFLICT (${pk.map(ident).mkString(", ")}) $conflict"
  }

  /** Parameterized UPDATE of non-PK columns by composite PK — one half of
    * the portable (non-Postgres) upsert: UPDATE the batch, then INSERT the
    * rows whose update count was 0.
    */
  def updateByPk(schema: String, table: String, columns: Seq[String],
      pk: Seq[String]): String = {
    val sets = columns.filterNot(pk.contains)
      .map(c => s"${ident(c)} = ?").mkString(", ")
    val cond = pk.map(c => s"${ident(c)} = ?").mkString(" AND ")
    s"UPDATE ${qualified(schema, table)} SET $sets WHERE $cond"
  }

  def insert(schema: String, table: String, columns: Seq[String]): String = {
    val collist = columns.map(ident).mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    s"INSERT INTO ${qualified(schema, table)} ($collist) VALUES ($params)"
  }
}
