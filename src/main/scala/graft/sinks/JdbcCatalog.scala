package graft.sinks

import graft.model.PgTypes
import org.apache.spark.sql.types.StructType

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Driver-side Postgres catalog introspection + DDL execution — the
  * Spark-native home of the reference's PostgresOperatorImpl catalog
  * reads (src/postgres/postgres_operator_impl.rs:51-191). These are tiny
  * metadata queries; they belong on the driver over plain java.sql, NOT
  * in a Spark job (SURVEY.md §2.1 S5-S7, K1-K3).
  *
  * Connection handling: one short-lived connection per call group via
  * `withConnection`; executors never see these. Bulk data movement goes
  * through [[JdbcSink]] instead. A Postgres JDBC driver jar must be on
  * the classpath at deploy time (not bundled here).
  */
final class JdbcCatalog(url: String, props: Properties) {

  def this(url: String, user: String, password: String,
      extraProps: Map[String, String] = Map.empty) = {
    this(url, JdbcProps.toProperties(user, password, extraProps))
  }

  def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Ordered (column, pgType) list — order matters for DDL parity
    * (reference keeps an insertion-ordered IndexMap).
    */
  def tableColumns(schema: String, table: String): Seq[(String, String)] =
    withConnection { conn =>
      val rs = conn.createStatement()
        .executeQuery(PgDdl.findAllColumns(schema, table))
      val buf = Seq.newBuilder[(String, String)]
      while (rs.next()) {
        // the reference's single normalization: ARRAY → text[]
        val dt = rs.getString(2) match {
          case "ARRAY" => "text[]"
          case other   => other
        }
        buf += rs.getString(1) -> dt
      }
      buf.result()
    }

  def tableStruct(schema: String, table: String): StructType =
    PgTypes.toStruct(tableColumns(schema, table))

  def primaryKey(schema: String, table: String): Seq[String] =
    withConnection { conn =>
      val rs = conn.createStatement()
        .executeQuery(PgDdl.findPrimaryKey(schema, table))
      val buf = Seq.newBuilder[String]
      while (rs.next()) buf += rs.getString(1)
      buf.result()
    }

  /** Table list for a schema with include/exclude applied IN the catalog
    * query (reference parity: postgres_operator_impl.rs:110-154 renders
    * the list as IN/NOT IN). Dialect-sniffed like SequenceCompare:
    * Postgres (and standards-compliant engines) read
    * `information_schema.tables`; Derby — the in-env test engine — has no
    * information_schema, so its `SYS.SYSTABLES` catalog is queried with
    * the same IN/NOT IN shape.
    */
  def tablesInSchema(schema: String, tables: Seq[String],
      exclude: Boolean): Seq[String] = {
    val sql =
      if (url.startsWith("jdbc:derby:")) {
        val base =
          s"""SELECT t.TABLENAME FROM SYS.SYSTABLES t
             |JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID
             |WHERE s.SCHEMANAME = ${PgDdl.literal(schema)} AND t.TABLETYPE = 'T'""".stripMargin
        if (tables.isEmpty) base
        else {
          val list = tables.map(PgDdl.literal).mkString(", ")
          val op = if (exclude) "NOT IN" else "IN"
          s"$base AND t.TABLENAME $op ($list)"
        }
      } else PgDdl.findTablesInSchema(schema, tables, exclude)
    withConnection { conn =>
      val rs = conn.createStatement().executeQuery(sql)
      val buf = Seq.newBuilder[String]
      while (rs.next()) buf += rs.getString(1)
      buf.result()
    }
  }

  def execute(sql: String): Unit =
    withConnection(_.createStatement().execute(sql))

  def createSchema(schema: String): Unit = execute(PgDdl.createSchema(schema))
  def dropSchema(schema: String): Unit = execute(PgDdl.dropSchema(schema))

  def createTable(schema: String, table: String, struct: StructType,
      pk: Seq[String]): Unit =
    execute(PgDdl.createTable(schema, table, struct, pk))
}
