package graft

import java.sql.{Connection, Driver, DriverManager, PreparedStatement}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** Test-only in-memory JDBC engine that REGISTERS for
  * `jdbc:postgresql://minipg/...` URLs and executes the exact statement
  * shapes `JdbcSink.upsert`'s Postgres branch emits — so the pgStyle
  * code path (URL dispatch → DriverManager → prepared
  * `INSERT … ON CONFLICT (pk) DO UPDATE/DO NOTHING` + batched
  * `DELETE … WHERE pk = ?`, reference
  * postgres_operator_impl.rs:357-378) runs for real in tests instead of
  * stopping at golden strings. Derby (the live-JDBC test engine) cannot
  * parse ON CONFLICT, and no Postgres server or driver exists in the
  * sandbox; this engine implements the documented ON CONFLICT semantics:
  * absent key → insert; present key → update non-PK columns from
  * EXCLUDED (or skip entirely under DO NOTHING).
  *
  * Scope is deliberately tiny: prepared-statement execute/batch of the
  * three sink statements, per-table synchronized state, keyed by PK.
  * Unknown SQL or JDBC calls throw — a sink regression that emits a new
  * shape fails loudly rather than silently passing.
  */
object MiniPg {

  final class Table(val columns: Seq[String], val pk: Seq[String]) {
    // pk values -> full row (column order = columns)
    val rows: mutable.LinkedHashMap[List[Any], List[Any]] =
      mutable.LinkedHashMap.empty
  }

  private val dbs = TrieMap.empty[String, TrieMap[String, Table]]

  private def db(name: String): TrieMap[String, Table] =
    dbs.getOrElseUpdate(name, TrieMap.empty)

  /** Create (or replace) a table; `qualified` as `schema.table`. */
  def createTable(dbName: String, qualified: String, columns: Seq[String],
      pk: Seq[String]): Unit =
    db(dbName).put(qualified, new Table(columns, pk))

  /** Current contents as (column -> value) maps, insertion-ordered. */
  def tableRows(dbName: String, qualified: String): Seq[Map[String, Any]] = {
    val t = db(dbName)(qualified)
    t.synchronized {
      t.rows.values.map(r => t.columns.zip(r).toMap).toSeq
    }
  }

  def clear(): Unit = dbs.clear()

  private val UrlPrefix = "jdbc:postgresql://minipg/"

  /** Register the driver once (idempotent). */
  lazy val register: Unit = DriverManager.registerDriver(new MiniPgDriver)

  // ---- statement shapes (PgDdl.upsert / PgDdl.deleteByPk) ----

  private val InsertRe =
    ("""INSERT INTO "([^"]+)"\."([^"]+)" \(([^)]*)\) VALUES \(([?, ]*)\)""" +
      """(?: ON CONFLICT \(([^)]*)\) (DO NOTHING|DO UPDATE SET .*))?""").r
  private val DeleteRe =
    """DELETE FROM "([^"]+)"\."([^"]+)" WHERE (.*)""".r
  private val IdentRe = "\"([^\"]+)\"".r

  private def idents(s: String): Seq[String] =
    IdentRe.findAllMatchIn(s).map(_.group(1)).toSeq

  private sealed trait Stmt { def nParams: Int }
  private final case class Upsert(table: Table, cols: Seq[String],
      conflictPk: Seq[String], doNothing: Boolean, setCols: Seq[String])
      extends Stmt { def nParams: Int = cols.length }
  private final case class Delete(table: Table, pkCols: Seq[String])
      extends Stmt { def nParams: Int = pkCols.length }

  private def parse(dbName: String, sql: String): Stmt = sql match {
    case InsertRe(schema, table, colList, _, conflict, action) =>
      val t = db(dbName).getOrElse(s"$schema.$table",
        throw new java.sql.SQLException(s"no such table $schema.$table"))
      val cols = idents(colList)
      require(cols.sorted == t.columns.sorted,
        s"column set mismatch: $cols vs ${t.columns}")
      if (conflict == null)
        Upsert(t, cols, Seq.empty, doNothing = false, Seq.empty)
      else {
        val pk = idents(conflict)
        require(pk == t.pk, s"ON CONFLICT ($pk) does not match PK ${t.pk}")
        val nothing = action == "DO NOTHING"
        val sets =
          if (nothing) Seq.empty
          else IdentRe.findAllMatchIn(action.stripPrefix("DO UPDATE SET "))
            .map(_.group(1)).toSeq.grouped(2).map { g =>
              // each assignment is "c" = EXCLUDED."c"
              require(g.head == g(1), s"non-EXCLUDED assignment in: $action")
              g.head
            }.toSeq
        Upsert(t, cols, pk, nothing, sets)
      }
    case DeleteRe(schema, table, cond) =>
      val t = db(dbName).getOrElse(s"$schema.$table",
        throw new java.sql.SQLException(s"no such table $schema.$table"))
      val pk = idents(cond)
      require(pk == t.pk, s"DELETE condition $pk does not match PK ${t.pk}")
      Delete(t, pk)
    case other =>
      throw new java.sql.SQLException(s"MiniPg cannot parse: $other")
  }

  private def executeOne(st: Stmt, params: IndexedSeq[Any]): Int = st match {
    case Upsert(t, cols, conflictPk, doNothing, setCols) =>
      val byName = cols.zip(params).toMap
      val key = t.pk.map(byName).toList
      t.synchronized {
        t.rows.get(key) match {
          case None =>
            t.rows.put(key, t.columns.map(byName).toList); 1
          case Some(_) if conflictPk.isEmpty =>
            // plain INSERT on an existing key = duplicate-key violation,
            // exactly what a real engine raises (SQLState class 23)
            throw new java.sql.SQLException(
              s"duplicate key value violates unique constraint", "23505")
          case Some(_) if doNothing => 0
          case Some(existing) =>
            val old = t.columns.zip(existing).toMap
            val next = t.columns.map(c =>
              if (setCols.contains(c)) byName(c) else old(c))
            t.rows.put(key, next.toList); 1
        }
      }
    case Delete(t, pkCols) =>
      val key = pkCols.zip(params).toMap
      t.synchronized {
        if (t.rows.remove(t.pk.map(key).toList).isDefined) 1 else 0
      }
  }

  // ---- JDBC surface via dynamic proxies (fail-loud on anything else) ----

  private def proxy[T](iface: Class[T])(
      handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(iface.getClassLoader,
      Array[Class[_]](iface),
      (_: AnyRef, m: java.lang.reflect.Method, args: Array[AnyRef]) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        handle.applyOrElse((m.getName, a),
          (x: (String, Array[AnyRef])) => m.getName match {
            // harmless lifecycle no-ops the sink calls
            case "close" | "commit" | "setAutoCommit" | "clearParameters" =>
              null
            case "isClosed" => java.lang.Boolean.FALSE
            case _ => throw new UnsupportedOperationException(
              s"MiniPg ${iface.getSimpleName}.${x._1}")
          })
      }).asInstanceOf[T]

  private def prepared(dbName: String, sql: String): PreparedStatement = {
    val stmt = parse(dbName, sql)
    val params = new Array[Any](stmt.nParams)
    val batch = mutable.ArrayBuffer.empty[IndexedSeq[Any]]
    proxy(classOf[PreparedStatement]) {
      case ("setObject", Array(i: Integer, v)) =>
        params(i - 1) = v; null
      case ("addBatch", _) =>
        batch += params.toIndexedSeq; null
      case ("clearBatch", _) => batch.clear(); null
      case ("executeBatch", _) =>
        val counts = batch.map(p => executeOne(stmt, p)).toArray
        batch.clear()
        counts
      case ("executeUpdate", _) =>
        Integer.valueOf(executeOne(stmt, params.toIndexedSeq))
    }
  }

  final class MiniPgDriver extends Driver {
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith(UrlPrefix)
    override def connect(url: String, info: java.util.Properties)
        : Connection =
      if (!acceptsURL(url)) null
      else {
        val dbName = url.stripPrefix(UrlPrefix)
        proxy(classOf[Connection]) {
          case ("prepareStatement", Array(sql: String)) =>
            prepared(dbName, sql)
        }
      }
    override def getMajorVersion: Int = 0
    override def getMinorVersion: Int = 1
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }
}
