package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Test-only PostgreSQL **extended-query wire protocol** (v3) endpoint
  * over the [[MiniPg]] engine — the closest in-sandbox approximation to
  * the real JDBC driver path for K5/K6: the upsert and delete shapes
  * travel a SOCKET as framed `Parse` / `Bind` / `Execute` / `Sync`
  * messages (the exact message flow org.postgresql's QueryExecutorImpl
  * sends for a prepared batch), not as string SQL into an in-process
  * call. Implements the protocol subset a prepared-statement writer
  * exercises, from the PUBLIC protocol specification (PostgreSQL docs,
  * "Frontend/Backend Protocol — Message Formats"):
  *
  *   frontend: StartupMessage, Parse('P'), Bind('B'), Execute('E'),
  *             Sync('S'), Terminate('X')
  *   backend:  AuthenticationOk('R'0), ReadyForQuery('Z'),
  *             ParseComplete('1'), BindComplete('2'),
  *             CommandComplete('C'), ErrorResponse('E')
  *
  * Like the real backend, statements parse ONCE per `Parse` (named
  * statements carry `$n` placeholders — the rewrite the JDBC driver
  * performs on `?`-SQL), binds attach text-format parameters to a
  * portal, and an error puts the connection in the aborted state until
  * `Sync`. Values travel in text format and land in the engine as
  * strings — the round-trip the spec asserts is wire-in → wire-shaped
  * state.
  */
final class MiniPgWire(dbName: String) {

  private val server = new ServerSocket(0, 8,
    InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running)
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () } // closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  // ---- backend message writers ----------------------------------------

  private def send(out: DataOutputStream, tag: Char,
      body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  private def cstr(s: String): Array[Byte] =
    s.getBytes(UTF_8) ++ Array[Byte](0)

  private def readyForQuery(out: DataOutputStream, state: Char): Unit =
    send(out, 'Z', Array(state.toByte))

  private def errorResponse(out: DataOutputStream, sqlState: String,
      msg: String): Unit =
    // severity, SQLSTATE code, message, terminator — the fields the
    // driver surfaces as PSQLException#getSQLState/getMessage
    send(out, 'E', Array[Byte]('S'.toByte) ++ cstr("ERROR") ++
      Array[Byte]('C'.toByte) ++ cstr(sqlState) ++
      Array[Byte]('M'.toByte) ++ cstr(msg) ++ Array[Byte](0))

  // ---- per-connection session ------------------------------------------

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      // StartupMessage: int32 len, int32 protocol(196608), k/v pairs
      val len = in.readInt()
      val proto = in.readInt()
      require(proto == 196608, s"unsupported protocol $proto")
      val rest = new Array[Byte](len - 8)
      in.readFully(rest)
      send(out, 'R', Array[Byte](0, 0, 0, 0)) // AuthenticationOk
      readyForQuery(out, 'I')

      // session state: named statements and portals
      val stmts = scala.collection.mutable.Map.empty[String, String] // sql
      val portals =
        scala.collection.mutable.Map.empty[String, (String, Seq[String])]
      var aborted = false

      def readCStr(b: DataInputStream): String = {
        val buf = new java.io.ByteArrayOutputStream()
        var c = b.readByte()
        while (c != 0) { buf.write(c.toInt); c = b.readByte() }
        new String(buf.toByteArray, UTF_8)
      }

      var open = true
      while (open) {
        val tag = in.readByte().toChar
        val mlen = in.readInt()
        val body = new Array[Byte](mlen - 4)
        in.readFully(body)
        val b = new DataInputStream(
          new java.io.ByteArrayInputStream(body))
        tag match {
          case 'P' if !aborted => // Parse: name, query, param type oids
            val name = readCStr(b)
            val query = readCStr(b)
            try {
              // validate NOW like the backend does (`$n` → `?` is the
              // inverse of the driver-side placeholder rewrite)
              MiniPgWire.validate(dbName, query)
              stmts(name) = query
              send(out, '1', Array.empty) // ParseComplete
            } catch {
              case e: Exception =>
                aborted = true
                errorResponse(out, "42601", e.getMessage)
            }
          case 'B' if !aborted => // Bind: portal, stmt, formats, params
            val portal = readCStr(b)
            val stmt = readCStr(b)
            val nFmt = b.readShort()
            val fmts = (0 until nFmt).map(_ => b.readShort())
            require(fmts.forall(_ == 0), "text format only")
            val nParams = b.readShort()
            val params = (0 until nParams.toInt).map { _ =>
              val plen = b.readInt()
              if (plen < 0) null
              else {
                val v = new Array[Byte](plen)
                b.readFully(v)
                new String(v, UTF_8)
              }
            }
            stmts.get(stmt) match {
              case Some(sql) =>
                portals(portal) = (sql, params)
                send(out, '2', Array.empty) // BindComplete
              case None =>
                aborted = true
                errorResponse(out, "26000",
                  s"prepared statement \"$stmt\" does not exist")
            }
          case 'E' if !aborted => // Execute: portal, row limit
            val portal = readCStr(b)
            portals.get(portal) match {
              case Some((sql, params)) =>
                try {
                  val (verb, n) = MiniPgWire.execute(dbName, sql, params)
                  val cTag =
                    if (verb == "INSERT") s"INSERT 0 $n" else s"$verb $n"
                  send(out, 'C', cstr(cTag)) // CommandComplete
                } catch {
                  case e: java.sql.SQLException =>
                    aborted = true
                    errorResponse(out,
                      Option(e.getSQLState).getOrElse("XX000"),
                      e.getMessage)
                }
              case None =>
                aborted = true
                errorResponse(out, "34000",
                  s"portal \"$portal\" does not exist")
            }
          case 'S' => // Sync: leave the aborted state, ready again
            aborted = false
            portals.clear() // portals live until end of transaction
            readyForQuery(out, 'I')
          case 'X' => open = false // Terminate
          case _ if aborted => () // skipped until Sync, per the spec
          case other =>
            aborted = true
            errorResponse(out, "08P01", s"unsupported message '$other'")
        }
      }
    } catch {
      case _: java.io.EOFException | _: java.io.IOException => ()
    } finally sock.close()
  }
}

object MiniPgWire {

  /** `$n` placeholders back to the engine's `?` form — the inverse of
    * the rewrite the JDBC driver applies when preparing `?`-SQL.
    */
  private def toEngineSql(sql: String): String =
    sql.replaceAll("\\$\\d+", "?")

  private[graft] def validate(dbName: String, sql: String): Unit = {
    execute(dbName, sql, null) // parse-only
    ()
  }

  /** Parse (and with `params != null` execute) through the MiniPg
    * engine via its public JDBC surface, so the wire path exercises the
    * SAME statement parser and ON CONFLICT semantics as the in-process
    * one. Returns (command verb, affected rows).
    */
  private[graft] def execute(dbName: String, sql: String,
      params: Seq[String]): (String, Int) = {
    MiniPg.register
    val conn = java.sql.DriverManager
      .getConnection(s"jdbc:postgresql://minipg/$dbName")
    val engineSql = toEngineSql(sql)
    val ps = conn.prepareStatement(engineSql) // throws on parse failure
    if (params == null) ("PARSE", 0)
    else {
      params.zipWithIndex.foreach { case (v, i) =>
        ps.setObject(i + 1, v)
      }
      val n = ps.executeUpdate()
      val verb = engineSql.trim.split("\\s+").head.toUpperCase
      (verb, n)
    }
  }

  /** Minimal frontend for the spec: speaks exactly the message sequence
    * the JDBC driver's prepared-batch path emits. Each call both sends
    * the frontend message and (where the protocol answers immediately)
    * asserts the backend's reply tag.
    */
  final class Client(port: Int) {
    private val sock = new Socket(InetAddress.getLoopbackAddress, port)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)

    // startup handshake: protocol 3.0 + k\\0v\\0 pairs + terminator
    locally {
      val params = cstr("user") ++ cstr("spec") ++
        cstr("database") ++ cstr("spec") ++ Array[Byte](0)
      out.writeInt(8 + params.length)
      out.writeInt(196608)
      out.write(params)
      out.flush()
      val (t1, _) = read(); require(t1 == 'R', s"expected auth, got $t1")
      val (t2, _) = read(); require(t2 == 'Z', s"expected ready, got $t2")
    }

    private def msg(tag: Char, body: Array[Byte]): Unit = {
      out.writeByte(tag)
      out.writeInt(4 + body.length)
      out.write(body)
      out.flush()
    }

    private def cstr(s: String): Array[Byte] =
      s.getBytes(UTF_8) ++ Array[Byte](0)

    /** Read one backend message: (tag, body). */
    def read(): (Char, Array[Byte]) = {
      val tag = in.readByte().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (tag, body)
    }

    def parse(name: String, dollarSql: String): Unit =
      msg('P', cstr(name) ++ cstr(dollarSql) ++ Array[Byte](0, 0))

    def bind(portal: String, stmt: String, params: Seq[String]): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.write(cstr(portal)); d.write(cstr(stmt))
      d.writeShort(0) // all-text parameter formats
      d.writeShort(params.length)
      params.foreach { p =>
        if (p == null) d.writeInt(-1)
        else {
          val b = p.getBytes(UTF_8)
          d.writeInt(b.length); d.write(b)
        }
      }
      d.writeShort(0) // all-text result formats
      msg('B', buf.toByteArray)
    }

    def execute(portal: String): Unit =
      msg('E', cstr(portal) ++ Array[Byte](0, 0, 0, 0))

    def sync(): Unit = msg('S', Array.empty)

    def terminate(): Unit = { msg('X', Array.empty); sock.close() }

    /** Read messages up to and including ReadyForQuery; returns the tag
      * sequence (e.g. "12CZ" for parse+bind+execute+sync) and the text
      * of any CommandComplete/ErrorResponse bodies.
      */
    def drainToReady(): (String, Seq[String]) = {
      val tags = new StringBuilder
      val texts = scala.collection.mutable.Buffer.empty[String]
      var done = false
      while (!done) {
        val (t, body) = read()
        tags.append(t)
        if (t == 'C')
          texts += new String(body.dropRight(1), UTF_8)
        if (t == 'E') {
          // error fields: repeated (typeByte, cstring) until a 0 byte —
          // surfaced as "S:ERROR|C:23505|M:..." for assertions
          val fields = scala.collection.mutable.Buffer.empty[String]
          var i = 0
          while (i < body.length && body(i) != 0) {
            val fType = body(i).toChar
            val end = body.indexOf(0.toByte, i + 1)
            fields += s"$fType:" + new String(body, i + 1, end - i - 1, UTF_8)
            i = end + 1
          }
          texts += fields.mkString("|")
        }
        if (t == 'Z') done = true
      }
      (tags.toString, texts.toSeq)
    }
  }
}
