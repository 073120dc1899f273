package graft.sinks

import java.util.Properties

/** Arbitrary JDBC connection-property passthrough — the engine's form of
  * the reference's TLS options (postgres_config.rs:51-79, which surfaces
  * `accept_invalid_certs`); JDBC drivers spell the same knobs as driver
  * properties (`sslmode`, `sslrootcert`, `sslfactory`, …), so a generic
  * k=v map covers every driver rather than hard-coding one TLS dialect.
  *
  * Every driver-side connection in the engine (catalog introspection,
  * set-based sinks, partition-bound probes) and every Spark JDBC
  * reader/writer routes its extra properties through here; `user` and
  * `password` stay first-class and win over a colliding extra key.
  */
object JdbcProps {

  def toProperties(user: String, password: String,
      extra: Map[String, String] = Map.empty): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    // first-class credentials win over a colliding extra key — but a
    // BLANK first-class value (the CLI's default when --jdbc-user is
    // omitted) must not clobber credentials supplied via --jdbc-prop
    if (user.nonEmpty || !p.containsKey("user"))
      p.setProperty("user", user)
    if (password.nonEmpty || !p.containsKey("password"))
      p.setProperty("password", password)
    p
  }

  /** Parse repeated `k=v` CLI specs (`--jdbc-prop sslmode=require`). */
  def parse(specs: Seq[String]): Map[String, String] =
    specs.map { s =>
      s.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => k -> v
        case _ => sys.error(s"--jdbc-prop expects key=value, got: $s")
      }
    }.toMap
}
