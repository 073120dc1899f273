package graft.sources

import graft.sinks.PgDdl
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.DriverManager

/** Parallel JDBC table reads — the live-database side of `validate`
  * (reference verb at src/cdc/cdc_operator.rs:254-288, which compares a
  * source Postgres against the reconstructed target via rust-pgdatadiff).
  *
  * The Spark-native form (SURVEY.md §3.3): `spark.read.jdbc` with
  * `partitionColumn` on the primary key so a large table is pulled by
  * many executors in parallel instead of one connection. Bounds come
  * from one driver-side `MIN/MAX` probe; a non-numeric or constant key
  * falls back to a single-partition read rather than failing.
  */
object JdbcSource {

  val DefaultFetchSize = 10000

  /** Read one table. `partitionPk` names the column to range-partition
    * the pull on (normally the first PK column); pass None for a plain
    * single-connection read. `extraProps` passes arbitrary driver
    * options (TLS: `sslmode`, `sslrootcert`, …) through to the Spark
    * JDBC reader; explicit options here win over a colliding key.
    */
  def readTable(spark: SparkSession, url: String, schema: String,
      table: String, partitionPk: Option[String], user: String,
      password: String, numPartitions: Int = 8,
      extraProps: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be > 0, got $numPartitions")
    val base = spark.read.format("jdbc")
      .options(extraProps)
      .option("url", url)
      .option("dbtable", PgDdl.qualified(schema, table))
      .option("user", user)
      .option("password", password)
      .option("fetchsize", DefaultFetchSize)
    val partitioned = for {
      pkCol <- partitionPk
      (lo, hi) <- numericBounds(url, schema, table, pkCol, user, password,
        extraProps)
      if hi > lo && numPartitions > 1
    } yield base
      // BARE name: Spark resolves it against the relation schema, which
      // works on every dialect; a Postgres-style quoted form breaks
      // resolution on engines with different identifier quoting
      .option("partitionColumn", pkCol)
      .option("lowerBound", lo)
      .option("upperBound", hi)
      .option("numPartitions", numPartitions)
    partitioned.getOrElse(base).load()
  }

  /** Driver-side MIN/MAX probe for partition bounds. Returns None when
    * the column is absent, non-numeric, or the table is empty — callers
    * then read unpartitioned instead of erroring.
    */
  def numericBounds(url: String, schema: String, table: String,
      column: String, user: String, password: String,
      extraProps: Map[String, String] = Map.empty): Option[(Long, Long)] = {
    val conn = DriverManager.getConnection(url,
      graft.sinks.JdbcProps.toProperties(user, password, extraProps))
    try {
      val q = s"SELECT MIN(${PgDdl.ident(column)}), MAX(${PgDdl.ident(column)}) " +
        s"FROM ${PgDdl.qualified(schema, table)}"
      val rs = conn.createStatement().executeQuery(q)
      if (!rs.next()) None
      else {
        val lo = rs.getLong(1)
        val loNull = rs.wasNull()
        val hi = rs.getLong(2)
        if (loNull || rs.wasNull()) None else Some((lo, hi))
      }
    } catch {
      case _: java.sql.SQLException => None // non-numeric key, missing table…
    } finally conn.close()
  }
}
