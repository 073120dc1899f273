package graft.sources

import graft.sinks.PgDdl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequence compare (SURVEY.md §2.1 D3): diff the current values of the
  * database sequences in a schema between two live databases.
  *
  * The reference delegates validation to a diff library that supports
  * sequence comparison but always disables it
  * (src/cdc/cdc_operator.rs:271, `only-sequences = false`); this is the
  * Spark-native form of the capability, completing the §2.1 inventory.
  *
  * Sequence catalogs are metadata (one row per sequence), so each side
  * is a single-partition JDBC read of the dialect's catalog view —
  * Postgres `pg_sequences.last_value`, Derby
  * `SYS.SYSSEQUENCES.CURRENTVALUE` — joined full-outer on the sequence
  * name: missing-on-either-side and value drift both surface, mirroring
  * the row-diff report shape (`DiffEngine.compareDigests`).
  */
object SequenceCompare {

  /** Dialect-specific catalog subquery yielding (seq_name, seq_value). */
  def catalogQuery(url: String, schema: String): String =
    if (url.startsWith("jdbc:postgresql:"))
      s"""(SELECT sequencename AS seq_name,
         |       last_value AS seq_value
         |FROM pg_sequences
         |WHERE schemaname = ${PgDdl.literal(schema)}) AS seqs""".stripMargin
    else if (url.startsWith("jdbc:derby:"))
      // SYSCS_PEEK_AT_SEQUENCE, not SYSSEQUENCES.CURRENTVALUE: Derby
      // preallocates value chunks, so CURRENTVALUE tracks the chunk
      // boundary (+100 per allocation) while peek returns the true next
      // value — the comparable position
      s"""(SELECT s.SEQUENCENAME AS seq_name,
         |       SYSCS_UTIL.SYSCS_PEEK_AT_SEQUENCE(sc.SCHEMANAME, s.SEQUENCENAME)
         |         AS seq_value
         |FROM SYS.SYSSEQUENCES s
         |JOIN SYS.SYSSCHEMAS sc ON s.SCHEMAID = sc.SCHEMAID
         |WHERE sc.SCHEMANAME = ${PgDdl.literal(schema)}) AS seqs""".stripMargin
    else
      sys.error(s"sequence compare: unsupported JDBC dialect in $url " +
        "(postgresql and derby catalogs are wired)")

  private def readSide(spark: SparkSession, url: String, schema: String,
      user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", catalogQuery(url, schema))
      .option("user", user)
      .option("password", password)
      .load()
      .select(col("seq_name").cast("string").as("seq_name"),
        col("seq_value").cast("long").as("seq_value"))

  /** One row per sequence present on either side:
    * (seq_name, expected_value, target_value, ok).
    */
  def compare(spark: SparkSession, expectedUrl: String, targetUrl: String,
      schema: String, user: String = "", password: String = ""): DataFrame = {
    // same-dialect only: the two catalogs report different positions
    // (pg last_value = last allocated; Derby peek = next to allocate),
    // so a cross-dialect compare would be off by one increment per side
    def dialect(u: String) = u.split(":").take(2).mkString(":")
    require(dialect(expectedUrl) == dialect(targetUrl),
      s"sequence compare requires same-dialect URLs, got " +
        s"${dialect(expectedUrl)} vs ${dialect(targetUrl)}")
    val e = readSide(spark, expectedUrl, schema, user, password)
      .withColumnRenamed("seq_value", "expected_value")
    val t = readSide(spark, targetUrl, schema, user, password)
      .withColumnRenamed("seq_value", "target_value")
    e.join(t, Seq("seq_name"), "full_outer")
      .withColumn("ok", col("expected_value") <=> col("target_value"))
      .orderBy(col("seq_name"))
  }
}
