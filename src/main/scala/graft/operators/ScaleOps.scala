package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical-layout tools for the 100 TB tier: bucketing (co-located,
  * shuffle-free PK joins — the layout a CDC validation pipeline wants for
  * its repeated source-vs-target joins) and explicit skew salting (for
  * the hot-key joins AQE's skew handling can't fully split, e.g. a
  * single degenerate join key).
  */
object ScaleOps {

  /** Persist a DataFrame as a bucketed+sorted table. Two tables bucketed
    * the same way join WITHOUT any Exchange — at 100 TB that turns every
    * incremental validation run's big join into a local zip per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** [[writeBucketed]] at an EXPLICIT directory (external table): the
    * data outlives the session catalog, so another session can re-attach
    * to the same bucketed layout — the persistence contract behind
    * [[DedupIndex]].
    */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join with explicit key salting: the skewed LEFT side gets a
    * deterministic salt derived from its whole row, the (smaller) RIGHT
    * side is replicated across all salt values. Result equals the plain
    * join; the shuffle spreads each hot key over `saltFactor` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each unmatched RIGHT row once per salt
    // replica — only left-preserving join types keep plain-join equality
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
      .contains(joinType.toLowerCase),
      s"saltedJoin does not support right/full outer joins (got $joinType)")
    val saltSrc = left.columns.map(col).toSeq
    val l = left.withColumn("_salt",
      pmod(xxhash64(saltSrc: _*), lit(saltFactor)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Per-key frequency report for join-skew diagnosis: top `limit` keys
    * by row count with their share of the table.
    */
  def skewReport(df: DataFrame, keys: Seq[String], limit: Int = 20)
      : DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(limit)
  }
}
