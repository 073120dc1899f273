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
    *
    * The write REPARTITIONS on the bucket columns with numPartitions ==
    * numBuckets first: Spark's bucket assignment and
    * `repartition(n, cols)` share the same partition-id expression
    * (Murmur3 hash pmod n), so after the exchange each task holds
    * exactly one bucket and the component lands exactly ≤ numBuckets
    * files — WITHOUT it, a bucketed write emits up to
    * tasks × buckets-per-task files (measured: a 16384-bucket component
    * written by 32 tasks headed for ~500k files), which at
    * 1000-executor scale is the classic bucketed-write file explosion
    * that melts the namenode/list calls. One extra hash exchange per
    * component write is the standard price of file-count control; for
    * the staged CDC absorbs the exchanged data is batch-sized anyway.
    */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    df.repartition(numBuckets, bucketCols.map(col): _*)
      .write
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

  /** Skew-SPLIT equi-join — the production fix for CDC-shaped skew,
    * where the right side holds ONE row per key (a dimension / current
    * state) and a handful of keys dominate the left: route the hot
    * keys' rows through a broadcast join (the right side restricted to
    * hot keys is tiny by construction) and everything else through the
    * stock shuffle join. Equals the plain join for left-preserving join
    * types; no replication of the full right side (the cost that makes
    * blanket salting LOSE below the scale where one key overflows a
    * task — measured in dev/BENCH_NOTES.md).
    *
    * @param hotKeys small DataFrame holding the hot key tuples (e.g.
    *        `skewReport(left, keys).filter($"share" > 0.05)`); must be
    *        driver-bounded — it is broadcast three times
    */
  def skewSplitJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      hotKeys: DataFrame, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"skewSplitJoin supports left-preserving joins only (got $joinType)")
    val h = broadcast(hotKeys.select(keys.map(col): _*).distinct())
    val cold = left.join(h, keys, "left_anti")
      .join(right, keys, joinType)
    val hot = left.join(h, keys, "left_semi")
      .join(broadcast(right.join(h, keys, "left_semi")), keys, joinType)
    cold.unionByName(hot)
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
