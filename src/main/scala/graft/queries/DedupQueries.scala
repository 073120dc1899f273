package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Deduplication operators over the `documents` table (LLM-data-pipeline
  * north star). Portable md5 hashing so every result is oracle-checkable.
  */
object DedupQueries {

  /** Exact dedup: content-hash groups with a canonical (min) doc id.
    * Single hash-shuffle; at 100 TB this is the standard
    * hash-partition-by-digest dedup.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy(col("doc_id"))
  }

  def exactSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
