package graft.queries

import graft.operators.DedupIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables._

/** Build-once-per-process corpus indexes backing the `*_indexed` declared
  * queries: the first call for a scale factor materializes the index
  * under the JVM temp dir ([[DedupIndex.writeText]]/[[DedupIndex
  * .writeVectors]] over the even-id half of the table — the same corpus
  * split the recompute-form incremental queries use); every later call
  * (benchmark reps, verify reruns) only LOADS it. That split is the point
  * of the indexed queries: the probe's cost profile is batch-sized, with
  * the corpus side amortized into the one-time write.
  */
object QueryIndexes {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def dirFor(sfDir: String, kind: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md
      .digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_index_${hex}_$kind"
  }

  /** Text-dedup index over even-doc_id documents (shingleN=3, 12 hashes,
    * 4 bands, portable md5 — the exact geometry of `dedup_incremental*`).
    */
  def text(spark: SparkSession, sfDir: String): DedupIndex.TextIndex = {
    val dir = dirFor(sfDir, "text")
    built.computeIfAbsent(dir, _ => {
      DedupIndex.writeText(
        tbl(spark, sfDir, "documents").filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir)
      java.lang.Boolean.TRUE
    })
    DedupIndex.loadText(spark, dir)
  }

  /** Vector-ANN index over even-vec_id embeddings (2 hyperplanes, dim 64
    * — the exact geometry of `embed_incremental`).
    */
  def vectors(spark: SparkSession, sfDir: String): DedupIndex.VectorIndex = {
    val dir = dirFor(sfDir, "vectors")
    built.computeIfAbsent(dir, _ => {
      DedupIndex.writeVectors(
        tbl(spark, sfDir, "embeddings").filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", dir, planes = 2, dim = 64)
      java.lang.Boolean.TRUE
    })
    DedupIndex.loadVectors(spark, dir)
  }
}
