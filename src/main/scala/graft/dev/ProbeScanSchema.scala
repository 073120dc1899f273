package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe: does the FLOAT indexed probe's scan of the fmt-3
  * `buckets/` table (which also carries `codes` + `rnorm` for the SQ8
  * probe) prune the code columns? Adjudicates the round-8 bench outlier
  * `embed_incremental_indexed` — if the catalog bucketed-table path
  * reads all six columns, every float probe pays the SQ8 payload too.
  */
object ProbeScanSchema {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe-vidx").toString
    val dim = 8
    val vecs = (0L until 500L).map { i =>
      (i, Array.tabulate(dim)(d => ((i * 31 + d * 7) % 13).toFloat / 13f))
    }.toDF("emb_id", "emb")
    graft.operators.DedupIndex.writeVectors(
      vecs, "emb_id", "emb", dir, planes = 4, dim = dim, numBuckets = 4)
    val idx = graft.operators.DedupIndex.loadVectors(spark, dir)
    val batch = vecs.filter(col("emb_id") % 7 === 0)
    val probe = graft.operators.Similarity
      .incrementalCosineNearDupsIndexed(batch, "emb_id", "emb", idx, 0.9)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    println("=== float probe scan lines ===")
    plan.split("\n").filter(l => l.contains("Scan") ||
      l.contains("ReadSchema") || l.contains("Exchange"))
      .foreach(println)
    println("=== formatted (scan sections) ===")
    val fmt = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    fmt.split("\n").filter(l => l.contains("ReadSchema") ||
      l.contains("Output") || l.contains("Location") ||
      l.contains("Scan")).foreach(println)
    spark.stop()
  }
}
