package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dissect the r15 dedup_incremental_lsh_indexed regression —
  * which stage of the rebuilt probe costs 9 s at sf0.1.
  */
object LshProbeDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.queries.Tables.tbl(spark, sfDir, "documents")
    val idx = t("loadText") {
      graft.queries.QueryIndexes.text(spark, sfDir)
    }
    val batch = docs.filter(col("doc_id") % 2 === 1)
    for (rep <- 1 to 3) {
      val rpt = t(s"construct rep$rep") {
        graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
          batch, "doc_id", "text", idx, threshold = 0.5)
      }
      t(s"pairs.count rep$rep") { println("  pairs=" + rpt.pairs.count()) }
    }
    // contrast: the batch pipeline alone (shingle→sig→bands→collect)
    val shNew = graft.plans.CachedPlans.cached(
      graft.operators.Dedup.hashedShingleTable(batch, "doc_id", "text",
        3, portable = true))
    val bk = graft.operators.Dedup.lshBandKeys(
      graft.operators.Dedup.minHashSignatures(shNew, "doc_id", 12,
        portable = true), "doc_id", 4, 3, portable = true)
    t("batch bkeys distinct.collect") {
      println("  keys=" + bk.select(
        graft.operators.DedupIndex.bandedKey(col("band"), col("band_key"))
          .as("bkey")).distinct().collect().length)
    }
    spark.stop()
  }
}
