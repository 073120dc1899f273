package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe: does a join whose keys are a SUPERSET of a v1 bucketed
  * table's bucket columns avoid shuffling the bucketed side? Decides the
  * shape of DedupIndex's probe join — if Spark re-shuffles the bucketed
  * side for (band, band_key) keys, the probe should join on `band_key`
  * alone (the bucket column) and take `band` as a post-join filter.
  */
object IndexJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe-idx").toString
    val docs = (0L until 2000L).map(i =>
      (i, s"w${i % 37} w${(i + 1) % 37} w${(i + 2) % 37} x$i y$i z$i"))
      .toDF("doc_id", "text")
    graft.operators.DedupIndex.writeText(
      docs, "doc_id", "text", dir, numBuckets = 4)
    val idx = graft.operators.DedupIndex.loadText(spark, dir)
    val newSide = (0 until 50).map(i => (i % 4, s"b$i", 9000L + i))
      .toDF("band", "band_key", "b_id")

    def report(label: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      println(s"=== $label ===")
      println(df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Exchange") || l.contains("Scan")
          || l.contains("Join"))
        .mkString("\n"))
    }
    report("superset keys (band, band_key)",
      idx.bandKeys.join(newSide, Seq("band", "band_key")))
    report("single key (band_key) only",
      idx.bandKeys.drop("band")
        .join(newSide.drop("band"), Seq("band_key")))
    spark.stop()
  }
}
