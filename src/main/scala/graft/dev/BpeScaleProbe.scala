package graft.dev

import org.apache.spark.sql.SparkSession

/** Measures vocabulary-scale BPE training: the driver-local merge loop
  * ([[graft.operators.Bpe.trainLocal]]) at a real merge budget vs the
  * per-merge-Spark-jobs baseline it replaced. Usage:
  * BpeScaleProbe [sfDir] [numMerges].
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val merges = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val (vocab, ms) = graft.operators.Bpe.trainLocal(docs, "text", merges)
    val took = (System.nanoTime() - t0) / 1e9
    println(f"trainLocal($merges merges): $took%.2f s, " +
      f"${ms.size} merges performed, vocab rows ${vocab.count()}")
    println("last merges: " + ms.takeRight(5).map(m =>
      s"${m.a}+${m.b}@${m.weight}").mkString(", "))
  }
}
