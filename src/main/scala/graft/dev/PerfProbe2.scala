package graft.dev

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the minhash pipeline (repartitioned
  * input variant, persist on/off).
  */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    time("r32 shingleTable.count")(sh.count())
    val sig = Dedup.minHashSignatures(sh, "doc_id", 12)
    time("r32 signatures.count")(sig.count())
    val bk = Dedup.lshBandKeys(sig, "doc_id", 4, 3)
    time("r32 bandKeys.count")(bk.count())
    val (pairs, _) = Dedup.candidatePairs(bk, "doc_id")
    time("r32 pairs.count")(pairs.count())
    val jac = Dedup.jaccardFor(pairs, sh, "doc_id")
    time("r32 jaccard.count")(jac.count())
    val shP = Dedup.shingleTable(docs, "doc_id", "text", 3).persist()
    val sigP = Dedup.minHashSignatures(shP, "doc_id", 12)
    val (pairsP, _) = Dedup.candidatePairs(
      Dedup.lshBandKeys(sigP, "doc_id", 4, 3), "doc_id")
    time("r32 persist jaccard.count")(
      Dedup.jaccardFor(pairsP, shP, "doc_id").count())
  }
}
