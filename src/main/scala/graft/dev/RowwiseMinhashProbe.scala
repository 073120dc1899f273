package graft.dev

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: would per-ROW minhash signatures (higher-order array
  * functions, zero shuffle — the scheme `CdcStream.nearDupStream` uses)
  * beat the batch explode → partial-agg groupBy pipeline?
  *
  * Trade: the explode path is fully whole-stage-codegen'd but pays a
  * shuffle of (id, 12 mins) per doc; the HOF path has no shuffle but
  * `transform`/`array_min` lambdas evaluate interpreted inside codegen.
  * This probe measures both on the same corpus so round decisions rest
  * on numbers, not vibes.
  */
object RowwiseMinhashProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") + col("_rep").cast("long") * 10000000L)
      .withColumn("text", concat(col("text"), lit(" rep"), col("_rep")))
      .drop("_rep").repartition(64).persist()
    println(s"docs: ${docs.count()}")

    val numHashes = 12
    // checksum over every signature column: count() alone would let
    // Catalyst PRUNE the unevaluated per-row expressions (making the HOF
    // path look free); an aggregate over all h_i forces both paths to
    // fully compute — and the matching checksums double as a proof the
    // two schemes produce identical signatures
    def checksum(sig: org.apache.spark.sql.DataFrame): Long =
      sig.select(xxhash64(sig.columns.map(col): _*).as("x"))
        .agg(expr("bit_xor(x)")).collect()(0).getLong(0) // xor: no overflow
    // explode + partial-agg groupBy (the batch pipeline's scheme)
    time("explode+groupBy signatures") {
      val sh = graft.operators.Dedup.hashedShingleTable(
        docs, "doc_id", "text", 3)
      val sig = graft.operators.Dedup.minHashSignatures(sh, "doc_id", numHashes)
      println("  -> checksum " + checksum(sig))
    }
    // per-row HOF signatures (the streaming scheme)
    time("row-wise HOF signatures") {
      val shingles = TextFunctions.shinglesOfTokens(
        TextFunctions.tokens(lower(col("text"))), 3)
      val sig = docs
        .withColumn("_hsh", array_distinct(
          transform(shingles, s => PortableHash.md5Long(s))))
        .select(col("doc_id") +: (0 until numHashes).map(i =>
          array_min(transform(col("_hsh"),
            h => PortableHash.seededLong(i, h))).as(s"h$i")): _*)
      println("  -> checksum " + checksum(sig))
    }
    spark.stop()
  }
}
