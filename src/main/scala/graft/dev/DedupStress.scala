package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: 10× scale stress of the dedup family — replicates sf0.1
  * documents with shifted ids (distinct text suffix per replica so the
  * corpus isn't trivially identical), then times the portable (fused
  * md5) and fast (xxhash64) MinHash and n-gram pipelines. Validates the
  * fused-hash scaling beyond the largest driver SF.
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
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
    val big = docs
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") + col("_rep").cast("long") * 10000000L)
      .withColumn("text", concat(col("text"), lit(" rep"), col("_rep")))
      .drop("_rep")
      .repartition(64)
      .persist()
    println(s"docs: ${big.count()} (cached)")

    import graft.operators.Dedup
    time(s"minhash portable ${factor}x")(
      println("  -> " + Dedup.minHashNearDups(big, "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5).count()
        + " pairs"))
    spark.catalog.clearCache(); big.persist().count()
    time(s"minhash fast ${factor}x")(
      println("  -> " + Dedup.minHashNearDups(big, "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5,
        portable = false).count() + " pairs"))
    spark.catalog.clearCache(); big.persist().count()
    time(s"ngram portable ${factor}x")(
      println("  -> " + Dedup.ngramJaccardNearDups(big, "doc_id", "text",
        blockN = 5, shingleN = 3, threshold = 0.5).count() + " pairs"))
    spark.catalog.clearCache()
    graft.plans.CachedPlans.clear(); big.persist().count()
    time(s"canonicalize (pairs + CC + corpus fold) ${factor}x") {
      val pairs = Dedup.minHashNearDups(big, "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .select(col("a_id"), col("b_id"))
      val c = Dedup.canonicalize(big, "doc_id", pairs, "a_id", "b_id")
      println("  -> " + c.filter(!col("kept")).count() + " docs dropped of "
        + c.count())
    }
    spark.catalog.clearCache()
    graft.plans.CachedPlans.clear(); big.persist().count()
    time(s"spanOverlap ${factor}x")(
      println("  -> " + Dedup.spanOverlap(big, "doc_id", "text", n = 5)
        .filter(col("n_dup_spans") > 0).count() + " docs with shared spans"))
    spark.catalog.clearCache()
    graft.plans.CachedPlans.clear(); big.persist().count()
    time(s"simHashNearDups ${factor}x")(
      println("  -> " + Dedup.simHashNearDups(big, "doc_id", "text").count()
        + " pairs"))
    spark.stop()
  }
}
