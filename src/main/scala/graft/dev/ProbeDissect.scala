package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: attribute the r16 residual — the banded text probes grow
  * +0.7–0.9 s across ×1→×100 — to stages. Replays the LSH indexed
  * probe's internal pipeline stage by stage on the FamilyStress corpus
  * at one factor (env SPARK_GRAFT_DISSECT_FACTOR), against an index
  * built with env-chosen bucket count (SPARK_GRAFT_DISSECT_BUCKETS,
  * 0 = session default 32). The index persists in /tmp keyed by
  * (factor, buckets) so repeat dissection runs skip the cold build.
  */
object ProbeDissect {
  def main(args: Array[String]): Unit = {
    val srcSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = sys.env.getOrElse("SPARK_GRAFT_DISSECT_FACTOR", "100").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_DISSECT_BUCKETS", "0").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
    FamilyStress.buildCorpus(spark, srcSf, dir, f)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val probeBatch = docs.filter(col("doc_id") % 10 === 7).limit(500)
      .select((col("doc_id") + 9000000000L).as("doc_id"),
        concat(col("text"), lit(" probe noise")).as("text"))
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_dissect_x${f}_b$buckets"
    if (!new java.io.File(s"$idxDir/_params.json").exists()) {
      t("cold build") {
        graft.operators.DedupIndex.writeText(docs, "doc_id", "text",
          idxDir, numBuckets = buckets)
      }
    }
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
    println(s"factor=$f buckets=${idx.params.numBuckets} " +
      s"docs=${docs.count()}")

    // ---- replayed probe internals (mirrors Dedup.incremental…Indexed)
    val p = idx.params
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val shNew = graft.plans.CachedPlans.cached(
        graft.operators.Dedup.hashedShingleTable(
          probeBatch, "doc_id", "text", p.shingleN, p.portable))
      val bkNew = graft.operators.Dedup.lshBandKeys(
        graft.operators.Dedup.minHashSignatures(
          shNew, "doc_id", p.numHashes, p.portable),
        "doc_id", p.bands, p.numHashes / p.bands, p.portable)
      val bkNewK = graft.plans.CachedPlans.cached(bkNew.select(
        graft.operators.DedupIndex.bandedKey(col("band"), col("band_key"))
          .as("bkey"),
        col("doc_id").as("b_id")))
      val touched = t("batch pipeline + key collect") {
        bkNewK.select(col("bkey")).distinct()
          .collect().map(_.getString(0)).toSeq
      }
      println(s"  touched keys: ${touched.size}")
      val okOld = t("candidate band scan (count)") {
        val pruned = idx.bandKeys.filter(col("bkey").isin(touched: _*))
          .join(idx.bucketSizes.filter(col("n") > 1000)
            .filter(col("bkey").isin(touched: _*)).select(col("bkey")),
            Seq("bkey"), "left_anti")
        println(s"  candidate band rows: ${pruned.count()}")
        pruned
      }
      val pairs = t("pairs (count)") {
        val pr = okOld.select(col("bkey"), col("id").as("a_id"))
          .join(bkNewK, Seq("bkey"))
          .filter(col("a_id") =!= col("b_id"))
          .select("a_id", "b_id").distinct()
        println(s"  pairs: ${pr.count()}")
        pr
      }
      t("verify: shingle join + jaccard") {
        val common = pairs
          .join(idx.shingles.select(col("id").as("a_id"), col("shingle")),
            Seq("a_id"))
          .join(shNew.select(col("doc_id").as("b_id"), col("shingle")),
            Seq("b_id", "shingle"))
          .groupBy(col("a_id"), col("b_id"))
          .agg(count(lit(1)).as("common"))
        val countsNew = shNew.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"))
        val verified = common
          .join(idx.counts.select(col("id").as("a_id"),
            col("n_shingles").as("na")), Seq("a_id"))
          .join(countsNew.select(col("doc_id").as("b_id"),
            col("n_shingles").as("nb")), Seq("b_id"))
          .withColumn("jaccard",
            col("common").cast("double") /
              (col("na") + col("nb") - col("common")).cast("double"))
          .filter(col("jaccard") >= 0.5)
        println(s"  verified pairs: ${verified.count()}")
      }
      t("full probe (count)") {
        println("  pairs=" + graft.operators.Dedup
          .incrementalMinHashNearDupsReportIndexed(
            probeBatch, "doc_id", "text", idx, threshold = 0.5)
          .pairs.count())
      }
    }
    spark.stop()
  }
}
