package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the persisted text index's
  * MAINTENANCE verbs — the companion to [[FamilyStress]] (which times
  * the probe side). The design claim under test: absorb / refresh /
  * retire cost tracks the BATCH, not the corpus, because the freshness
  * ledger restriction rides the bucketed `counts/` scan (only the batch
  * side exchanges) and every staged write is batch-sized. If that holds,
  * a FIXED-size batch against a ×1 / ×10 / ×100 corpus should time
  * near-flat (the residual growth is the corpus-side bucketed scan,
  * which is a filter-only column scan, never a shuffle).
  *
  * Per factor: build the [[FamilyStress]] isomorphic-disjoint corpus,
  * index it once (cold, reported), then time
  *   - absorb of 2000 brand-new docs,
  *   - refresh of an update batch re-absorbing 1000 indexed docs with
  *     changed text plus 1000 with unchanged text (the no-op rows),
  *   - retire of a 1000-id delete batch,
  *   - a post-maintenance probe (the `dedup_incremental_lsh_indexed`
  *     shape) as a sanity floor.
  * Each verb runs once per factor — these are mutations, not reps; the
  * batch is identical across factors so the numbers compare directly.
  * Output: one JSON line + BENCH_ABSORB_r11.json.
  */
object AbsorbStress {

  def main(args: Array[String]): Unit = {
    val srcSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // fixed batches, identical at every factor (ids far above the
    // replica id-space so they are always brand-new)
    def doc(i: Long) = s"absorb stress doc $i " +
      (1 to 30).map(w => s"w${(i * 31 + w * 7) % 997}").mkString(" ")
    val freshBatch = (0L until 2000L)
      .map(i => (8000000000L + i, doc(i))).toDF("doc_id", "text")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]

    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      FamilyStress.buildCorpus(spark, srcSf, dir, f)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-absorb-x$f").toString
      val build = timed(graft.operators.DedupIndex.writeText(
        docs, "doc_id", "text", idxDir))
      // 1000 indexed ids change content, 1000 replay unchanged — both
      // from the rep-0 slice so they exist at every factor
      val updateBatch = docs.filter(col("doc_id") < 2000)
        .limit(2000)
        .withColumn("__chg", col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          when(col("__chg"), concat(col("text"), lit(" v2 edition")))
            .otherwise(col("text")).as("text"))
      val deleteIds = docs.filter(col("doc_id") >= 2000 &&
          col("doc_id") < 4000)
        .select(col("doc_id")).limit(1000)
      // record the ACTUAL batch rows the filters produced (the corpus's
      // id density decides them, not the literals) — the artifact must
      // describe the batch the flatness claim was measured on
      if (!results.contains(-1))
        results(-1) = Map(
          "fresh_rows" -> freshBatch.count().toDouble,
          "refresh_rows" -> updateBatch.count().toDouble,
          "retire_rows" -> deleteIds.count().toDouble)
      val absorb = timed(graft.operators.DedupIndex.appendText(
        freshBatch, "doc_id", "text", idxDir))
      val refresh = timed(graft.operators.DedupIndex.appendText(
        updateBatch, "doc_id", "text", idxDir))
      val retire = timed(graft.operators.DedupIndex.retireText(
        deleteIds, "doc_id", idxDir))
      val probeBatch = docs.filter(col("doc_id") % 1000 === 7).limit(500)
      val probe = timed {
        graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
          probeBatch, "doc_id", "text",
          graft.operators.DedupIndex.loadText(spark, idxDir),
          threshold = 0.5).pairs.count()
      }
      println(f"x$f%-4d build $build%8.2f s  absorb $absorb%6.2f s  " +
        f"refresh $refresh%6.2f s  retire $retire%6.2f s  probe $probe%6.2f s")
      results(f) = Map("build" -> build, "absorb" -> absorb,
        "refresh" -> refresh, "retire" -> retire, "probe" -> probe)
    }

    val batch = results.remove(-1).getOrElse(Map.empty)
    val lines = results.map { case (f, m) =>
      s""""x$f":{${m.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(",")}}"""
    }
    val batchJson = batch
      .map { case (k, v) => s""""$k":${v.toLong}""" }.mkString(",")
    val json = s"""{"metric":"absorb_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""batch":{$batchJson},""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_ABSORB_OUT",
        "/root/repo/BENCH_ABSORB_r11.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
