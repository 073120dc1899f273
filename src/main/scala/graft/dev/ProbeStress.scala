package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the TEXT index's two banded INDEXED
  * probes (MinHash-LSH and SimHash) after the fmt-5 change — the
  * claim under test is the round's headline: with the bucket-cap
  * statistic served from the signed size deltas (never an
  * O(stored-bands) recount) and the candidate stage's stored-side scan
  * pruned to the batch's touched bucket keys, a FIXED probe batch
  * against a ×1/×10/×100 corpus should time near-FLAT — the probe's
  * only remaining corpus-coupled inputs are the delta component (which
  * grows with maintenance history, not corpus size, and collapses at
  * compaction) and the verify stage's id-bucketed shingle/signature
  * lookups for actual candidates.
  *
  * Per factor: the [[FamilyStress]] isomorphic-disjoint corpus, one
  * cold index build (reported for context, not the claim), then each
  * probe as min-of-2 warm runs (the settled cost a standing service
  * sees — same convention as [[MediaStress]]'s indexed arm). The probe
  * batch is IDENTICAL across factors and its templates come from rep 0
  * only, so pair output is constant and growth, if any, is pure
  * corpus coupling. Output: one JSON line + BENCH_PROBES_r15.json.
  */
object ProbeStress {

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

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    var batchJson = ""
    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      FamilyStress.buildCorpus(spark, srcSf, dir, f)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // rep-0 templates with fresh noise → pairs exist at every factor,
      // and the batch is byte-identical across factors
      val probeBatch = docs.filter(col("doc_id") % 10 === 7).limit(500)
        .select((col("doc_id") + 9000000000L).as("doc_id"),
          concat(col("text"), lit(" probe noise")).as("text"))
      if (batchJson.isEmpty)
        batchJson = s""""probe_rows":${probeBatch.count()}"""
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-probe-x$f").toString
      val build = timed(graft.operators.DedupIndex.writeText(
        docs, "doc_id", "text", idxDir))
      var lshPairs = 0L
      var simPairs = 0L
      def runLsh(): Double = timed {
        lshPairs = graft.operators.Dedup
          .incrementalMinHashNearDupsReportIndexed(probeBatch, "doc_id",
            "text", graft.operators.DedupIndex.loadText(spark, idxDir),
            threshold = 0.5).pairs.count()
      }
      def runSim(): Double = timed {
        simPairs = graft.operators.Dedup
          .incrementalSimHashNearDupsReportIndexed(probeBatch, "doc_id",
            "text", graft.operators.DedupIndex.loadText(spark, idxDir))
          .pairs.count()
      }
      val lsh = math.min(runLsh(), runLsh())
      val sim = math.min(runSim(), runSim())
      println(f"x$f%-4d build $build%8.2f s  probe_lsh $lsh%6.2f s " +
        f"($lshPairs%d pairs)  probe_simhash $sim%6.2f s ($simPairs%d pairs)")
      results(f) = Map("build" -> build, "probe_lsh" -> lsh,
        "probe_simhash" -> sim, "lsh_pairs" -> lshPairs.toDouble,
        "simhash_pairs" -> simPairs.toDouble)
    }

    val lines = results.map { case (f, m) =>
      s""""x$f":{${m.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(",")}}"""
    }
    val json = s"""{"metric":"probe_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""method":{"probes":"min of 2 warm runs over one cold-built """ +
      s"""index per factor"},""" +
      s""""batch":{$batchJson},""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PROBES_OUT",
        "/root/repo/BENCH_PROBES_r15.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
