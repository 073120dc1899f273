package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the BM25 retrieval family — the
  * measured counterpart of the `text_bm25_indexed` design claim. The
  * recompute form pays the corpus-scale tokenize + three aggregations
  * on EVERY query batch; the persisted inverted index amortizes that
  * into a one-time build, after which a probe's cost is bound by the
  * query vocabulary's candidate postings, not the corpus token count.
  *
  * The [[FamilyStress]] replica corpora salt every token per replica,
  * so vocabulary grows with the corpus and a rep-0 term's df stays
  * rep-0-scale — the real-world shape (new data brings new vocabulary).
  * A FIXED rep-0 query set against ×1/×10/×100 should therefore show:
  *   - recompute scaling ~linearly (corpus-scale tf/df/dl every time),
  *   - build scaling ~linearly (the amortized corpus-scale op, paid once),
  *   - the indexed probe near-FLAT (candidates = rep-0 df postings; the
  *     residual growth is the tok-bucketed scan, filter-only).
  * Each measurement runs twice per factor; min reported (JVM warmup).
  * Output: one JSON line + BENCH_RETRIEVAL_r12.json.
  */
object RetrievalStress {

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
    def timedMin(reps: Int)(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    var queryRows = 0L

    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      FamilyStress.buildCorpus(spark, srcSf, dir, f)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // FIXED rep-0 query slice: identical text at every factor, so the
      // probe cost comparison isolates corpus growth
      val queries = docs
        .filter(col("doc_id") < 1000000000L && col("doc_id") % 101 === 0)
      queryRows = queries.count()
      val recompute = timedMin(2) {
        graft.plans.CachedPlans.clear()
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "doc_id", "text", k = 10, qTerms = 8,
          termNgram = 2).count()
      }
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-retr-x$f").toString
      val build = timedMin(1)(graft.operators.DedupIndex.writeLexical(
        docs, "doc_id", "text", idxDir, termNgram = 2))
      val idx = graft.operators.DedupIndex.loadLexical(spark, idxDir)
      val probe = timedMin(2) {
        graft.operators.Retrieval.bm25TopKIndexed(idx, queries,
          "doc_id", "text", k = 10, qTerms = 8).count()
      }
      println(f"x$f%-4d recompute $recompute%8.2f s  build $build%8.2f s" +
        f"  probe $probe%6.2f s  (queries $queryRows)")
      results(f) = Map("recompute" -> recompute, "build" -> build,
        "probe" -> probe)
    }

    val lines = results.map { case (f, m) =>
      s""""x$f":{${m.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(",")}}"""
    }
    val json = s"""{"metric":"retrieval_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""query_rows":$queryRows,""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RETRIEVAL_OUT",
        "/root/repo/BENCH_RETRIEVAL_r12.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
