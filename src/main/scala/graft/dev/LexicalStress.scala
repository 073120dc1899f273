package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the GENERATIONAL LEXICAL index's
  * maintenance verbs — [[AbsorbStress]]'s round-12 sibling. The claim
  * under test: appendLexical / retireLexical cost tracks the BATCH, not
  * the corpus, because the freshness resolution and the df-reversal
  * both ride id-bucketed scans (doclens, docterms) restricted to batch
  * ids before anything shuffles, and every staged write (postings,
  * forward rows, signed df deltas, the stats row) is batch-sized. The
  * post-maintenance indexed probe additionally pays the load path's
  * vocabulary-scale termdf delta aggregation — expected near-flat, the
  * residual being the tok-bucketed scans.
  *
  * Per factor: build the [[FamilyStress]] isomorphic corpus's lexical
  * index once (cold, reported), then time a fixed 2000-doc fresh
  * absorb, a 2000-doc update batch (1000 changed + 1000 no-op), a
  * 1000-id retire, and a post-maintenance `text_bm25_indexed`-shaped
  * probe (50 rep-0 queries). Output: one JSON line +
  * BENCH_LEXABSORB_r12.json.
  */
object LexicalStress {

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
    def doc(i: Long) = s"lexical stress doc $i " +
      (1 to 30).map(w => s"w${(i * 31 + w * 7) % 997}").mkString(" ")
    val freshBatch = (0L until 2000L)
      .map(i => (9000000000L + i, doc(i))).toDF("doc_id", "text")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]

    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      FamilyStress.buildCorpus(spark, srcSf, dir, f)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-lexabsorb-x$f").toString
      val build = timed(graft.operators.DedupIndex.writeLexical(
        docs, "doc_id", "text", idxDir, termNgram = 2))
      val updateBatch = docs.filter(col("doc_id") < 2000)
        .limit(2000)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"), lit(" v2 edition")))
            .otherwise(col("text")).as("text"))
      val deleteIds = docs.filter(col("doc_id") >= 2000 &&
          col("doc_id") < 4000)
        .select(col("doc_id")).limit(1000)
      if (!results.contains(-1))
        results(-1) = Map(
          "fresh_rows" -> freshBatch.count().toDouble,
          "refresh_rows" -> updateBatch.count().toDouble,
          "retire_rows" -> deleteIds.count().toDouble)
      val absorb = timed(graft.operators.DedupIndex.appendLexical(
        freshBatch, "doc_id", "text", idxDir))
      val refresh = timed(graft.operators.DedupIndex.appendLexical(
        updateBatch, "doc_id", "text", idxDir))
      val retire = timed(graft.operators.DedupIndex.retireLexical(
        deleteIds, "doc_id", idxDir))
      val queries = docs.filter(col("doc_id") < 1000000000L &&
        col("doc_id") % 101 === 0)
      val probe = timed {
        graft.operators.Retrieval.bm25TopKIndexed(
          graft.operators.DedupIndex.loadLexical(spark, idxDir),
          queries, "doc_id", "text", k = 10, qTerms = 8).count()
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
    val json = s"""{"metric":"lexical_absorb_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""batch":{$batchJson},""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_LEXABSORB_OUT",
        "/root/repo/BENCH_LEXABSORB_r12.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
