package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: 10× scale stress for the dedup/ANN/text/pipeline families —
  * the companion to [[StressProbe]] (which covers the CDC core). Builds
  * ×1 and ×10 corpora from sf0.1 documents/embeddings and times the
  * DECLARED queries (the exact `SparkEntry.queries` entry points, run
  * against the stress dirs) at both scales, reporting per-query scaling
  * exponents α where t(10x) ≈ t(1x)·10^α.
  *
  * Corpus construction matters: a naive text replicate would make every
  * replica a near-dup of its original, so candidate PAIRS would grow
  * ~100× while honest input growth is 10× — measuring a fixture
  * artifact, not the engine. Replicas are therefore ISOMORPHIC but
  * DISJOINT copies:
  *   - text: every word is renamed through a replica-keyed digest
  *     (`substr(md5(word || 'r' || rep), 1, 8)`) — a per-replica
  *     vocabulary bijection, so within-replica Jaccard/SimHash/LSH
  *     structure is preserved exactly while cross-replica overlap is ~0;
  *   - embeddings: every dimension's sign flips by a (dim, rep)-keyed
  *     digest bit — within-replica cosine is EXACTLY preserved (the
  *     sign pattern cancels in the dot product), cross-replica cosine
  *     is a random ± sum ≈ 0.
  *   The ×1 corpus applies the SAME rep-0 transform, so the two scales
  *   differ only in row count, never per-row shape.
  *
  * Cold = first run (for `*_indexed` queries this pays the index
  * build); warm = min of the following `reps` runs (the steady-state
  * probe cost). Output: one JSON line + /root/repo/BENCH_STRESS_r11.json.
  */
object FamilyStress {

  private val Queries = Seq(
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_near",
    "dedup_incremental_lsh",
    "dedup_incremental_lsh_indexed",
    "ann_ivf_topk",
    "ann_pq_indexed_topk",
    "text_lang_dist",
    "pipeline_e2e")

  private[dev] def buildCorpus(spark: SparkSession, srcSf: String,
      dir: String, factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")))
      return
    val docs = spark.read.parquet(s"$srcSf/documents.parquet")
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
    docs.select(
        (col("doc_id") + col("_rep").cast("long") * 1000000000L)
          .as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          w => substring(md5(concat(w, lit("r"), col("_rep"))), 1, 8)),
          " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vecs = spark.read.parquet(s"$srcSf/embeddings.parquet")
      .withColumn("_rep", explode(sequence(lit(0), lit(factor - 1))))
    vecs.select(
        (col("vec_id") + col("_rep").cast("long") * 1000000000L)
          .as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(substring(md5(concat(i.cast("string"), lit("r"),
              col("_rep"))), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), x)
            .otherwise(-x)).cast("array<float>").as("embedding"),
        col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // sf0.1 documents are only 5k rows, so ×1→×10 is fixed-overhead
    // dominated; the ×10→×100 leg (500k docs / 200k vectors) is where
    // the per-row work dominates and the exponent means something
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
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, Double]]

    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      println(s"building x$f corpus at $dir ...")
      buildCorpus(spark, srcSf, dir, f)
      println(s"  docs=${spark.read.parquet(s"$dir/documents.parquet").count()} " +
        s"vecs=${spark.read.parquet(s"$dir/embeddings.parquet").count()}")
      for (q <- Queries) {
        val fn = graft.SparkEntry.queries(q)
        def run(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = run()
        val warm = (1 to reps).map(_ => run()).min
        println(f"  x$f $q%-30s cold ${cold}%8.2f s   warm ${warm}%8.2f s")
        results(q) = results.getOrElse(q, Map.empty) ++
          Map(s"x${f}_cold" -> cold, s"x${f}_warm" -> warm)
      }
    }

    val lines = results.map { case (q, m) =>
      // α = log(t_hi/t_lo)/log(hi/lo) over the two LARGEST factors:
      // 1.0 = linear, < 1 sublinear (fixed overheads amortizing), > 1
      // superlinear (a pairs/shuffle blow-up to chase)
      val (lo, hi) = (factors(factors.size - 2), factors.last)
      val ratio = math.log10(hi.toDouble / lo)
      val aw = math.log10(m(s"x${hi}_warm") / m(s"x${lo}_warm")) / ratio
      val times = factors.flatMap(f => Seq(
        s""""x${f}_cold":${fmt(m(s"x${f}_cold"))}""",
        s""""x${f}_warm":${fmt(m(s"x${f}_warm"))}"""))
      s""""$q":{${times.mkString(",")},"alpha_warm":${fmt(aw)}}"""
    }
    val json = s"""{"metric":"family_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""reps":$reps,"queries":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_STRESS_OUT",
        "/root/repo/BENCH_STRESS_r11.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
