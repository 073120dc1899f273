package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the persisted MEDIA index — the
  * modality where the maintained index pays off hardest, because the
  * corpus-side cost is image DECODE, not hashing. Claims under test:
  *
  *   1. absorb / refresh / retire cost tracks the BATCH (decode the
  *      batch once, ledger restriction rides the id-bucketed `mcodes`
  *      scan, staged writes batch-sized) — a fixed batch against a
  *      ×1/×10/×100 corpus should time near-flat;
  *   2. the INDEXED probe never re-decodes the corpus — near-flat as
  *      the corpus grows — while the RECOMPUTE probe re-decodes every
  *      corpus payload per run and must grow linearly. The gap is the
  *      measured 100 TB argument for the media index.
  *
  * Corpus per factor: the [[FamilyStress]] replicated documents table
  * (isomorphic-disjoint reps) rendered to 16×8 BMP payloads with the
  * template varied PER REP (a ×100 real corpus has ×100 distinct
  * photos, not 100 re-encodes of each photo — rep-constant templates
  * would just saturate the bucket cap and shrink the probe output).
  * Batches are identical across factors; probe batch templates come
  * from rep 0 so pairs exist at every factor. Output: one JSON line +
  * BENCH_MEDIA_r14.json.
  */
object MediaStress {

  /** One 16×8 fixture BMP — the small flavor [[DayInLifeStress]] uses
    * for its media arm (latency shape, not decode bytes). Delegates to
    * the one shared synthesis ([[graft.operators.SyntheticMedia]]) so
    * the stress, the spec fixture and the oracle-gated query fixture
    * cannot drift apart byte-wise.
    */
  private[dev] def bmpPayload(template: String,
      noise: String): Array[Byte] =
    graft.operators.SyntheticMedia.bmp(template, noise)

  /** Render (doc_id, g, text) rows to (doc_id, payload) BMPs —
    * [[graft.operators.SyntheticMedia.bmp]] nearest-UPSCALED to
    * `w`×`h` so the payload carries a realistic byte weight: the
    * 440-byte query-fixture BMPs decode in microseconds and would hide
    * the decode cost this stress exists to measure.
    */
  private def payloads(df: DataFrame, w: Int = 64, h: Int = 32)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    df.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.bmp(r.getString(1),
            r.getString(2), w, h))
      }
    }(enc)
  }

  /** [[payloads]]' VIDEO twin: (doc_id, g, text) rows rendered to
    * 4-frame 16×8 GIF clips exactly like the oracle fixture
    * ([[graft.queries.TextQueries.videoPayloads]] — template g, noise
    * text), so the ×100 gate measures the same decode path the gated
    * `mm_framehash_*` queries run.
    */
  private def gifPayloads(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    df.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.gif(r.getString(1),
            r.getString(2)))
      }
    }(enc)
  }

  /** [[payloads]]' AUDIO twin: (doc_id, g, text) rows rendered to
    * 128-sample PCM16 WAV clips exactly like the oracle fixture
    * ([[graft.queries.TextQueries.audioPayloads]] shape — template g,
    * noise text), so the ×100 gate measures the RIFF-decode + energy-
    * hash path the gated `mm_audiohash_*` queries run.
    */
  private def wavPayloads(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
    df.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.wav(r.getString(1),
            r.getString(2)))
      }
    }(enc)
  }

  def main(args: Array[String]): Unit = {
    val srcSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    // index bucket count (0 = session default, 32). The touched-key
    // prune turns the probe's stored-side scan into ~touched/numBuckets
    // of the band files, so a corpus sized at B buckets per ~10× the
    // probe batch's keys keeps the probe flat — this knob measures that
    // sizing claim at fixture scale
    val buckets = sys.env.getOrElse("SPARK_GRAFT_MEDIA_BUCKETS", "0").toInt
    // modality switch (r17: the video square's ×100 gate): image_ahash
    // renders BMP stills, video_framehash renders 4-frame GIF clips —
    // same index machinery, same probe entry point, pinned coder
    val coder = sys.env.getOrElse("SPARK_GRAFT_MEDIA_CODER", "image_ahash")
    val video = coder == "video_framehash"
    val audio = coder == "audio_energy"
    require(video || audio || coder == "image_ahash",
      s"unknown coder $coder")
    val render: DataFrame => DataFrame =
      if (video) gifPayloads
      else if (audio) wavPayloads
      else (df => payloads(df))
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

    // media corpus per factor: replicate docs, vary the template by rep
    def mediaCorpus(dir: String, factor: Int): String = {
      val out =
        if (video) s"$dir/media_video.parquet"
        else if (audio) s"$dir/media_audio.parquet"
        else s"$dir/media_wide.parquet"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(out))) {
        FamilyStress.buildCorpus(spark, srcSf, dir, factor)
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        render(docs.select(col("doc_id"),
            concat_ws("|", col("lang"), col("source"),
              (col("doc_id") / 1000000000L).cast("long")).as("g"),
            col("text")))
          .repartition(32)
          .write.mode("overwrite").parquet(out)
      }
      out
    }

    // fixed batches, identical at every factor. Fresh/refresh noise and
    // probe templates derive from rep-0 source rows so they exist (and
    // collide) at every factor.
    val src0 = spark.read.parquet(s"$srcSf/documents.parquet")
      .select(col("doc_id"), concat_ws("|", col("lang"), col("source"),
        lit(0L)).as("g"), col("text"))
    val freshBatch = render(src0.limit(2000)
      .select((col("doc_id") + 8000000000L).as("doc_id"),
        concat(lit("fresh-"), col("g")).as("g"), col("text")))
    val updateBatch = render(src0.filter(col("doc_id") < 2000).limit(2000)
      .select(col("doc_id"), col("g"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text")))
    val deleteIds = src0.filter(col("doc_id") >= 2000 &&
      col("doc_id") < 4000).select(col("doc_id")).limit(1000)
    val probeBatch = render(src0.filter(col("doc_id") % 10 === 7)
      .limit(500)
      .select((col("doc_id") + 9000000000L).as("doc_id"), col("g"),
        concat(col("text"), lit(" probe-noise")).as("text")))

    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    var batchJson = ""
    // single-shot mutation timings on a co-tenant host swing 2-4×
    // between runs (the documented bench-band problem), so each factor
    // runs `reps` FULL passes — a fresh index dir per pass, so every
    // mutation does real work every time — and the artifact records the
    // per-metric MIN (the same min-of-reps convention as Bench)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      val mediaPath = mediaCorpus(dir, f)
      val media = spark.read.parquet(mediaPath)
      if (batchJson.isEmpty)
        batchJson = s""""fresh_rows":${freshBatch.count()},""" +
          s""""refresh_rows":${updateBatch.count()},""" +
          s""""retire_rows":${deleteIds.count()},""" +
          s""""probe_rows":${probeBatch.count()}"""
      var best = Map.empty[String, Double]
      var probedPairs = 0L
      for (rep <- 1 to reps) {
        val idxDir = java.nio.file.Files
          .createTempDirectory(s"graft-media-x$f-r$rep").toString
        // cold build: the one O(corpus) decode pass
        val build = timed(graft.operators.DedupIndex.writeMedia(
          media, "doc_id", "payload", idxDir, numBuckets = buckets,
          coder = coder))
        val absorb = timed(graft.operators.DedupIndex.appendMedia(
          freshBatch, "doc_id", "payload", idxDir))
        val refresh = timed(graft.operators.DedupIndex.appendMedia(
          updateBatch, "doc_id", "payload", idxDir))
        val retire = timed(graft.operators.DedupIndex.retireMedia(
          deleteIds, "doc_id", idxDir))
        def runProbe(): Double = timed {
          probedPairs = graft.operators.Dedup
            .incrementalAhashNearDupsReportIndexed(probeBatch, "doc_id",
              "payload",
              graft.operators.DedupIndex.loadMedia(spark, idxDir))
            .pairs.count()
        }
        // first run per JVM pays codegen/JIT warmup — report the
        // settled cost (min of 2), what a standing service sees
        val probeIdx = math.min(runProbe(), runProbe())
        // the contrast arm: recompute re-decodes the WHOLE corpus per
        // run. SYMMETRIC method: min of 2 runs like the indexed arm —
        // but with the plan registry cleared before EACH run, both so
        // writeMedia's cached corpus codes can't hand the "recompute" a
        // persisted decode, and so the second run re-decodes rather
        // than reusing the first run's cached codes (a warm cache would
        // void the re-decode semantics the arm exists to measure; the
        // min-of-2 still strips the one-time JIT warmup the indexed arm
        // gets stripped of)
        def runRecompute(): Double = {
          graft.plans.CachedPlans.clear()
          timed {
            (if (video)
              graft.operators.Dedup.incrementalFrameHashNearDupsReport(
                probeBatch, media, "doc_id", "payload")
            else if (audio)
              graft.operators.Dedup.incrementalAudioHashNearDupsReport(
                probeBatch, media, "doc_id", "payload")
            else
              graft.operators.Dedup.incrementalAhashNearDupsReport(
                probeBatch, media, "doc_id", "payload")).pairs.count()
          }
        }
        val probeRe = math.min(runRecompute(), runRecompute())
        graft.plans.CachedPlans.clear()
        val m = Map("build" -> build, "absorb" -> absorb,
          "refresh" -> refresh, "retire" -> retire,
          "probe_indexed" -> probeIdx, "probe_recompute" -> probeRe)
        best =
          if (best.isEmpty) m
          else best.map { case (k, v) => k -> math.min(v, m(k)) }
      }
      println(f"x$f%-4d build ${best("build")}%8.2f s  " +
        f"absorb ${best("absorb")}%6.2f s  " +
        f"refresh ${best("refresh")}%6.2f s  " +
        f"retire ${best("retire")}%6.2f s  " +
        f"probe_idx ${best("probe_indexed")}%6.2f s  " +
        f"probe_re ${best("probe_recompute")}%7.2f s  " +
        f"pairs $probedPairs%d")
      results(f) = best + ("probe_pairs" -> probedPairs.toDouble)
    }

    val lines = results.map { case (f, m) =>
      s""""x$f":{${m.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(",")}}"""
    }
    val json = s"""{"metric":"media_stress","src":"$srcSf",""" +
      s""""coder":"$coder",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""method":{"probe_indexed":"min of 2 warm runs",""" +
      s""""probe_recompute":"min of 2 runs, plan registry cleared """ +
      s"""before each (every run re-decodes the corpus)"},""" +
      s""""batch":{$batchJson},""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_MEDIA_OUT",
        "/root/repo/BENCH_MEDIA_r14.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
