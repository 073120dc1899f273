package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: corpus-scale stress for the vector index's RETRAIN verb —
  * the companion to [[AbsorbStress]] (which showed the maintenance
  * verbs tracking the batch, not the corpus). Retrain is the one verb
  * that is O(corpus) BY DESIGN: it re-derives the centroid selection
  * from every live row and reassigns every stored row to its new cell.
  * The claims under test:
  *   - retrain cost is ~linear in the corpus (α ≈ 1 — the floor for a
  *     full-reassignment rewrite; anything super-linear means a shuffle
  *     crept into the reassignment join);
  *   - the `retrainVectorsIfNeeded` no-drift CHECK is far cheaper than
  *     the rewrite (an id-only sort-limit scan), so cadence-calling it
  *     from the maintenance sink is affordable even when it skips;
  *   - the post-retrain indexed probe stays in the AbsorbStress band
  *     (the rebuilt lists serve identically to built-at-once ones);
  *   - REBUILD (the escalation above retrain: fresh ranges + PQ
  *     codebooks + centroids, every stored row's codes re-encoded) is a
  *     bounded multiple of retrain — it rewrites `buckets` on top of
  *     retrain's `lists`, so expect roughly build-shaped cost, still
  *     ~linear in the corpus — and the saturation CHECK that gates it
  *     is one live scan, cheap enough for the sink cadence;
  *   - a second saturation-gated call is a no-op (the gate self-disarms
  *     after the rebuild re-trains the ranges).
  *
  * Per factor ×1/×10/×100: build the [[FamilyStress]] corpus's vector
  * index (cold, reported), absorb a FIXED 2000-vector batch (drifts
  * the selection), then time retrain, the settled ifNeeded check, a
  * 500-query IVF∘SQ8 probe, a saturating 2000-vector absorb (values 3×
  * outside the trained range), the saturation-gated rebuild, and the
  * post-rebuild settled check. Output: one JSON line +
  * BENCH_IVFRETRAIN_r13.json.
  */
object RetrainStress {

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
    // fixed absorb batch, identical at every factor (ids far above the
    // replica id-space; values inside the corpus value range so the
    // frozen SQ8 encoder never saturates)
    val fresh = (0L until 2000L).map { i =>
      (8000000000L + i, Array.tabulate(64)(d =>
        (((i * 31 + d * 7) % 997).toFloat / 997f) * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]

    for (f <- factors) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stress_x$f"
      FamilyStress.buildCorpus(spark, srcSf, dir, f)
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-retrain-x$f").toString
      val build = timed(graft.operators.DedupIndex.writeVectors(
        vecs, "vec_id", "embedding", idxDir, planes = 2, dim = 64))
      val absorb = timed(graft.operators.DedupIndex.appendVectors(
        fresh, "vec_id", "embedding", idxDir))
      val retrain = timed(
        graft.operators.DedupIndex.retrainVectors(spark, idxDir))
      // the settled check: same selection -> pure scan, no rewrite
      var reran = false
      val check = timed {
        reran = graft.operators.DedupIndex
          .retrainVectorsIfNeeded(spark, idxDir)
      }
      val probeBatch = vecs.filter(col("vec_id") % 1000 === 7).limit(500)
      val probe = timed {
        graft.operators.Similarity.ivfSq8TopKIndexed(
          probeBatch, "vec_id", "embedding",
          graft.operators.DedupIndex.loadVectors(spark, idxDir),
          5, nprobe = 3).count()
      }
      // saturate the frozen ranges: a fixed batch 3x outside the
      // corpus value range — every component encodes clamped, arming
      // the rebuild gate
      val hot = (0L until 2000L).map { i =>
        (8100000000L + i, Array.tabulate(64)(d =>
          ((((i * 31 + d * 7) % 997).toFloat / 997f) * 2f - 1f) * 3f))
      }.toDF("vec_id", "embedding")
      val satAbsorb = timed(graft.operators.DedupIndex.appendVectors(
        hot, "vec_id", "embedding", idxDir))
      var rebuilt = false
      val rebuild = timed {
        rebuilt = graft.operators.DedupIndex
          .rebuildVectorsIfSaturated(spark, idxDir, 0.0001)
      }
      var rebuiltAgain = false
      val satCheck = timed {
        rebuiltAgain = graft.operators.DedupIndex
          .rebuildVectorsIfSaturated(spark, idxDir, 0.0001)
      }
      println(f"x$f%-4d build $build%8.2f s  absorb $absorb%6.2f s  " +
        f"retrain $retrain%8.2f s  check $check%6.2f s " +
        f"(reran=$reran)  probe $probe%6.2f s  " +
        f"rebuild $rebuild%8.2f s (ran=$rebuilt)  " +
        f"satcheck $satCheck%6.2f s (reran=$rebuiltAgain)")
      results(f) = Map("build" -> build, "absorb" -> absorb,
        "retrain" -> retrain, "check" -> check, "probe" -> probe,
        "check_reran" -> (if (reran) 1.0 else 0.0),
        "sat_absorb" -> satAbsorb, "rebuild" -> rebuild,
        "rebuild_ran" -> (if (rebuilt) 1.0 else 0.0),
        "sat_check" -> satCheck,
        "sat_check_reran" -> (if (rebuiltAgain) 1.0 else 0.0))
    }

    val lines = results.map { case (f, m) =>
      s""""x$f":{${m.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(",")}}"""
    }
    val json = s"""{"metric":"ivf_retrain_stress","src":"$srcSf",""" +
      s""""factors":[${factors.mkString(",")}],""" +
      s""""batch_rows":2000,""" +
      s""""scales":{${lines.mkString(",")}}}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RETRAIN_OUT",
        "/root/repo/BENCH_IVFRETRAIN_r13.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
