package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector side of the persisted index: cosine/JL probes matching
  * recompute bit-exactly, vector CDC verbs, and the IVF geometry
  * ladder (retrain / rebuild / saturation gates / crash rollback).
  */
class DedupIndexVectorSpec extends DedupIndexSpecBase {
  import spark.implicits._

  test("indexed vector probe matches recompute bit-exactly, reading only the index") {
    CachedPlans.clear()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-idx-embcorpus").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-vec").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val all = (0L until 80L).map(i => (i, vec(i)))
    all.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val batch = all.filter(_._1 % 2 == 1).toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    val idx = DedupIndex.loadVectors(spark, indexDir)
    assert(idx.params.planes === 2 && idx.params.dim === dim)

    val probeIdx = Similarity.incrementalCosineNearDupsIndexed(
      batch, "vec_id", "embedding", idx, threshold = 0.9)
    val probeRe = Similarity.incrementalCosineNearDups(
      batch, corpus, "vec_id", "embedding", threshold = 0.9,
      planes = 2, dim = dim)
    assert(sortedRows(probeIdx) === sortedRows(probeRe))
    assert(probeIdx.count() > 0, "fixture must produce near-dup pairs")

    val files = probeIdx.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(indexDir)),
      s"probe must read only the index:\n${files.mkString("\n")}")

    // the FLOAT probe's scan of the fmt-3 buckets table must prune the
    // SQ8 payload (codes, rnorm) — otherwise every float probe drags ¼
    // extra bytes per row through the bucketed scan for nothing
    val floatSchemas = probeIdx.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
      .filter(_.contains(indexDir.split("/").last))
    assert(floatSchemas.nonEmpty && floatSchemas.forall(l =>
      l.contains("vec:") && !l.contains("codes") && !l.contains("rnorm")),
      s"float probe must prune codes/rnorm:\n${floatSchemas.mkString("\n")}")

    // SQ8 payload: stored codes are uint8-bounded and the stored
    // reconstruction norm is close to the float norm
    val payload = idx.buckets
      .select(array_min(col("codes")).as("lo"),
        array_max(col("codes")).as("hi"),
        (abs(col("rnorm") - col("norm")) / col("norm")).as("relerr"))
      .agg(min(col("lo")), max(col("hi")), max(col("relerr")))
      .collect().head
    assert(payload.getInt(0) >= 0 && payload.getInt(1) <= 255)
    assert(payload.getDouble(2) < 0.01,
      s"reconstruction norm off by ${payload.getDouble(2)}")

    // the asymmetric probe reads codes, never the float vectors, and
    // finds the same pair set on these well-separated clusters
    val sq8Probe = Similarity.incrementalCosineNearDupsSq8Indexed(
      batch, "vec_id", "embedding", idx, threshold = 0.9)
    val readSchemas = sq8Probe.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
      .filter(_.contains(indexDir.split("/").last))
    assert(readSchemas.nonEmpty && readSchemas.forall(l =>
      l.contains("codes") && !l.contains("vec:")),
      s"asymmetric probe must scan codes, not floats:\n${readSchemas.mkString("\n")}")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairSet(sq8Probe) === pairSet(probeIdx))
    assert(pairSet(sq8Probe).nonEmpty)

    // kind mismatch is rejected loudly
    intercept[IllegalArgumentException] {
      DedupIndex.loadText(spark, indexDir)
    }
  }

  test("JL indexed probe matches recompute, scanning projections not floats") {
    CachedPlans.clear()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-idx-jlcorpus").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-jl").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val all = (0L until 80L).map(i => (i, vec(i)))
    all.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val batch = all.filter(_._1 % 2 == 1).take(4)
      .toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    val idx = DedupIndex.loadVectors(spark, indexDir)
    assert(idx.params.jlRdim === dim / 4) // the auto geometry

    val jlIdx = Similarity.jlTopKIndexed(batch, "vec_id", "embedding",
      idx, k = 5, cand = 10)
    val jlRe = Similarity.jlTopK(corpus, batch, "vec_id", "embedding",
      k = 5, cand = 10, rdim = idx.params.jlRdim, dim = dim)
    assert(sortedRows(jlIdx) === sortedRows(jlRe))
    assert(jlIdx.count() > 0)

    // stage 1 must scan the stored projections, never the floats or any
    // quantized payload — that byte discipline IS the indexed form's value
    val schemas = jlIdx.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
      .filter(_.contains(indexDir.split("/").last))
      .filter(_.contains("rvec"))
    assert(schemas.nonEmpty && schemas.forall(l =>
      !l.contains("<vec:") && !l.contains(",vec:") && !l.contains("codes")),
      s"JL stage 1 must scan rvec/rnormjl only:\n${schemas.mkString("\n")}")
  }

  test("JL indexed probe survives zero-norm vectors and still matches recompute") {
    CachedPlans.clear()
    // a zero-norm embedding makes cosineFrom NULL; the indexed form's
    // typed aggregator used to NPE decoding the nullable rscore into a
    // primitive Double while the recompute window merely ranked it last
    // — pin both forms equal on a corpus AND a batch holding zero vectors
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-idx-jlzero-c").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-jlzero").toString
    val dim = 8
    def vec(i: Long): Array[Float] =
      if (i % 13 == 0) Array.fill(dim)(0f) // degenerate corpus rows
      else Array.tabulate(dim)(d =>
        (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val all = (0L until 80L).map(i => (i, vec(i)))
    all.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    // batch: 3 normal queries + 1 zero-norm query
    val batch = (all.filter(_._1 % 2 == 1).take(3) :+
      (999L, Array.fill(dim)(0f))).toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    val idx = DedupIndex.loadVectors(spark, indexDir)
    val jlIdx = Similarity.jlTopKIndexed(batch, "vec_id", "embedding",
      idx, k = 5, cand = 10)
    val jlRe = Similarity.jlTopK(corpus, batch, "vec_id", "embedding",
      k = 5, cand = 10, rdim = idx.params.jlRdim, dim = dim)
    assert(sortedRows(jlIdx) === sortedRows(jlRe))
    assert(jlIdx.count() > 0)
  }

  test("CDC vector update: re-absorbing a changed vector refreshes the cosine probe; unchanged is a no-op") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-vecrefresh").toString
    val dim = 8
    def vec(i: Long, bump: Float): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f + bump)
    val corpusIds = (0L until 80L).filter(_ % 2 == 0)
    val updatedIds = corpusIds.filter(_ % 10 == 0)
    val corpus = corpusIds.map(i => (i, vec(i, 0f)))
      .toDF("vec_id", "embedding")
    // refreshed truth: the % 10 slice flipped to the opposite cluster
    val refreshed = corpusIds
      .map(i => (i, if (i % 10 == 0) vec(i, -20f) else vec(i, 0f)))
      .toDF("vec_id", "embedding")
    val batch = (0L until 80L).filter(_ % 2 == 1)
      .map(i => (i, vec(i, 0f))).toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    val updateBatch = corpusIds.filter(i => i % 10 == 0 || i % 6 == 0)
      .map(i => (i, if (i % 10 == 0) vec(i, -20f) else vec(i, 0f)))
      .toDF("vec_id", "embedding")
    DedupIndex.appendVectors(updateBatch, "vec_id", "embedding", indexDir)

    def probe() = Similarity.incrementalCosineNearDupsIndexed(
      batch, "vec_id", "embedding",
      DedupIndex.loadVectors(spark, indexDir), threshold = 0.99)
    val want = sortedRows(Similarity.incrementalCosineNearDups(
      batch, refreshed, "vec_id", "embedding", threshold = 0.99,
      planes = 2, dim = dim))
    assert(sortedRows(probe()) === want)
    assert(want !== sortedRows(Similarity.incrementalCosineNearDups(
      batch, corpus, "vec_id", "embedding", threshold = 0.99,
      planes = 2, dim = dim)),
      "vector refresh changed nothing — vacuous")
    val idx = DedupIndex.loadVectors(spark, indexDir)
    assert(idx.tombstones.count() === updatedIds.size)
    assert(idx.buckets.groupBy(col("id")).count()
      .filter(col("count") > 1).count() === 0)
    // the IVF lists carry exactly one LIVE row per refreshed id too —
    // the displaced generation's list entry is tombstone-filtered
    assert(idx.lists.groupBy(col("n_id")).count()
      .filter(col("count") > 1).count() === 0,
      "refreshed id live twice in the IVF lists")
    // replay: no-op
    def bucketFiles() = {
      val d = new java.io.File(s"$indexDir/buckets")
      d.listFiles.map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    }
    val before = bucketFiles()
    DedupIndex.appendVectors(updateBatch, "vec_id", "embedding", indexDir)
    assert(bucketFiles() === before, "replayed vector update wrote files")
    assert(sortedRows(probe()) === want)
    // compaction keeps the refreshed view on the tombstone-free path
    DedupIndex.compactVectors(spark, indexDir)
    assert(DedupIndex.loadVectors(spark, indexDir).tombstones.count() === 0)
    assert(sortedRows(probe()) === want)
  }

  test("retired vectors vanish from the cosine probe; vector compaction reclaims") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-vecretire").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val all = (0L until 80L).map(i => (i, vec(i)))
    val corpus = all.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
    val retired = all.map(_._1).filter(i => i % 2 == 0 && i % 10 == 0)
    val live = all.filter(t => t._1 % 2 == 0 && t._1 % 10 != 0)
      .toDF("vec_id", "embedding")
    val batch = all.filter(_._1 % 2 == 1).toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    DedupIndex.retireVectors(retired.toDF("vec_id"), "vec_id", indexDir)

    def probe() = Similarity.incrementalCosineNearDupsIndexed(
      batch, "vec_id", "embedding",
      DedupIndex.loadVectors(spark, indexDir), threshold = 0.9)
    val wantLive = Similarity.incrementalCosineNearDups(batch, live,
      "vec_id", "embedding", threshold = 0.9, planes = 2, dim = dim)
    val wantStale = Similarity.incrementalCosineNearDups(batch, corpus,
      "vec_id", "embedding", threshold = 0.9, planes = 2, dim = dim)
    assert(sortedRows(probe()) === sortedRows(wantLive))
    assert(probe().count() > 0)
    assert(sortedRows(probe()) !== sortedRows(wantStale),
      "vector retirement changed nothing — fixture is vacuous")
    // IVF lists lose the retired ids too
    assert(DedupIndex.loadVectors(spark, indexDir).lists
      .filter(col("n_id").isin(retired: _*)).count() === 0)

    DedupIndex.compactVectors(spark, indexDir)
    val compacted = DedupIndex.loadVectors(spark, indexDir)
    assert(compacted.tombstones.count() === 0)
    assert(compacted.buckets.filter(col("id").isin(retired: _*))
      .count() === 0, "retired vectors survived compaction")
    assert(sortedRows(probe()) === sortedRows(wantLive))
  }

  test("vector absorb matches recompute over the grown corpus; re-absorb is a no-op") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-vecabsorb").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val all = (0L until 90L).map(i => (i, vec(i)))
    val corpus = all.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    val absorbBatch = all.filter(_._1 % 3 == 1).toDF("vec_id", "embedding")
    val probeBatch = all.filter(_._1 % 3 == 2).toDF("vec_id", "embedding")

    DedupIndex.writeVectors(corpus, "vec_id", "embedding", indexDir,
      planes = 2, dim = dim)
    DedupIndex.appendVectors(absorbBatch, "vec_id", "embedding", indexDir)
    val idx = DedupIndex.loadVectors(spark, indexDir)
    val got = sortedRows(Similarity.incrementalCosineNearDupsIndexed(
      probeBatch, "vec_id", "embedding", idx, threshold = 0.9))
    val recompute = sortedRows(Similarity.incrementalCosineNearDups(
      probeBatch, corpus.union(absorbBatch), "vec_id", "embedding",
      threshold = 0.9, planes = 2, dim = dim))
    assert(got === recompute)
    assert(got.nonEmpty, "fixture must produce near-dup pairs")

    // absorbed rows were encoded under the index's FROZEN ranges: the
    // asymmetric probe agrees with the exact probe's pair set across
    // original and absorbed corpus alike
    val sq8Got = Similarity.incrementalCosineNearDupsSq8Indexed(
        probeBatch, "vec_id", "embedding", idx, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exactGot = got.map(r => (r(0).asInstanceOf[Long],
      r(1).asInstanceOf[Long])).toSet
    assert(sq8Got === exactGot)

    // absorbing the same batch again must not add a single row
    val before = idx.buckets.count()
    DedupIndex.appendVectors(absorbBatch, "vec_id", "embedding", indexDir)
    val grown = DedupIndex.loadVectors(spark, indexDir)
    assert(grown.buckets.count() === before)
    assert(grown.buckets.select(col("id")).distinct().count() === before,
      "duplicate ids in the vector index")
    assert(grown.lists.count() === before,
      "inverted lists out of step with the bucket table")

    // persisted-IVF probe over the grown index: absorbed vectors were
    // assigned under the FROZEN centroids and are discoverable; on
    // these well-separated clusters every neighbor shares the query's
    // cluster sign
    val ivfGot = Similarity.ivfSq8TopKIndexed(probeBatch, "vec_id",
        "embedding", grown, k = 5, nprobe = 1)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    assert(ivfGot.nonEmpty)
    assert(ivfGot.forall { case (q, n) => (q % 10 < 5) == (n % 10 < 5) },
      "probed list crossed cluster boundaries")
    val absorbIds = all.filter(_._1 % 3 == 1).map(_._1).toSet
    assert(ivfGot.map(_._2).toSet.intersect(absorbIds).nonEmpty,
      "no absorbed vector ever surfaced in a probed list")
  }

  // ------------------------------------------------- IVF retrain verb

  private val RetrainDim = 8

  /** Deterministic fixture vector: cluster center `c` plus a small
    * id/dim-dependent jitter, always inside (-10.5, 10.5).
    */
  private def rVec(i: Long, c: Float): Array[Float] =
    Array.tabulate(RetrainDim)(d => c + ((i * 7 + d * 3) % 5) * 0.1f)

  private def retrainProbe(idx: DedupIndex.VectorIndex): Seq[Seq[Any]] = {
    val q = (100L to 104L).map(i => (i, rVec(i, 5f)))
      .toDF("vec_id", "embedding")
    sortedRows(Similarity.ivfSq8TopKIndexed(q, "vec_id", "embedding",
      idx, 5, nprobe = 2))
  }

  private def centIds(idx: DedupIndex.VectorIndex): Set[Long] =
    idx.centroids.select(col("cent_id")).collect().map(_.getLong(0)).toSet

  test("retrain re-derives IVF geometry from the live corpus; probes match a fresh build") {
    CachedPlans.clear()
    // the per-dim extremes live in the BASE corpus and are never
    // retired, so the frozen SQ8 ranges equal the ranges a fresh build
    // over the grown live corpus would train — making probe equality
    // with that fresh build an exact (not approximate) expectation
    val base = Seq(
      (2L, Array.fill(RetrainDim)(20f)),
      (4L, Array.fill(RetrainDim)(-20f))) ++
      (0L until 40L).filter(i => i % 2 == 0 && i != 2 && i != 4)
        .map(i => (i, rVec(i, if (i % 10 < 5) 10f else -10f)))
    val absorb = (41L until 80L by 2).map(i => (i, rVec(i, 8f)))
    val retired = Seq(10L, 20L)
    val live = base.filterNot(t => retired.contains(t._1)) ++ absorb

    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrain").toString
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    DedupIndex.appendVectors(absorb.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    DedupIndex.retireVectors(retired.toDF("vec_id"), "vec_id", dir)
    val frozen = centIds(DedupIndex.loadVectors(spark, dir))

    DedupIndex.retrainVectors(spark, dir)
    val idx = DedupIndex.loadVectors(spark, dir)

    // centroids are EXACTLY the deterministic selection over live rows
    val want = Similarity.selectCentroids(
        live.toDF("vec_id", "embedding"), "vec_id", 20)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(centIds(idx) === want)
    assert(retired.forall(i => !centIds(idx).contains(i)),
      "a retired id survived as a centroid")
    assert(centIds(idx) !== frozen,
      "fixture is vacuous — absorb did not drift the selection")

    // probe equality against a from-scratch build over the live corpus
    // (same ranges by fixture construction, same deterministic
    // centroid selection, same codes — so bit-identical top-k)
    val freshDir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrain-fresh").toString
    DedupIndex.writeVectors(live.toDF("vec_id", "embedding"),
      "vec_id", "embedding", freshDir, planes = 2, dim = RetrainDim)
    val got = retrainProbe(idx)
    assert(got.nonEmpty)
    assert(got === retrainProbe(DedupIndex.loadVectors(spark, freshDir)))

    // replayed retrain is a no-op rewrite
    DedupIndex.retrainVectors(spark, dir)
    val again = DedupIndex.loadVectors(spark, dir)
    assert(centIds(again) === want)
    assert(retrainProbe(again) === got)
  }

  test("retrainVectorsIfNeeded runs only when the live selection drifted") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrainif").toString
    val base = (0L until 60L by 2).map(i => (i, rVec(i, 10f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    assert(!DedupIndex.retrainVectorsIfNeeded(spark, dir),
      "a just-built index must not need retraining")
    DedupIndex.appendVectors(
      (1L until 60L by 2).map(i => (i, rVec(i, -8f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    assert(DedupIndex.retrainVectorsIfNeeded(spark, dir),
      "doubling the corpus left the md5 top-20 unchanged — fixture broke")
    assert(!DedupIndex.retrainVectorsIfNeeded(spark, dir),
      "retrain must settle the selection")
  }

  test("a CDC refresh of a centroid id drifts the check even though the id set is unchanged") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrain-refresh").toString
    val base = (0L until 60L by 2).map(i => (i, rVec(i, 10f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    val centBefore = DedupIndex.loadVectors(spark, dir)
    val victim = centIds(centBefore).min
    // refresh the victim's CONTENT: same id, different vector — the
    // live id selection is unchanged, so an id-only check would skip
    // forever while probes rank cells against the displaced floats
    DedupIndex.appendVectors(
      Seq((victim, rVec(victim, -3f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    assert(DedupIndex.retrainVectorsIfNeeded(spark, dir),
      "content refresh of a centroid id must trigger a retrain")
    val after = DedupIndex.loadVectors(spark, dir)
    val got = after.centroids.filter(col("cent_id") === victim)
      .select(col("cent_vec")).collect().head.getSeq[Float](0)
    assert(got === rVec(victim, -3f).toSeq,
      "retrain kept the displaced generation's centroid floats")
    assert(!DedupIndex.retrainVectorsIfNeeded(spark, dir))
  }

  test("retraining a fully-retired corpus keeps the existing geometry") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrain-empty").toString
    val base = (0L until 40L by 2).map(i => (i, rVec(i, 10f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    val before = centIds(DedupIndex.loadVectors(spark, dir))
    DedupIndex.retireVectors(base.map(_._1).toDF("vec_id"), "vec_id", dir)
    // nothing live to train on: retrain must NOT commit an empty
    // centroid set (later absorbs would assign against zero cells and
    // stage no list rows), and the drift check must not loop on it
    DedupIndex.retrainVectors(spark, dir)
    assert(centIds(DedupIndex.loadVectors(spark, dir)) === before)
    assert(!DedupIndex.retrainVectorsIfNeeded(spark, dir))
    // a resurrecting absorb lands in REAL cells and is probe-visible
    DedupIndex.appendVectors(
      Seq((1001L, rVec(1001L, 10f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val idx = DedupIndex.loadVectors(spark, dir)
    assert(idx.lists.filter(col("n_id") === 1001L).count() === 1)
  }

  test("a crash mid-retrain rolls back to the pre-retrain geometry") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-retrain-crash").toString
    val base = (0L until 60L by 2).map(i => (i, rVec(i, 10f)))
    val absorb = (1L until 60L by 2).map(i => (i, rVec(i, -8f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    DedupIndex.appendVectors(absorb.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val beforeCent = centIds(DedupIndex.loadVectors(spark, dir))
    val beforeProbe = retrainProbe(DedupIndex.loadVectors(spark, dir))

    // crash after the centroids component moved live but before the
    // lists did — the torn state a reader must never observe durably
    DedupIndex.testCrashAfterComponentMoves = 1
    try {
      intercept[RuntimeException](DedupIndex.retrainVectors(spark, dir))
    } finally DedupIndex.testCrashAfterComponentMoves = -1

    // the next load recovers: old centroids and lists restored
    val recovered = DedupIndex.loadVectors(spark, dir)
    assert(centIds(recovered) === beforeCent)
    assert(retrainProbe(recovered) === beforeProbe)

    // and a clean retry completes the geometry repair
    DedupIndex.retrainVectors(spark, dir)
    val want = Similarity.selectCentroids(
        (base ++ absorb).toDF("vec_id", "embedding"), "vec_id", 20)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(centIds(DedupIndex.loadVectors(spark, dir)) === want)
  }

  // ------------------------------------------------ geometry REBUILD

  /** Stored per-dimension ranges of a vector index, read raw. */
  private def storedRanges(dir: String): Seq[(Double, Double)] =
    spark.read.parquet(s"$dir/ranges").orderBy(col("pos")).collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  test("rebuild re-derives the FULL geometry; index equals a fresh build over the live corpus") {
    CachedPlans.clear()
    // the absorbed batch EXCEEDS the build corpus's per-dim ranges (the
    // exact drift retrain cannot repair: its frozen ranges clamp these
    // components), so rebuild must move the stored ranges, re-encode
    // every stored code, and re-draw centroids — all gated below by
    // literal equality with a from-scratch build over the live corpus
    val base = (0L until 40L by 2).map(i => (i, rVec(i, 10f)))
    val absorb = (41L until 80L by 2).map(i => (i, rVec(i, 40f)))
    val retired = Seq(10L, 20L)
    val live = base.filterNot(t => retired.contains(t._1)) ++ absorb

    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-rebuild").toString
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    DedupIndex.appendVectors(absorb.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    DedupIndex.retireVectors(retired.toDF("vec_id"), "vec_id", dir)
    val frozenRanges = storedRanges(dir)

    DedupIndex.rebuildVectors(spark, dir)
    val idx = DedupIndex.loadVectors(spark, dir)

    val freshDir = java.nio.file.Files
      .createTempDirectory("graft-idx-rebuild-fresh").toString
    DedupIndex.writeVectors(live.toDF("vec_id", "embedding"),
      "vec_id", "embedding", freshDir, planes = 2, dim = RetrainDim)
    val fresh = DedupIndex.loadVectors(spark, freshDir)

    // ranges moved (fixture is non-vacuous) and match the fresh build
    assert(storedRanges(dir) !== frozenRanges,
      "fixture is vacuous — absorb did not exceed the build ranges")
    assert(storedRanges(dir) === storedRanges(freshDir))
    // PQ codebooks and centroid selection match the fresh derivation
    assert(idx.pqCodebooks === fresh.pqCodebooks)
    assert(centIds(idx) === centIds(fresh))
    assert(retired.forall(i => !centIds(idx).contains(i)),
      "a retired id survived as a centroid")
    // every live row's stored payload (SQ8 codes, PQ codes, bucket)
    // equals the fresh build's — the re-encode is complete, not partial
    def payload(i: DedupIndex.VectorIndex): Seq[Seq[Any]] =
      sortedRows(i.buckets.select(col("id"), col("bucket"), col("codes"),
        col("pqcodes")))
    assert(payload(idx) === payload(fresh))
    // and the probes agree bit-exactly
    val got = retrainProbe(idx)
    assert(got.nonEmpty)
    assert(got === retrainProbe(fresh))

    // replayed rebuild is a no-op rewrite
    DedupIndex.rebuildVectors(spark, dir)
    assert(payload(DedupIndex.loadVectors(spark, dir)) === payload(fresh))
  }

  test("rebuildVectorsIfSaturated gates on the measured clamp fraction and self-disarms") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-rebuildif").toString
    val base = (0L until 60L by 2).map(i => (i, rVec(i, 10f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    // a fresh build measures zero saturation by construction
    assert(DedupIndex.sq8Saturation(spark, dir) === ((0L, 60L / 2 * RetrainDim)))
    assert(!DedupIndex.rebuildVectorsIfSaturated(spark, dir, 0.01),
      "a just-built index must not need rebuilding")
    // absorb far outside the trained ranges: every absorbed component
    // encodes clamped
    DedupIndex.appendVectors(
      (1L until 20L by 2).map(i => (i, rVec(i, 100f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val (clamped, total) = DedupIndex.sq8Saturation(spark, dir)
    assert(clamped > 0, "fixture is vacuous — absorb did not saturate")
    // threshold above the measured fraction: no rebuild
    assert(!DedupIndex.rebuildVectorsIfSaturated(spark, dir,
      clamped.toDouble / total + 0.1))
    // threshold below it: rebuild runs, fresh ranges span the live
    // corpus, and the gate self-disarms
    assert(DedupIndex.rebuildVectorsIfSaturated(spark, dir, 0.01))
    assert(DedupIndex.sq8Saturation(spark, dir)._1 === 0L)
    assert(!DedupIndex.rebuildVectorsIfSaturated(spark, dir, 0.01),
      "rebuild must settle the saturation signal")
  }

  test("a crash mid-rebuild rolls back the WHOLE geometry — never fresh codes under stale ranges") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-rebuild-crash").toString
    val base = (0L until 60L by 2).map(i => (i, rVec(i, 10f)))
    val absorb = (1L until 60L by 2).map(i => (i, rVec(i, 60f)))
    DedupIndex.writeVectors(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, planes = 2, dim = RetrainDim)
    DedupIndex.appendVectors(absorb.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val beforeRanges = storedRanges(dir)
    val beforeProbe = retrainProbe(DedupIndex.loadVectors(spark, dir))

    // crash after buckets + centroids moved live but before lists,
    // ranges and pq_codebooks — rebuilt codes paired with stale ranges,
    // the torn state the single staged commit must make unobservable
    DedupIndex.testCrashAfterComponentMoves = 2
    try {
      intercept[RuntimeException](DedupIndex.rebuildVectors(spark, dir))
    } finally DedupIndex.testCrashAfterComponentMoves = -1

    val recovered = DedupIndex.loadVectors(spark, dir)
    assert(storedRanges(dir) === beforeRanges)
    assert(retrainProbe(recovered) === beforeProbe)

    // a clean retry completes the escalation: ranges now span the
    // absorbed corpus and the saturation signal reads zero
    DedupIndex.rebuildVectors(spark, dir)
    assert(storedRanges(dir) !== beforeRanges)
    assert(DedupIndex.sq8Saturation(spark, dir)._1 === 0L)
  }
}
