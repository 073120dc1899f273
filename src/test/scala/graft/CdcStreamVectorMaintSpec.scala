package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CDC maintenance sinks for the VECTOR index: retire-from-probe,
  * autoRetrain/autoRebuild geometry escalation, SQ8 probe parity, and
  * stream-grown indexes replaying as no-ops.
  */
class CdcStreamVectorMaintSpec extends CdcStreamSpecBase {
  import spark.implicits._

  test("index-aware streaming embedding probe ignores retired vectors") {
    val dir = Files.createTempDirectory("stream_endret").toString
    val idxDir = Files.createTempDirectory("stream_endret_idx").toString
    val dim = 8
    def vec(j: Int): Array[Float] = Array.tabulate(dim)(
      d => 10f + ((j + d * 3) % 5) * 0.1f)
    // both corpus vectors sit in one cluster; retiring 100 must leave
    // only 101 pairing the arrival
    graft.operators.DedupIndex.writeVectors(
      Seq((100L, vec(1)), (101L, vec(2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    graft.operators.DedupIndex.retireVectors(
      Seq(100L).toDF("vec_id"), "vec_id", idxDir)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    Seq((1L, vec(3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamIndexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("endret_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("endret_out")
      .filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.distinct
    assert(pairs === Seq((101L, 1L)),
      s"retired vector must not pair the stream probe: $pairs")
  }

  test("CDC vector index maintenance sink: deletes retire from the cosine probe") {
    val dir = Files.createTempDirectory("stream_vecmaint").toString
    val idxDir = Files.createTempDirectory("stream_vecmaint_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecmaint_c").toString
    val dim = 8
    def vec(cluster: Int, j: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((j + d * 3) % 5) * 0.1f)
    graft.operators.DedupIndex.writeVectors(
      Seq((1L, vec(0, 1)), (2L, vec(1, 2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)

    // stream: insert 3 (cluster 0), delete 2 (cluster 1's only member)
    Seq(("I", 1L, 3L, vec(0, 2)), ("D", 2L, 2L, vec(1, 2)))
      .toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    val pairs = graft.operators.Similarity
      .incrementalCosineNearDupsIndexed(
        Seq((101L, vec(0, 3)), (102L, vec(1, 4)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", idx, threshold = 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq.sorted
    // cluster-0 probe pairs corpus 1 AND the absorbed 3; the deleted 2
    // no longer pairs the cluster-1 probe
    assert(pairs === Seq((1L, 101L), (3L, 101L)), pairs)
  }

  test("CDC vector maintenance sink: autoRetrain keeps IVF centroids on the live selection") {
    val dir = Files.createTempDirectory("stream_vecretrain").toString
    val idxDir = Files.createTempDirectory("stream_vecretrain_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecretrain_c").toString
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(
      d => (if (i % 2 == 0) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    // build over 30 evens (selection = md5 top-20 of those), then stream
    // in 30 odds and delete one even — the live selection must follow
    graft.operators.DedupIndex.writeVectors(
      (0L until 60L by 2).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    val events =
      (1L until 60L by 2).map(i => ("I", i + 100L, i, vec(i))) :+
        (("D", 500L, 0L, vec(0L)))
    events.toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"), autoRetrainEvery = Some(1))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    val live = ((2L until 60L by 2) ++ (1L until 60L by 2))
      .map(i => (i, vec(i)))
    val want = graft.operators.Similarity.selectCentroids(
        live.toDF("vec_id", "embedding"), "vec_id", 20)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val have = idx.centroids.select(col("cent_id"))
      .collect().map(_.getLong(0)).toSet
    assert(have === want,
      "maintained index serves centroids trained on a dead corpus")
    // and the maintained selection settled — nothing left to retrain
    assert(!graft.operators.DedupIndex.retrainVectorsIfNeeded(spark, idxDir))
    // a non-positive cadence would run the O(corpus) scan per batch —
    // reject it loudly instead of silently coercing
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"), autoRetrainEvery = Some(0))
    }
  }

  test("CDC vector maintenance sink: autoRebuild escalates to fresh quantization geometry on saturation") {
    val dir = Files.createTempDirectory("stream_vecrebuild").toString
    val idxDir = Files.createTempDirectory("stream_vecrebuild_idx").toString
    val ckpt = Files.createTempDirectory("stream_vecrebuild_c").toString
    val dim = 8
    def vec(i: Long, c: Float): Array[Float] = Array.tabulate(dim)(
      d => c + ((i * 7 + d * 3) % 5) * 0.1f)
    graft.operators.DedupIndex.writeVectors(
      (0L until 40L by 2).map(i => (i, vec(i, 10f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", idxDir, planes = 2, dim = dim)
    // the streamed inserts land FAR outside the trained per-dim ranges:
    // under frozen geometry every one of their components would encode
    // clamped — the drift retrain cannot repair
    (1L until 40L by 2).map(i => ("I", i + 100L, i, vec(i, 60f)))
      .toDF(C.Op, "seq", "vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexMaintenance(stream, "vec_id",
      "embedding", idxDir, ckpt, col("seq"),
      autoRebuildEvery = Some((1, 0.01)))
    try q.processAllAvailable() finally q.stop()

    // the sink rebuilt: stored ranges span the absorbed corpus, so the
    // saturation signal reads zero and the stored codes match a fresh
    // build over the live rows
    assert(graft.operators.DedupIndex.sq8Saturation(spark, idxDir)._1 === 0L,
      "maintained index still serves saturated codes under stale ranges")
    val freshDir = Files.createTempDirectory("stream_vecrebuild_f").toString
    graft.operators.DedupIndex.writeVectors(
      ((0L until 40L by 2).map(i => (i, vec(i, 10f))) ++
        (1L until 40L by 2).map(i => (i, vec(i, 60f))))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", freshDir, planes = 2, dim = dim)
    def codes(d: String) = graft.operators.DedupIndex
      .loadVectors(spark, d).buckets.select($"id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(idxDir) === codes(freshDir))
    // invalid knobs are rejected loudly
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"),
        autoRebuildEvery = Some((0, 0.01)))
    }
    intercept[IllegalArgumentException] {
      CdcStream.startVectorIndexMaintenance(stream, "vec_id",
        "embedding", idxDir, ckpt, col("seq"),
        autoRebuildEvery = Some((1, 1.5)))
    }
  }

  test("streaming SQ8 probe bit-matches the batch SQ8 indexed probe") {
    val dir = Files.createTempDirectory("stream_esq8").toString
    val dim = 8
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_esq8_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(1, 4)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamSq8Indexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("esq8_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("esq8_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L), (101L, 2L), (101L, 3L)),
      s"same pair set as the float probe on this fixture: $pairs")

    // corpus-pair scores carry quantization, so they differ from the
    // float probe — but must be BIT-identical to the batch SQ8 probe
    val batchScores = graft.operators.Similarity
      .incrementalCosineNearDupsSq8Indexed(
        spark.read.parquet(s"$dir/b*/"), "vec_id", "embedding", idx,
        threshold = 0.9)
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val streamCorpusScores = cands.filter(_._1 >= 100L).distinct.sorted
    assert(streamCorpusScores === batchScores)
    assert(streamCorpusScores.nonEmpty)
  }

  test("streaming absorb sink grows the vector index; a replayed stream is a no-op") {
    val dir = Files.createTempDirectory("stream_absorb").toString
    val dim = 8
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_absorb_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)

    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(0, 2))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    def arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.startVectorIndexAbsorb(arrivals, "vec_id",
      "embedding", idxDir,
      Files.createTempDirectory("stream_absorb_ck1").toString)
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    assert(idx.buckets.select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 100L, 101L))
    assert(idx.lists.count() === 5, "inverted lists must grow in step")

    // absorbed arrivals are immediately probe-visible
    val probe = graft.operators.Similarity.incrementalCosineNearDupsIndexed(
      Seq((10L, vec(0, 3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(probe.contains((1L, 10L)),
      s"absorbed vector 1 must be probe-visible, got $probe")

    // the worst replay case — same files, checkpoint LOST — re-lands as
    // a row-for-row no-op through the per-id freshness anti-join
    val q2 = CdcStream.startVectorIndexAbsorb(arrivals, "vec_id",
      "embedding", idxDir,
      Files.createTempDirectory("stream_absorb_ck2").toString)
    try q2.processAllAvailable() finally q2.stop()
    val after = graft.operators.DedupIndex.loadVectors(spark, idxDir)
    assert(after.buckets.count() === 5 && after.lists.count() === 5,
      "replayed micro-batches must not duplicate index rows")
  }

}
