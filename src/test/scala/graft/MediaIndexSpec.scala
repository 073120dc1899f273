package graft

import graft.operators.{Dedup, DedupIndex, MediaCodecs}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The persisted MEDIA (perceptual-hash) dedup index — the fourth
  * near-dup modality's corpus side: probes against a loaded index must
  * (a) reproduce the recompute form bit-exactly, (b) never re-fetch or
  * re-DECODE corpus payloads (the expensive half at 100 TB), (c) keep
  * the corpus side shuffle-free on the bucketed layout, and (d) carry
  * the full generational CDC lifecycle (absorb/refresh/retire/
  * resurrect/compact) with crash-atomic staged commits, exactly like
  * the text/vector/lexical indexes.
  */
/** Deterministic binary-image fixture shared by the media-index and
  * streaming specs: a 16×8 grayscale BMP per id — the ONE shared
  * synthesis ([[graft.operators.SyntheticMedia]], which the
  * oracle-gated query fixture and the stress harness also call, so the
  * oracle's analytic code derivation can never drift from what the
  * specs feed the real decode path).
  */
object MediaFixture {
  def bmpOf(template: String, noise: String): Array[Byte] =
    graft.operators.SyntheticMedia.bmp(template, noise)

  /** Groups of 4: members 0/1 byte-identical payloads (exact dups —
    * Hamming 0 and equal content hashes), member 2 same template with
    * fresh noise (perceptually near), member 3 its own template
    * (distinct).
    */
  def mkMedia(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
    ids.map { i =>
      val g = i / 4
      i % 4 match {
        case 0 | 1 => (i, bmpOf(s"group$g", s"common$g"))
        case 2     => (i, bmpOf(s"group$g", s"near$i"))
        case _     => (i, bmpOf(s"solo${i * 37}", s"n$i"))
      }
    }

  def mediaDf(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, Array[Byte])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, b) => org.apache.spark.sql.Row(i, b) }, 4),
      schema)
  }
}

class MediaIndexSpec extends SparkSpec {
  import spark.implicits._
  import MediaFixture.{bmpOf, mkMedia}

  private def mediaDf(rows: Seq[(Long, Array[Byte])]): DataFrame =
    MediaFixture.mediaDf(spark, rows)

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
  }

  test("indexed media probe matches recompute bit-exactly, never touching corpus payloads") {
    CachedPlans.clear()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-midx-corpus").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx").toString
    // corpus payloads are FILE-backed so a leaked payload fetch (and
    // with it a re-decode) would show up in the probe's inputFiles
    mediaDf(mkMedia((0L until 120L).filter(_ % 2 == 0)))
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val batch = mediaDf(mkMedia((0L until 120L).filter(_ % 2 == 1)))

    DedupIndex.writeMedia(corpus, "doc_id", "payload", indexDir)
    val idx = DedupIndex.loadMedia(spark, indexDir)
    assert(idx.params === DedupIndex.MediaParams(4,
      spark.conf.get("spark.sql.shuffle.partitions").toInt))

    val probeIdx = Dedup.incrementalAhashNearDupsReportIndexed(
      batch, "doc_id", "payload", idx).pairs
    val probeRe = Dedup.incrementalAhashNearDupsReport(
      batch, corpus, "doc_id", "payload").pairs
    assert(sortedRows(probeIdx) === sortedRows(probeRe))
    // members 0/1 of each group straddle the parity split → Hamming-0
    // pairs must exist (vacuity guard)
    assert(probeIdx.count() > 0, "fixture must produce near-dup pairs")

    val files = probeIdx.inputFiles
    assert(files.nonEmpty, "probe should read the index parquet")
    assert(files.forall(!_.contains(corpusDir)),
      s"probe fetched corpus payloads:\n${files.mkString("\n")}")
    assert(files.forall(_.contains(indexDir)),
      s"unexpected extra input:\n${files.mkString("\n")}")
  }

  test("media bucket aggregation and probe join run without exchanging the index") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-plan").toString
    DedupIndex.writeMedia(
      mediaDf(mkMedia((0L until 200L).filter(_ % 2 == 0))),
      "doc_id", "payload", indexDir)
    val idx = DedupIndex.loadMedia(spark, indexDir)
    // the oversized-bucket aggregate leads with the bucket column, so
    // HashPartitioning(bkey) satisfies the clustering — no Exchange
    val agg = idx.bandKeys
      .groupBy(col("bkey"), col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_size"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucket-size aggregate shuffles the index:\n$aggPlan")
    assert(agg.count() > 0)
    // the candidate join on the composite bucket key engages the
    // bucketed scan: with broadcast off, the ONLY Exchange is the new
    // batch's
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newBands = (0 until 40)
        .map(i => (s"${i % 4}|${i}", 9000L + i)).toDF("bkey", "b_id")
      val joined = idx.bandKeys.select(col("bkey"), col("id").as("a_id"))
        .join(newBands, Seq("bkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"probe join must use the bucketed scan:\n$plan")
      val exchanges = plan.split("\n").count(_.contains("Exchange"))
      assert(exchanges === 1,
        s"expected exactly the new-batch Exchange, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("media CDC lifecycle: absorb/refresh/retire/resurrect/compact keep probes equal to live-set recompute") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-cdc").toString
    val even = mkMedia((0L until 80L).filter(_ % 2 == 0))
    val batch = mediaDf(mkMedia((0L until 80L).filter(_ % 2 == 1)))
    DedupIndex.writeMedia(mediaDf(even), "doc_id", "payload", indexDir)

    def probe(): DataFrame = Dedup.incrementalAhashNearDupsReportIndexed(
      batch, "doc_id", "payload",
      DedupIndex.loadMedia(spark, indexDir)).pairs
    def recompute(live: Seq[(Long, Array[Byte])]): DataFrame =
      Dedup.incrementalAhashNearDupsReport(
        batch, mediaDf(live), "doc_id", "payload").pairs

    // absorb new ids + replay the whole original corpus (no-op rows)
    val grown = mkMedia(Seq(200L, 201L, 202L, 203L))
    DedupIndex.appendMedia(mediaDf(grown ++ even), "doc_id", "payload",
      indexDir)
    val afterGrow = even ++ grown
    assert(sortedRows(probe()) === sortedRows(recompute(afterGrow)))
    // the replay must not have duplicated any rows: distinct ids ==
    // stored live rows
    val live0 = DedupIndex.loadMedia(spark, indexDir).codes
    assert(live0.count() === live0.select("id").distinct().count(),
      "replayed absorb duplicated ledger rows")

    // refresh: id 0 re-absorbs with DIFFERENT bytes (its group-2
    // member's image — new content hash AND new code)
    val refreshed = (0L, bmpOf("group0", "nearX")) +:
      afterGrow.filterNot(_._1 == 0L)
    DedupIndex.appendMedia(mediaDf(Seq(refreshed.head)), "doc_id",
      "payload", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(refreshed)))

    // retire a slice (CDC DELETE): ids 0..19 even
    val dead = (0L until 20L by 2).toSeq
    DedupIndex.retireMedia(dead.toDF("doc_id"), "doc_id", indexDir)
    val afterRetire = refreshed.filterNot(r => dead.contains(r._1))
    assert(sortedRows(probe()) === sortedRows(recompute(afterRetire)))
    // replayed delete: no-op
    DedupIndex.retireMedia(dead.toDF("doc_id"), "doc_id", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(afterRetire)))

    // resurrect id 2 with its ORIGINAL bytes (generation-scoped
    // tombstones — an id-keyed tombstone would keep it dead)
    val res = even.find(_._1 == 2L).get
    DedupIndex.appendMedia(mediaDf(Seq(res)), "doc_id", "payload",
      indexDir)
    val afterRes = afterRetire :+ res
    assert(sortedRows(probe()) === sortedRows(recompute(afterRes)))

    // compact: tombstones physically reclaimed, probe unchanged
    val before = sortedRows(probe())
    DedupIndex.compactMedia(spark, indexDir)
    assert(sortedRows(probe()) === before)
    val raw = DedupIndex.loadMedia(spark, indexDir)
    assert(raw.tombstones.count() === 0,
      "compaction must clear the tombstone set")
    assert(sortedRows(probe()) === sortedRows(recompute(afterRes)))
  }

  test("a crash mid-media-absorb rolls back; the retry cannot duplicate rows") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-crash").toString
    val even = mkMedia((0L until 40L).filter(_ % 2 == 0))
    DedupIndex.writeMedia(mediaDf(even), "doc_id", "payload", indexDir)
    val batch = mediaDf(mkMedia(Seq(100L, 101L, 102L, 103L)))

    // crash after ONE component moved live (mcodes in, mbands not)
    DedupIndex.testCrashAfterComponentMoves = 1
    try {
      intercept[RuntimeException] {
        DedupIndex.appendMedia(batch, "doc_id", "payload", indexDir)
      }
    } finally DedupIndex.testCrashAfterComponentMoves = -1

    // the next load recovers (manifest rollback), and the retried
    // absorb lands exactly once
    DedupIndex.appendMedia(batch, "doc_id", "payload", indexDir)
    val idx = DedupIndex.loadMedia(spark, indexDir)
    assert(idx.codes.count() ===
      idx.codes.select("id").distinct().count(),
      "torn commit left duplicate ledger rows")
    assert(idx.codes.count() === even.size + 4L)
    // and the probe equals the recompute over the union
    val probe = Dedup.incrementalAhashNearDupsReportIndexed(
      mediaDf(mkMedia(Seq(5L, 7L))), "doc_id", "payload", idx).pairs
    val re = Dedup.incrementalAhashNearDupsReport(
      mediaDf(mkMedia(Seq(5L, 7L))),
      mediaDf(even ++ mkMedia(Seq(100L, 101L, 102L, 103L))),
      "doc_id", "payload").pairs
    assert(sortedRows(probe) === sortedRows(re))
  }

  test("delta-maintained bucket sizes equal live band counts through every verb") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-sizes").toString
    val even = mkMedia((0L until 60L).filter(_ % 2 == 0))
    DedupIndex.writeMedia(mediaDf(even), "doc_id", "payload", indexDir)

    def check(when: String): Unit = {
      val idx = DedupIndex.loadMedia(spark, indexDir)
      val fromDeltas = sortedRows(idx.bucketSizes)
      val fromRows = sortedRows(idx.bandKeys.groupBy(col("bkey"))
        .agg(count(lit(1)).as("n")))
      assert(fromDeltas === fromRows,
        s"$when: delta-served sizes diverged from live band counts")
      assert(fromDeltas.nonEmpty, s"$when: vacuous (no buckets)")
    }
    check("fresh build")
    DedupIndex.appendMedia(mediaDf(mkMedia(Seq(200L, 201L, 202L))),
      "doc_id", "payload", indexDir)
    check("after absorb")
    // refresh: id 0 changes bytes — its old generation's contributions
    // must reverse while the new ones land
    DedupIndex.appendMedia(mediaDf(Seq((0L, bmpOf("group0", "nearQ")))),
      "doc_id", "payload", indexDir)
    check("after refresh")
    DedupIndex.retireMedia((0L until 20L by 2).toDF("doc_id"),
      "doc_id", indexDir)
    check("after retire")
    // replayed retire commits nothing — sizes must not double-reverse
    DedupIndex.retireMedia((0L until 20L by 2).toDF("doc_id"),
      "doc_id", indexDir)
    check("after replayed retire")
    DedupIndex.appendMedia(mediaDf(even.filter(_._1 == 2L)),
      "doc_id", "payload", indexDir)
    check("after resurrect")
    DedupIndex.compactMedia(spark, indexDir)
    check("after compact")
    // and the probe actually serves the cap from the deltas: its input
    // includes the msizes component, and NO (bkey, band, band_key)
    // aggregate over the full band table remains in its plan. The probe
    // batch MUST collide with the live corpus (21 pairs with live 20):
    // an empty candidate set legitimately folds the whole verify join
    // to an empty relation (the candidate-id prune's fast path), which
    // would make this lineage guard vacuous
    val probe = Dedup.incrementalAhashNearDupsReportIndexed(
      mediaDf(mkMedia(Seq(21L, 23L))), "doc_id", "payload",
      DedupIndex.loadMedia(spark, indexDir)).pairs
    assert(probe.count() > 0, "probe must produce pairs (vacuous guard)")
    assert(probe.inputFiles.exists(_.contains("msizes")),
      "probe does not read the delta-maintained sizes — vacuous switch")
    // and the candidate stage's stored-side scan is PRUNED to the
    // batch's touched bucket keys (SelectedBucketsCount in the scan) —
    // the term BENCH_MEDIA_r14b measured still growing at ×100
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"probe's stored band scan is not bucket-pruned:\n$plan")
  }

  test("audio-energy media index: probe == recompute through lifecycle verbs; coder pinned") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-audio").toString
    // audio twin of mkMedia: members 0/1 byte-identical, member 2 same
    // template fresh noise (energy-envelope-near), member 3 distinct
    def wavOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.wav(t, n)
    def mkAudio(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, wavOf(s"agrp$g", s"acom$g"))
          case 2     => (i, wavOf(s"agrp$g", s"anear$i"))
          case _     => (i, wavOf(s"asolo${i * 37}", s"an$i"))
        }
      }
    val even = mkAudio((0L until 80L).filter(_ % 2 == 0))
    val batch = mediaDf(mkAudio((0L until 80L).filter(_ % 2 == 1)))
    DedupIndex.writeMedia(mediaDf(even), "doc_id", "payload", indexDir,
      coder = "audio_energy")
    assert(DedupIndex.loadMedia(spark, indexDir).params.coder ===
      "audio_energy")

    def probe(): DataFrame = Dedup.incrementalAhashNearDupsReportIndexed(
      batch, "doc_id", "payload",
      DedupIndex.loadMedia(spark, indexDir)).pairs
    def recompute(live: Seq[(Long, Array[Byte])]): DataFrame =
      Dedup.incrementalAudioHashNearDupsReport(
        batch, mediaDf(live), "doc_id", "payload").pairs
    assert(sortedRows(probe()) === sortedRows(recompute(even)))
    assert(probe().count() > 0, "audio fixture must produce near-dup pairs")

    // absorb + retire keep the probe equal to the live-set recompute —
    // the shared generational machinery serves the audio coder unchanged
    val grown = mkAudio(Seq(200L, 201L, 202L, 203L))
    DedupIndex.appendMedia(mediaDf(grown), "doc_id", "payload", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(even ++ grown)))
    val dead = (0L until 20L by 2).toSeq
    DedupIndex.retireMedia(dead.toDF("doc_id"), "doc_id", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(
      (even ++ grown).filterNot(r => dead.contains(r._1)))))

    // coder pinning: a batch of IMAGE payloads against the audio index
    // fails the RIFF parse (NULL codes — inert), never cross-matching
    // code spaces
    val imgBatch = mediaDf(Seq((301L, bmpOf("agrp0", "acom0"))))
    val crossed = Dedup.incrementalAhashNearDupsReportIndexed(
      imgBatch, "doc_id", "payload",
      DedupIndex.loadMedia(spark, indexDir)).pairs
    assert(crossed.count() === 0,
      "image payloads must be inert against an audio-coder index")
  }

  test("video-framehash media index: probe == recompute through lifecycle verbs; all three code spaces inert") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-video").toString
    // video twin of mkMedia: members 0/1 byte-identical clips, member 2
    // same template fresh per-frame noise (pooled-gray-near), member 3
    // distinct footage
    def gifOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.gif(t, n)
    def mkVideo(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, gifOf(s"vgrp$g", s"vcom$g"))
          case 2     => (i, gifOf(s"vgrp$g", s"vnear$i"))
          case _     => (i, gifOf(s"vsolo${i * 37}", s"vn$i"))
        }
      }
    val even = mkVideo((0L until 80L).filter(_ % 2 == 0))
    val batch = mediaDf(mkVideo((0L until 80L).filter(_ % 2 == 1)))
    DedupIndex.writeMedia(mediaDf(even), "doc_id", "payload", indexDir,
      coder = "video_framehash")
    assert(DedupIndex.loadMedia(spark, indexDir).params.coder ===
      "video_framehash")

    def probe(): DataFrame = Dedup.incrementalAhashNearDupsReportIndexed(
      batch, "doc_id", "payload",
      DedupIndex.loadMedia(spark, indexDir)).pairs
    def recompute(live: Seq[(Long, Array[Byte])]): DataFrame =
      Dedup.incrementalFrameHashNearDupsReport(
        batch, mediaDf(live), "doc_id", "payload").pairs
    assert(sortedRows(probe()) === sortedRows(recompute(even)))
    assert(probe().count() > 0, "video fixture must produce near-dup pairs")

    // absorb + retire keep the probe equal to the live-set recompute —
    // the shared generational machinery serves the third coder unchanged
    val grown = mkVideo(Seq(200L, 201L, 202L, 203L))
    DedupIndex.appendMedia(mediaDf(grown), "doc_id", "payload", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(even ++ grown)))
    val dead = (0L until 20L by 2).toSeq
    DedupIndex.retireMedia(dead.toDF("doc_id"), "doc_id", indexDir)
    assert(sortedRows(probe()) === sortedRows(recompute(
      (even ++ grown).filterNot(r => dead.contains(r._1)))))

    // coder pinning, all three spaces: WAV and BMP payloads against the
    // video index fail the GIF magic gate (NULL codes — inert), and GIF
    // payloads are equally inert against the audio coder's RIFF parse
    val wavBatch = mediaDf(Seq(
      (301L, graft.operators.SyntheticMedia.wav("vgrp0", "vcom0"))))
    val imgBatch = mediaDf(Seq((302L, bmpOf("vgrp0", "vcom0"))))
    Seq(wavBatch, imgBatch).foreach { foreign =>
      assert(Dedup.incrementalAhashNearDupsReportIndexed(
        foreign, "doc_id", "payload",
        DedupIndex.loadMedia(spark, indexDir)).pairs.count() === 0,
        "non-GIF payloads must be inert against a video-coder index")
    }
    assert(graft.operators.Multimodal.energyHashOf(
      gifOf("vgrp0", "vcom0")) === None,
      "GIF payloads must be inert in the audio code space")
    assert(graft.operators.Multimodal.frameSampleHashOf(
      graft.operators.SyntheticMedia.wav("vgrp0", "vcom0")) === None)
    assert(graft.operators.Multimodal.frameSampleHashOf(
      bmpOf("vgrp0", "vcom0")) === None)
  }

  test("undecodable payloads are inert ledger rows: no candidates, replay-idempotent") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-midx-junk").toString
    val good = mkMedia(Seq(0L, 1L, 2L, 3L))
    val junk: Seq[(Long, Array[Byte])] =
      Seq((90L, Array[Byte](1, 2, 3, 4, 5)), (91L, null))
    DedupIndex.writeMedia(mediaDf(good ++ junk), "doc_id", "payload",
      indexDir)
    val idx = DedupIndex.loadMedia(spark, indexDir)
    // every row keeps a ledger entry; junk rows carry NULL codes and no
    // band keys (the md5 of a NULL payload is NULL — still a ledger row)
    assert(idx.codes.count() === good.size + junk.size.toLong)
    assert(idx.codes.filter(col("ahash_hi").isNull).count() === 2)
    assert(idx.bandKeys.select("id").distinct().count() === good.size.toLong)
    // replaying the junk is a no-op (null-safe content comparison)
    DedupIndex.appendMedia(mediaDf(junk), "doc_id", "payload", indexDir)
    val again = DedupIndex.loadMedia(spark, indexDir)
    assert(again.codes.count() === good.size + junk.size.toLong,
      "replayed undecodable rows re-indexed instead of no-op")
    // and a probe containing junk emits no pairs for it
    val pairs = Dedup.incrementalAhashNearDupsReportIndexed(
      mediaDf(Seq((95L, Array[Byte](9, 9, 9, 9, 9)),
        (96L, good.head._2))),
      "doc_id", "payload", again).pairs
    assert(pairs.filter(col("b_id") === 95L).count() === 0)
    assert(pairs.filter(col("b_id") === 96L).count() > 0,
      "decodable probe row must still match (vacuity guard)")
  }
}
