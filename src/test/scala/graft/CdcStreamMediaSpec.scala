package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming media modalities (image/audio/video) served from the
  * maintained media indexes, plus the day-in-the-life standing hybrid
  * search over all maintenance sinks.
  */
class CdcStreamMediaSpec extends CdcStreamSpecBase {
  import spark.implicits._

  test("streaming audio probe + maintenance serve the audio-coder media index via the pinned dispatch") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.mediaDf
    def wavOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.wav(t, n)
    // groups of 4, audio twin: 0/1 byte-identical, 2 template-near,
    // 3 distinct
    def mkAudio(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, wavOf(s"sgrp$g", s"scom$g"))
          case 2     => (i, wavOf(s"sgrp$g", s"snear$i"))
          case _     => (i, wavOf(s"ssolo${i * 37}", s"sn$i"))
        }
      }
    val dir = Files.createTempDirectory("stream_auprobe").toString
    val evDir = Files.createTempDirectory("stream_aumaint").toString
    val idxDir = Files.createTempDirectory("stream_auprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_auprobe_out").toString
    val corpus = mkAudio(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir,
      coder = "audio_energy")

    val b1 = Seq((1000L, wavOf("sgrp0", "scom0")),
      (1001L, wavOf("sgrp1", "snearZ")),
      (1002L, wavOf("nothing-like-it", "x")))
    mediaDf(spark, b1).coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    // the generic media stream probe serves the AUDIO index because the
    // coder rides the index params — no audio-specific sink exists or
    // is needed
    val q = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory("stream_auprobe_c1").toString)
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.exists(_._3 == 0), "byte-identical clip must pair at Hamming 0")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the maintenance sink: the absorb must
      // derive ENERGY codes (coder dispatch) — a new identical clip
      // pairs, a retired one stops
      mediaDf(spark, Seq((200L, wavOf("sgrp0", "scom0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(
          spark.read.parquet(s"$evDir/e1").schema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_aumaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()
      val b2 = Seq((2000L, wavOf("sgrp0", "scom0")))
      mediaDf(spark, b2).coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired clip still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed clip must pair the next trigger: $after")
    } finally q.stop()
  }

  test("streaming video probe + maintenance serve the framehash media index via the pinned dispatch") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.mediaDf
    def gifOf(t: String, n: String): Array[Byte] =
      graft.operators.SyntheticMedia.gif(t, n)
    // groups of 4, video twin: 0/1 byte-identical clips, 2
    // template-near (fresh per-frame noise), 3 distinct footage
    def mkVideo(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
      ids.map { i =>
        val g = i / 4
        i % 4 match {
          case 0 | 1 => (i, gifOf(s"tgrp$g", s"tcom$g"))
          case 2     => (i, gifOf(s"tgrp$g", s"tnear$i"))
          case _     => (i, gifOf(s"tsolo${i * 37}", s"tn$i"))
        }
      }
    val dir = Files.createTempDirectory("stream_viprobe").toString
    val evDir = Files.createTempDirectory("stream_vimaint").toString
    val idxDir = Files.createTempDirectory("stream_viprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_viprobe_out").toString
    val corpus = mkVideo(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir,
      coder = "video_framehash")

    val b1 = Seq((1000L, gifOf("tgrp0", "tcom0")),
      (1001L, gifOf("tgrp1", "tnearZ")),
      (1002L, gifOf("nothing-like-it", "x")))
    mediaDf(spark, b1).coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    // the generic media stream probe serves the VIDEO index because the
    // coder rides the index params — the third modality through the
    // same sinks, zero video-specific streaming code
    val q = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory("stream_viprobe_c1").toString)
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.exists(_._3 == 0), "byte-identical clip must pair at Hamming 0")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the maintenance sink: the absorb must
      // derive FRAME-SAMPLED codes (coder dispatch) — a new identical
      // clip pairs, a retired one stops
      mediaDf(spark, Seq((200L, gifOf("tgrp0", "tcom0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(
          spark.read.parquet(s"$evDir/e1").schema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_vimaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()
      val b2 = Seq((2000L, gifOf("tgrp0", "tcom0")))
      mediaDf(spark, b2).coalesce(1).write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired clip still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed clip must pair the next trigger: $after")
    } finally q.stop()
  }

  test("streaming media probe equals the batch indexed probe; the maintenance sink's commits land at the next trigger") {
    graft.plans.CachedPlans.clear()
    import MediaFixture.{bmpOf, mediaDf, mkMedia}
    val dir = Files.createTempDirectory("stream_mmprobe").toString
    val evDir = Files.createTempDirectory("stream_mmmaint").toString
    val idxDir = Files.createTempDirectory("stream_mmprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_mmprobe_out").toString
    // corpus: ids 0..15 — groups of 4 (0/1 byte-identical, 2 near,
    // 3 distinct)
    val corpus = mkMedia(0L until 16L)
    graft.operators.DedupIndex.writeMedia(
      mediaDf(spark, corpus), "doc_id", "payload", idxDir)

    def writeBatch(base: String, name: String,
        rows: Seq[(Long, Array[Byte])]): Unit =
      mediaDf(spark, rows).coalesce(1).write.parquet(s"$base/$name")
    // probe batch 1: 1000 is byte-identical to corpus 0/1 (Hamming 0),
    // 1001 shares group1's template (near), 1002 is its own template
    val b1 = Seq((1000L, bmpOf("group0", "common0")),
      (1001L, bmpOf("group1", "nearZ")),
      (1002L, bmpOf("nothing-like-it", "x")))
    writeBatch(dir, "b1", b1)
    val schema = spark.read.parquet(s"$dir/b1").schema
    def start(ck: String) = CdcStream.startAhashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "payload", idxDir, outDir,
      Files.createTempDirectory(ck).toString)
    val q = start("stream_mmprobe_c1")
    try {
      q.processAllAvailable()
      def expected(docs: Seq[(Long, Array[Byte])]) = graft.operators.Dedup
        .incrementalAhashNearDupsReportIndexed(
          mediaDf(spark, docs), "doc_id", "payload",
          graft.operators.DedupIndex.loadMedia(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.nonEmpty, "fixture must pair the stream probe")
      assert(got(Set(1000L, 1001L, 1002L)) === exp1)

      // mid-stream CDC through the MAINTENANCE SINK: insert 200 (another
      // byte-identical group0 copy), delete corpus id 0
      mediaDf(spark, Seq((200L, bmpOf("group0", "common0"))))
        .select(lit("I").as(C.Op), lit(1L).as("seq"), col("doc_id"),
          col("payload"))
        .unionByName(mediaDf(spark, Seq((0L, corpus.head._2)))
          .select(lit("D").as(C.Op), lit(2L).as("seq"), col("doc_id"),
            col("payload")))
        .coalesce(1).write.parquet(s"$evDir/e1")
      val evSchema = spark.read.parquet(s"$evDir/e1").schema
      val m = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(evSchema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_mmmaint_c1").toString,
        col("seq"))
      try m.processAllAvailable() finally m.stop()

      // the NEXT probe trigger sees the commit (index version marker):
      // 0 no longer pairs, 200 does
      val b2 = Seq((2000L, bmpOf("group0", "common0")))
      writeBatch(dir, "b2", b2)
      q.processAllAvailable()
      val after = got(Set(2000L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 0L),
        s"retired corpus image still pairs the stream probe: $after")
      assert(after.exists(_._1 == 200L),
        s"absorbed image must pair the next trigger: $after")
      assert(after.exists(_._1 == 1L), "surviving dup copy must pair")

      // checkpoint-lost replay rewrites each batch's own partition
      // against the CURRENT index — no stacking, no resurrection
      val qr = start("stream_mmprobe_c2")
      try qr.processAllAvailable() finally qr.stop()
      assert(got(Set(1000L, 1001L, 1002L)) === expected(b1),
        "replayed batch 1 must re-probe the live index, unduplicated")
      assert(!got(Set(1000L, 2000L)).exists(_._1 == 0L),
        "replay resurrected a retired pairing")

      // replayed MAINTENANCE from a fresh checkpoint: absorb and retire
      // both no-op — no duplicate ledger rows
      val m2 = CdcStream.startMediaIndexMaintenance(
        spark.readStream.schema(evSchema).parquet(s"$evDir/e*/"),
        "doc_id", "payload", idxDir,
        Files.createTempDirectory("stream_mmmaint_c2").toString,
        col("seq"))
      try m2.processAllAvailable() finally m2.stop()
      val codes = graft.operators.DedupIndex.loadMedia(spark, idxDir).codes
      assert(codes.groupBy($"id").count().filter($"count" > 1).isEmpty,
        "replayed maintenance stacked duplicate ledger rows")
      assert(got(Set(2000L)) === expected(b2),
        "replayed maintenance changed probe results")
    } finally q.stop()
  }

  test("day-in-the-life: standing hybrid search over all three maintenance sinks stays batch-exact after every commit") {
    graft.plans.CachedPlans.clear()
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(d => (((seed * 7 + d * 3) % 11) - 5).toFloat)
    def doc(i: Long) = s"daily$i corpus shared hybrid words token$i tail$i"
    def docV2(i: Long) = doc(i) + " revised second edition"

    val chDir = Files.createTempDirectory("dil-changes").toString
    val qDir = Files.createTempDirectory("dil-queries").toString
    val outDir = Files.createTempDirectory("dil-out").toString
    val lexDir = Files.createTempDirectory("dil-lex").toString
    val vecDir = Files.createTempDirectory("dil-vec").toString
    val txtDir = Files.createTempDirectory("dil-txt").toString

    // seed corpus 1..8, all three indexes built from it
    var live = (1L to 8L).map(i => i -> doc(i)).toMap
    var liveVec = (1L to 8L).map(i => i -> vec(i.toInt)).toMap
    graft.operators.DedupIndex.writeLexical(
      live.toSeq.toDF("doc_id", "text"), "doc_id", "text", lexDir,
      termNgram = 2)
    graft.operators.DedupIndex.writeVectors(
      liveVec.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
      vecDir, planes = 2, dim = dim)
    graft.operators.DedupIndex.writeText(
      live.toSeq.toDF("doc_id", "text"), "doc_id", "text", txtDir)

    def writeChanges(name: String,
        rows: Seq[(String, Long, Long, String, Array[Float])]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text", "embedding")
        .coalesce(1).write.parquet(s"$chDir/$name")
    def writeQueries(name: String,
        rows: Seq[(Long, String, Array[Float])]): Unit =
      rows.toDF("doc_id", "text", "embedding")
        .coalesce(1).write.parquet(s"$qDir/$name")
    // schema seeds so the file sources can start before day 1 arrives
    writeChanges("b0", Seq(("I", 0L, 1L, doc(1), vec(1))))
    writeQueries("q0", Seq((100L, doc(1), vec(1))))

    val chSchema = spark.read.parquet(s"$chDir/b0").schema
    val qSchema = spark.read.parquet(s"$qDir/q0").schema
    def changeStream = spark.readStream.schema(chSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$chDir/b*/")
    val maintTxt = CdcStream.startTextIndexMaintenance(changeStream,
      "doc_id", "text", txtDir,
      Files.createTempDirectory("dil-ck-txt").toString, col("seq"))
    val maintLex = CdcStream.startLexicalIndexMaintenance(changeStream,
      "doc_id", "text", lexDir,
      Files.createTempDirectory("dil-ck-lex").toString, col("seq"))
    val maintVec = CdcStream.startVectorIndexMaintenance(changeStream,
      "doc_id", "embedding", vecDir,
      Files.createTempDirectory("dil-ck-vec").toString, col("seq"))
    val search = CdcStream.startHybridSearch(
      spark.readStream.schema(qSchema).option("maxFilesPerTrigger", 1)
        .parquet(s"$qDir/q*/"),
      "doc_id", "text", "embedding", lexDir, vecDir, outDir,
      Files.createTempDirectory("dil-ck-q").toString, k = 3, legK = 3)

    // the staleness contract, asserted after EVERY commit: a search
    // micro-batch fired after the maintenance sinks commit must equal
    // the batch recompute on the live corpus — lexical leg recomputed
    // FROM SCRATCH on the live docs (the signed-delta contract), dense
    // leg the batch probe of the maintained index (the frozen-geometry
    // absorb contract), fused by the same integer-rank RRF.
    // a day's queries are written only AFTER its maintenance settles —
    // the standing search stream polls continuously, so writing them
    // earlier would race a search micro-batch against the commit
    def settleMaint(): Unit = {
      maintTxt.processAllAvailable(); maintLex.processAllAvailable()
      maintVec.processAllAvailable()
    }
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    def expectedFor(qs: Seq[(Long, String, Array[Float])])
        : Seq[(Long, Int, Long)] = {
      val queries = qs.toDF("doc_id", "text", "embedding")
      val lex = graft.operators.Retrieval
        .bm25TopK(live.toSeq.toDF("doc_id", "text"), queries,
          "doc_id", "text", "doc_id", "text", 3, 8, termNgram = 2)
        .filter(col("doc_id") =!= col("q_id"))
        .withColumn("rank", row_number().over(lexW))
        .select(col("q_id"), col("doc_id"), col("rank"))
      val den = graft.operators.Similarity.ivfSq8TopKIndexed(
          queries, "doc_id", "embedding",
          graft.operators.DedupIndex.loadVectors(spark, vecDir), 3,
          nprobe = 3)
        .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, den), 3)
        .select("q_id", "rank", "doc_id")
        .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    }
    def gotFor(qIds: Set[Long]): Seq[(Long, Int, Long)] =
      spark.read.parquet(outDir).filter(col("q_id").isin(qIds.toSeq: _*))
        .select("q_id", "rank", "doc_id")
        .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    def assertDay(qs: Seq[(Long, String, Array[Float])]): Unit = {
      val exp = expectedFor(qs)
      val got = gotFor(qs.map(_._1).toSet)
      assert(got.nonEmpty, "day produced no search results")
      assert(got === exp, s"stream $got\nbatch $exp")
    }

    // day 1: INSERT 9, UPDATE 2 (text and embedding both move)
    writeChanges("b1", Seq(("I", 1L, 9L, doc(9), vec(9)),
      ("U", 2L, 2L, docV2(2), vec(52))))
    live += (9L -> doc(9)); live += (2L -> docV2(2))
    liveVec += (9L -> vec(9)); liveVec += (2L -> vec(52))
    val day1Q = Seq((101L, doc(9), vec(9)), (102L, docV2(2), vec(52)))
    settleMaint(); writeQueries("q1", day1Q)
    search.processAllAvailable(); assertDay(day1Q)

    // day 2: DELETE 3, INSERT 10, UPDATE 9 — a doc inserted by stream
    writeChanges("b2", Seq(("D", 3L, 3L, doc(3), vec(3)),
      ("I", 4L, 10L, doc(10), vec(10)),
      ("U", 5L, 9L, docV2(9), vec(59))))
    live -= 3L; live += (10L -> doc(10)); live += (9L -> docV2(9))
    liveVec -= 3L; liveVec += (10L -> vec(10)); liveVec += (9L -> vec(59))
    val day2Q = Seq((201L, doc(3), vec(3)), (202L, doc(10), vec(10)))
    settleMaint(); writeQueries("q2", day2Q)
    search.processAllAvailable(); assertDay(day2Q)
    assert(!gotFor(Set(201L, 202L)).exists(_._3 == 3L),
      "deleted doc 3 still retrieved")

    // day 3: DELETE the stream-inserted 9, re-INSERT 3 (resurrection)
    writeChanges("b3", Seq(("D", 6L, 9L, docV2(9), vec(59)),
      ("I", 7L, 3L, doc(3), vec(3))))
    live -= 9L; live += (3L -> doc(3))
    liveVec -= 9L; liveVec += (3L -> vec(3))
    val day3Q = Seq((301L, docV2(9), vec(59)), (302L, doc(3), vec(3)))
    settleMaint(); writeQueries("q3", day3Q)
    search.processAllAvailable(); assertDay(day3Q)
    val day3 = gotFor(Set(301L, 302L))
    assert(!day3.exists(_._3 == 9L), "retired doc 9 still retrieved")
    assert(day3.exists(_._3 == 3L), "resurrected doc 3 never retrieved")

    // the maintained vector index serves exactly the live id set
    val servedIds = graft.operators.DedupIndex.loadVectors(spark, vecDir)
      .buckets.select("id").distinct().as[Long].collect().toSet
    assert(servedIds === liveVec.keySet)

    // the third sink's text index: every probe modality equals the
    // live-corpus recompute after three days of mixed I/U/D
    val probeBatch = Seq(401L -> doc(3), 402L -> docV2(9))
      .toDF("doc_id", "text")
    val liveDf = live.toSeq.toDF("doc_id", "text")
    val exactIdx = graft.operators.Dedup.incrementalExactIndexed(
      probeBatch, "doc_id", "text",
      graft.operators.DedupIndex.loadText(spark, txtDir))
    val exactRe = graft.operators.Dedup.incrementalExact(
      probeBatch, liveDf, "doc_id", "text")
    assert(exactIdx.orderBy("doc_id").collect().toSeq ===
      exactRe.orderBy("doc_id").collect().toSeq)
    val simIdx = graft.operators.Dedup
      .incrementalSimHashNearDupsReportIndexed(probeBatch, "doc_id",
        "text", graft.operators.DedupIndex.loadText(spark, txtDir))
      .pairs.orderBy("a_id", "b_id").collect().toSeq
    val simRe = graft.operators.Dedup.incrementalSimHashNearDupsReport(
        probeBatch, liveDf, "doc_id", "text")
      .pairs.orderBy("a_id", "b_id").collect().toSeq
    assert(simIdx === simRe)

    maintTxt.stop(); maintLex.stop(); maintVec.stop(); search.stop()
  }
}
