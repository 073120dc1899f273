package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CDC maintenance sinks for the TEXT and LEXICAL indexes: I/U/D
  * absorb/retire/refresh, replay no-ops, auto-compaction, and the
  * streaming probes staying bit-equal to their batch indexed forms.
  */
class CdcStreamMaintSpec extends CdcStreamSpecBase {
  import spark.implicits._

  test("streaming SimHash probe equals the batch indexed probe, sees mid-stream retires, replays clean") {
    graft.plans.CachedPlans.clear()
    val dir = Files.createTempDirectory("stream_shprobe").toString
    val idxDir = Files.createTempDirectory("stream_shprobe_idx").toString
    val outDir = Files.createTempDirectory("stream_shprobe_out").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // corpus: 100/101 share a signature-near text; 102 distinct
    val corpus = Seq((100L, base), (101L, base + " lambda"),
      (102L, "totally different words about other topics entirely"))
    graft.operators.DedupIndex.writeText(
      corpus.toDF("doc_id", "text"), "doc_id", "text", idxDir)

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/$name")
    val b1 = Seq((1L, base), (2L, "unrelated probe text nothing shared"))
    writeBatch("b1", b1)
    val schema = spark.read.parquet(s"$dir/b1").schema
    def start(ck: String) = CdcStream.startSimHashNearDup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory(ck).toString)
    val q = start("stream_shprobe_c1")
    try {
      q.processAllAvailable()
      // batch reference over the same docs and the same index state
      def expected(docs: Seq[(Long, String)]) = graft.operators.Dedup
        .incrementalSimHashNearDupsReportIndexed(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          graft.operators.DedupIndex.loadText(spark, idxDir))
        .pairs.select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      def got(bIds: Set[Long]) = spark.read.parquet(outDir)
        .filter($"b_id".isin(bIds.toSeq: _*))
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq.sorted
      val exp1 = expected(b1)
      assert(exp1.nonEmpty, "fixture must pair the stream probe")
      assert(got(Set(1L, 2L)) === exp1)

      // mid-stream CDC retire: doc 100 leaves; the NEXT trigger's
      // probe must no longer pair it (fresh index via _version marker)
      graft.operators.DedupIndex.retireText(
        Seq(100L).toDF("doc_id"), "doc_id", idxDir)
      val b2 = Seq((3L, base))
      writeBatch("b2", b2)
      q.processAllAvailable()
      val after = got(Set(3L))
      assert(after === expected(b2))
      assert(!after.exists(_._1 == 100L),
        s"retired corpus doc still pairs the stream probe: $after")
      assert(after.exists(_._1 == 101L), "live near-dup must still pair")

      // checkpoint-lost replay rewrites each batch's own partition
      // against the CURRENT index (doc 100 now retired) — results are
      // the live probe per batch, never old rows stacked on new ones
      val qr = start("stream_shprobe_c2")
      try qr.processAllAvailable() finally qr.stop()
      assert(got(Set(1L, 2L)) === expected(b1),
        "replayed batch 1 must re-probe the live index, unduplicated")
      assert(got(Set(3L)) === expected(b2))
      assert(!got(Set(1L, 2L, 3L)).exists(_._1 == 100L),
        "replay resurrected a retired pairing")
    } finally q.stop()
  }

  test("CDC index maintenance sink: stream inserts absorb, deletes retire, replay commits nothing") {
    val dir = Files.createTempDirectory("stream_idxmaint").toString
    val idxDir = Files.createTempDirectory("stream_idxmaint_idx").toString
    val ckpt1 = Files.createTempDirectory("stream_idxmaint_c1").toString
    def doc(i: Long) = s"maintained document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    // seed index: docs 1 and 2
    graft.operators.DedupIndex.writeText(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)

    // change stream: batch 1 inserts 3 and 4; batch 2 deletes 2, updates
    // 3 (content kept by contract), and inserts-then-deletes 5 inside
    // ONE batch (last event wins → tombstoned)
    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit = {
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    }
    writeEvents("b1", Seq(("I", 1L, 3L, doc(3)), ("I", 2L, 4L, doc(4))))
    writeEvents("b2", Seq(("D", 3L, 2L, doc(2)), ("U", 4L, 3L, doc(3)),
      ("I", 5L, 5L, doc(5)), ("D", 6L, 5L, doc(5))))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.startTextIndexMaintenance(stream, "doc_id", "text",
      idxDir, ckpt1, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // live corpus after the stream: 1, 3, 4 (2 deleted, 5 tombstoned
    // same-batch); probe near-identical copies and check verdicts
    def verdicts(): Map[Long, String] = {
      val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
      graft.operators.Dedup.incrementalExactIndexed(
          (1L to 5L).map(i => (100L + i, doc(i))).toDF("doc_id", "text"),
          "doc_id", "text", idx)
        .select(($"doc_id" - 100L).as("orig"), $"verdict")
        .as[(Long, String)].collect().toMap
    }
    val v = verdicts()
    assert(v(1L) === "dup_of_existing" && v(3L) === "dup_of_existing" &&
      v(4L) === "dup_of_existing", v)
    assert(v(2L) === "kept", s"deleted doc 2 still matches: $v")
    assert(v(5L) === "kept", s"same-batch insert+delete leaked: $v")

    // replay from a FRESH checkpoint over the same files: absorb and
    // retire are both no-ops — same verdicts, no duplicate index rows
    val ckpt2 = Files.createTempDirectory("stream_idxmaint_c2").toString
    val q2 = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt2, col("seq"))
    try q2.processAllAvailable() finally q2.stop()
    assert(verdicts() === v, "replayed maintenance changed the index")
    val counts = graft.operators.DedupIndex.loadText(spark, idxDir).counts
    assert(counts.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "replay stacked duplicate rows under one id")
  }

  test("CDC index maintenance sink: updates refresh content, delete-then-reinsert resurrects") {
    val dir = Files.createTempDirectory("stream_idxrefresh").toString
    val idxDir = Files.createTempDirectory("stream_idxrefresh_idx").toString
    val ckpt = Files.createTempDirectory("stream_idxrefresh_c").toString
    def doc(i: Long) = s"maintained document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    def docV2(i: Long) = doc(i) + " second edition entirely revised"
    // seed index: docs 1, 2, 3
    graft.operators.DedupIndex.writeText(
      (1L to 3L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)

    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: UPDATE doc 1 to v2 content, DELETE doc 2
    writeEvents("b1", Seq(("U", 1L, 1L, docV2(1)), ("D", 2L, 2L, doc(2))))
    // batch 2: doc 2 comes BACK (cross-batch resurrection). The D→I
    // order is load-bearing here, and FileStreamSource orders by
    // modification time — force b2 strictly newer so a coarse-mtime
    // filesystem cannot tie (and flip) the batches.
    writeEvents("b2", Seq(("I", 3L, 2L, doc(2))))
    val maxB1 = new java.io.File(s"$dir/b1").listFiles
      .map(_.lastModified).max
    new java.io.File(s"$dir/b2").listFiles
      .foreach(f => f.setLastModified(maxB1 + 2000))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // the maintained index answers for the POST-STREAM corpus:
    // doc 1 = v2 only (old content refreshed away), doc 2 live again,
    // doc 3 untouched
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
    val probe = Seq((101L, doc(1)), (111L, docV2(1)), (102L, doc(2)),
      (103L, doc(3))).toDF("doc_id", "text")
    val v = graft.operators.Dedup.incrementalExactIndexed(
        probe, "doc_id", "text", idx)
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(v(101L) === "kept", s"stale pre-update content still matches: $v")
    assert(v(111L) === "dup_of_existing", s"refreshed content not indexed: $v")
    assert(v(102L) === "dup_of_existing", s"reinserted doc 2 not live: $v")
    assert(v(103L) === "dup_of_existing", v.toString)
    // one live ledger row per live id
    assert(idx.counts.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "refresh stacked duplicate live rows")
  }

  test("CDC index maintenance sink: auto-compaction reclaims tombstones past the threshold") {
    val dir = Files.createTempDirectory("stream_idxautocomp").toString
    val idxDir = Files.createTempDirectory("stream_idxautocomp_idx").toString
    val ckpt = Files.createTempDirectory("stream_idxautocomp_c").toString
    def doc(i: Long) = s"compacted document number $i with its own " +
      s"distinct vocabulary token$i and filler words to shingle"
    graft.operators.DedupIndex.writeText(
      (1L to 6L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    // one batch deleting docs 2 and 4: with threshold 1, the sink
    // retires them (2 tombstones) and then compacts in the same
    // micro-batch — the tombstone set must come back empty while the
    // deletes stay deleted
    Seq(("D", 1L, 2L, doc(2)), ("D", 2L, 4L, doc(4)))
      .toDF(C.Op, "seq", "doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startTextIndexMaintenance(
      spark.readStream.schema(schema).parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"),
      autoCompactTombstones = Some(1L))
    try q.processAllAvailable() finally q.stop()

    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)
    assert(idx.tombstones.count() === 0,
      "auto-compaction must have cleared the tombstone set")
    val v = graft.operators.Dedup.incrementalExactIndexed(
        (1L to 6L).map(i => (100L + i, doc(i))).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .select(($"doc_id" - 100L).as("orig"), $"verdict")
      .as[(Long, String)].collect().toMap
    assert(v(2L) === "kept" && v(4L) === "kept",
      s"compacted deletes resurfaced: $v")
    assert(Seq(1L, 3L, 5L, 6L).forall(v(_) === "dup_of_existing"), v)
  }

  test("CDC lexical index maintenance sink: I/U/D keep BM25 exact, replay commits nothing") {
    val dir = Files.createTempDirectory("stream_lexmaint").toString
    val idxDir = Files.createTempDirectory("stream_lexmaint_idx").toString
    val ckpt1 = Files.createTempDirectory("stream_lexmaint_c1").toString
    def doc(i: Long) = s"ranked$i corpus$i shared lexical filler words " +
      s"ranked$i tail$i"
    def docV2(i: Long) = doc(i) + " revised second edition"
    graft.operators.DedupIndex.writeLexical(
      (1L to 3L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir, termNgram = 2)

    def writeEvents(name: String,
        rows: Seq[(String, Long, Long, String)]): Unit =
      rows.toDF(C.Op, "seq", "doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: INSERT doc 4, UPDATE doc 1 to v2; batch 2: DELETE doc 2,
    // insert-then-delete doc 5 inside one batch (last event wins)
    writeEvents("b1", Seq(("I", 1L, 4L, doc(4)), ("U", 2L, 1L, docV2(1))))
    writeEvents("b2", Seq(("D", 3L, 2L, doc(2)), ("I", 4L, 5L, doc(5)),
      ("D", 5L, 5L, doc(5))))
    val maxB1 = new java.io.File(s"$dir/b1").listFiles
      .map(_.lastModified).max
    new java.io.File(s"$dir/b2").listFiles
      .foreach(f => f.setLastModified(maxB1 + 2000))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt1, col("seq"))
    try q.processAllAvailable() finally q.stop()

    // the maintained index must score exactly as a recompute over the
    // post-stream corpus {1v2, 3, 4} — deleted/stale postings would
    // shift df/doclen/total_len and break bit-equality
    val live = Seq(1L -> docV2(1), 3L -> doc(3), 4L -> doc(4))
    val queries = Seq(501L -> docV2(1), 502L -> doc(2), 503L -> doc(4))
      .toDF("doc_id", "text")
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    def probe() = graft.operators.Retrieval
      .bm25TopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries, "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val expected = graft.operators.Retrieval
      .bm25TopK(live.toDF("doc_id", "text"), queries,
        "doc_id", "text", "doc_id", "text", termNgram = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val got = probe()
    assert(got.nonEmpty && got === expected,
      "maintained lexical index diverged from live-corpus recompute")
    assert(!got.exists(_._3 == 2L), "deleted doc 2 still ranks")
    assert(!got.exists(_._3 == 5L), "same-batch insert+delete leaked")

    // checkpoint-lost replay: absorb skips matching content, retire
    // finds no live generation — results unchanged, nothing committed
    val ckpt2 = Files.createTempDirectory("stream_lexmaint_c2").toString
    val q2 = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt2, col("seq"))
    try q2.processAllAvailable() finally q2.stop()
    assert(probe() === expected, "replayed maintenance changed rankings")
    val doclens = graft.operators.DedupIndex.loadLexical(spark, idxDir)
      .doclens
    assert(doclens.groupBy($"id").count().filter($"count" > 1).isEmpty,
      "replay stacked duplicate live doclen rows")
  }

  test("CDC lexical maintenance sink: auto-compaction reclaims tombstones, rankings stay exact") {
    val dir = Files.createTempDirectory("stream_lexautocomp").toString
    val idxDir = Files.createTempDirectory("stream_lexautocomp_idx").toString
    val ckpt = Files.createTempDirectory("stream_lexautocomp_c").toString
    def doc(i: Long) = s"compact$i lexical$i shared ranking filler " +
      s"words compact$i"
    graft.operators.DedupIndex.writeLexical(
      (1L to 6L).map(i => (i, doc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idxDir, termNgram = 2)
    // one batch deleting docs 2 and 4: threshold 1 retires (2
    // tombstones) then compacts inside the same micro-batch
    Seq(("D", 1L, 2L, doc(2)), ("D", 2L, 4L, doc(4)))
      .toDF(C.Op, "seq", "doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = CdcStream.startLexicalIndexMaintenance(
      spark.readStream.schema(schema).parquet(s"$dir/b*/"),
      "doc_id", "text", idxDir, ckpt, col("seq"),
      autoCompactTombstones = Some(1L))
    try q.processAllAvailable() finally q.stop()

    // tombstones physically reclaimed (no data files left behind)
    val tombFiles = Option(new java.io.File(s"$idxDir/tombstones")
        .listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(tombFiles.isEmpty,
      s"auto-compaction left tombstone files: ${tombFiles.mkString(", ")}")
    // and the compacted index still scores exactly as the live corpus
    val live = Seq(1L, 3L, 5L, 6L).map(i => i -> doc(i))
    val queries = Seq(501L -> doc(1), 502L -> doc(2)).toDF("doc_id", "text")
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    val got = graft.operators.Retrieval
      .bm25TopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries, "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val expected = graft.operators.Retrieval
      .bm25TopK(live.toDF("doc_id", "text"), queries,
        "doc_id", "text", "doc_id", "text", termNgram = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    assert(got.nonEmpty && got === expected)
    assert(!got.exists(r => r._3 == 2L || r._3 == 4L),
      "compacted deletes resurfaced in rankings")
  }

}
