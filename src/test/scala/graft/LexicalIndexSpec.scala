package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generational BM25 lexical index ([[graft.operators.DedupIndex]]
  * fmt 2): every CDC verb — absorb, refresh (content-aware), retire,
  * resurrect, compact — must leave the index scoring BIT-IDENTICALLY to
  * a from-scratch recompute over the live corpus, because BM25's global
  * statistics (df, doc lengths, corpus totals) are maintained as signed
  * deltas inside the same staged commit as the postings. Also pins the
  * replay-commits-nothing idempotency (by file listing, not just
  * results) and the crash-rollback protocol on the lexical component
  * set.
  */
class LexicalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long): String =
    s"alpha$i beta$i gamma$i shared corpus filler words beta$i tail$i"
  private def docV2(i: Long): String =
    doc(i) + " revised second edition"

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private val queries = Seq(
    501L -> doc(1), 502L -> doc(3), 503L -> "shared corpus filler words")

  private val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")

  /** Probe of the maintained index vs the from-scratch recompute over
    * `live` — the bit-exactness contract every CDC verb must preserve.
    */
  private def assertLiveExact(idxDir: String,
      live: Seq[(Long, String)]): Unit = {
    val idx = graft.operators.DedupIndex.loadLexical(spark, idxDir)
    val probe = graft.operators.Retrieval
      .bm25TopKIndexed(idx, df(queries), "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    val recompute = graft.operators.Retrieval
      .bm25TopK(df(live), df(queries), "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq.sorted
    assert(probe.nonEmpty, "vacuous: probe returned nothing")
    assert(probe === recompute,
      s"maintained index diverged from live recompute over $live")
    // the fmt-3 positional component rides the same staged commits:
    // the phrase probe over the maintained positions must equal the
    // recompute over live text through every verb this helper gates
    val pcols = Seq("q_id", "rank", "doc_id", "phrase_freq")
    val phraseProbe = graft.operators.Retrieval
      .phraseTopKIndexed(idx, df(queries), "doc_id", "text")
      .select(pcols.head, pcols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val phraseRecompute = graft.operators.Retrieval
      .phraseTopK(df(live), df(queries), "doc_id", "text",
        "doc_id", "text")
      .select(pcols.head, pcols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    assert(phraseProbe.nonEmpty, "vacuous: phrase probe returned nothing")
    assert(phraseProbe === phraseRecompute,
      s"maintained positions diverged from live recompute over $live")
    // the collected corpus stats must equal the live corpus exactly —
    // they feed every idf/length normalization
    assert(idx.nDocs === live.size.toLong)
    val liveLen = live.map { case (_, t) =>
      math.max(t.split("\\s+").count(_.nonEmpty) - 1, 0).toLong }.sum
    assert(idx.totalLen === liveLen)
  }

  private def allFiles(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Set.empty
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(_.toString).toSet
      } finally s.close()
    }
  }

  test("lexical CDC lifecycle: absorb, refresh, retire, resurrect all score as the live corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lex-cdc").toString
    val seed = (1L to 6L).map(i => i -> doc(i))
    graft.operators.DedupIndex.writeLexical(
      df(seed), "doc_id", "text", dir, termNgram = 2)
    assertLiveExact(dir, seed)

    // INSERT: docs 7 and 8 absorb
    graft.operators.DedupIndex.appendLexical(
      df(Seq(7L -> doc(7), 8L -> doc(8))), "doc_id", "text", dir)
    val afterInsert = seed ++ Seq(7L -> doc(7), 8L -> doc(8))
    assertLiveExact(dir, afterInsert)

    // UPDATE: doc 3 refreshes to v2, doc 4 replays unchanged (no-op)
    graft.operators.DedupIndex.appendLexical(
      df(Seq(3L -> docV2(3), 4L -> doc(4))), "doc_id", "text", dir)
    val afterUpdate = afterInsert.map {
      case (3L, _) => 3L -> docV2(3); case kv => kv }
    assertLiveExact(dir, afterUpdate)

    // DELETE: docs 2 and 5 retire — their postings stop ranking and
    // their df/length contributions reverse in the same commit
    graft.operators.DedupIndex.retireLexical(
      Seq(2L, 5L).toDF("doc_id"), "doc_id", dir)
    val afterDelete = afterUpdate.filterNot(kv => kv._1 == 2L || kv._1 == 5L)
    assertLiveExact(dir, afterDelete)

    // RESURRECT: doc 2 re-inserts with its original content at a fresh
    // generation — no compaction needed
    graft.operators.DedupIndex.appendLexical(
      df(Seq(2L -> doc(2))), "doc_id", "text", dir)
    val afterResurrect = afterDelete :+ (2L -> doc(2))
    assertLiveExact(dir, afterResurrect)

    // COMPACT: pure space reclaim — results unchanged, tombstones
    // cleared, the signed delta rows collapsed to live aggregates
    graft.operators.DedupIndex.compactLexical(spark, dir)
    assertLiveExact(dir, afterResurrect)
    val termdf = spark.read.parquet(s"$dir/termdf")
    assert(termdf.filter(col("df") <= 0).isEmpty,
      "compaction left non-positive df delta rows")
    val liveToks = afterResurrect.flatMap { case (_, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(2).filter(_.size == 2).map(_.mkString(" ")) }.distinct
    assert(termdf.count() === liveToks.size.toLong,
      "compacted termdf must hold exactly one row per live token")
    assert(spark.read.parquet(s"$dir/stats").count() === 1L,
      "compacted stats must collapse to one row")
  }

  test("lexical replay idempotency: replayed absorbs and retires commit no files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lex-replay").toString
    graft.operators.DedupIndex.writeLexical(
      df((1L to 4L).map(i => i -> doc(i))), "doc_id", "text", dir,
      termNgram = 2)
    graft.operators.DedupIndex.appendLexical(
      df(Seq(5L -> doc(5), 3L -> docV2(3))), "doc_id", "text", dir)
    graft.operators.DedupIndex.retireLexical(
      Seq(2L).toDF("doc_id"), "doc_id", dir)
    val before = allFiles(dir)
    // full replays: same absorb batch (all content already live), same
    // delete batch (no live generation left) — nothing may commit
    graft.operators.DedupIndex.appendLexical(
      df(Seq(5L -> doc(5), 3L -> docV2(3))), "doc_id", "text", dir)
    graft.operators.DedupIndex.retireLexical(
      Seq(2L).toDF("doc_id"), "doc_id", dir)
    assert(allFiles(dir) === before,
      "replayed maintenance wrote files into the index")
    assertLiveExact(dir,
      Seq(1L -> doc(1), 3L -> docV2(3), 4L -> doc(4), 5L -> doc(5)))
  }

  test("lexical absorb crash mid-commit rolls back to the pre-absorb index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lex-crash").toString
    val seed = (1L to 4L).map(i => i -> doc(i))
    graft.operators.DedupIndex.writeLexical(
      df(seed), "doc_id", "text", dir, termNgram = 2)
    val before = allFiles(dir)
    graft.operators.DedupIndex.testCrashAfterComponentMoves = 2
    try {
      intercept[RuntimeException] {
        graft.operators.DedupIndex.appendLexical(
          df(Seq(5L -> doc(5), 1L -> docV2(1))), "doc_id", "text", dir)
      }
    } finally graft.operators.DedupIndex.testCrashAfterComponentMoves = -1
    // next load recovers: the half-published commit rolls back and the
    // index answers exactly as before the crashed absorb
    assertLiveExact(dir, seed)
    assert(allFiles(dir).filterNot(_.contains("_staging")) ===
      before.filterNot(_.contains("_staging")),
      "rollback left half-committed files behind")
    // the retried absorb then lands cleanly
    graft.operators.DedupIndex.appendLexical(
      df(Seq(5L -> doc(5), 1L -> docV2(1))), "doc_id", "text", dir)
    assertLiveExact(dir,
      Seq(1L -> docV2(1), 2L -> doc(2), 3L -> doc(3), 4L -> doc(4),
        5L -> doc(5)))
  }
}
