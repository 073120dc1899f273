package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staged-commit machinery of the persisted index: cross-session
  * visibility, crash/replay idempotence, lease exclusion, params
  * tamper detection, fresh-catalog re-attach, and the exact
  * tombstone-count footer read behind auto-compaction.
  */
class DedupIndexCommitSpec extends DedupIndexSpecBase {
  import spark.implicits._

  test("a commit in one session is visible to another session's already-warm probes") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-xsession").toString
    val corpus = mkDocs((0L until 40L).filter(_ % 2 == 0))
      .toDF("doc_id", "text")
    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    DedupIndex.writeLexical(corpus, "doc_id", "text", indexDir + "-lex",
      termNgram = 2)

    // a SECOND session (own SessionCatalog, own filesource relation
    // cache — the shape of a streaming micro-batch clone or concurrent
    // notebook): warm its caches with one probe of each index
    val s2 = spark.newSession()
    val batch = mkDocs(Seq(101L, 103L))
      .toDF("doc_id", "text") // session-agnostic plan over literals
    def exactProbe() = Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(s2, indexDir))
    def bm25Probe() = graft.operators.Retrieval.bm25TopKIndexed(
      DedupIndex.loadLexical(s2, indexDir + "-lex"),
      batch, "doc_id", "text")
    exactProbe().collect(); bm25Probe().collect()

    // commit from the FIRST session: absorb a doc whose text duplicates
    // batch id 101 (group 25, member 0|1 share a template)
    val absorbed = mkDocs(Seq(100L)).toDF("doc_id", "text")
    DedupIndex.appendText(absorbed, "doc_id", "text", indexDir)
    DedupIndex.appendLexical(absorbed, "doc_id", "text", indexDir + "-lex")

    // the second session's NEXT probes must see the commit — a stale
    // per-session relation cache would keep serving the pre-commit
    // file listing forever (the bug the _version marker fixes)
    val verdicts = exactProbe()
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(verdicts(101L) === "dup_of_existing",
      "session 2 probe did not see the absorbed duplicate")
    // the lexical side must match a recompute over the post-commit
    // corpus — stats (path-read, always fresh) and postings
    // (catalog-table) would otherwise come from DIFFERENT corpus
    // versions and mis-score silently
    val re = graft.operators.Retrieval.bm25TopK(
      corpus.unionByName(absorbed), batch,
      "doc_id", "text", "doc_id", "text", termNgram = 2)
    assert(sortedRows(bm25Probe()) === sortedRows(re),
      "session 2 BM25 probe diverged from post-commit recompute")
  }

  test("a crash mid-compaction rolls back to the pre-compaction index") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-compcrash").toString
    val corpusIds = (0L until 120L).filter(_ % 2 == 0)
    val retiredIds = corpusIds.filter(_ % 10 == 0)
    val corpus = mkDocs(corpusIds).toDF("doc_id", "text")
    val batch = mkDocs((0L until 120L).filter(_ % 2 == 1))
      .toDF("doc_id", "text")
    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    DedupIndex.retireText(retiredIds.toDF("doc_id"), "doc_id", indexDir)
    def exactProbe() = Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir))
    val want = sortedRows(exactProbe())

    // crash after 2 components replaced: some live files are in trash,
    // some compacted files are live — the torn state the replace
    // protocol exists for
    DedupIndex.testCrashAfterComponentMoves = 2
    try intercept[RuntimeException] {
      DedupIndex.compactText(spark, indexDir)
    } finally DedupIndex.testCrashAfterComponentMoves = -1

    // next load recovers: compacted files rolled back, displaced files
    // restored, tombstones intact — probe verdicts unchanged
    val recovered = DedupIndex.loadText(spark, indexDir)
    assert(recovered.tombstones.count() === retiredIds.size,
      "rollback must keep the tombstone set")
    assert(sortedRows(exactProbe()) === want)
    // and a RETRIED compaction completes cleanly
    DedupIndex.compactText(spark, indexDir)
    assert(DedupIndex.loadText(spark, indexDir).tombstones.count() === 0)
    assert(sortedRows(exactProbe()) === want)
  }

  test("a crashed-and-retried absorb cannot duplicate index rows or change probe verdicts") {
    CachedPlans.clear()
    // three cohorts: the indexed corpus, a batch absorbed into it, and a
    // batch that probes the grown index
    val ids = 0L until 120L
    val corpus = mkDocs(ids.filter(_ % 3 == 0)).toDF("doc_id", "text")
    val absorbBatch = mkDocs(ids.filter(_ % 3 == 1)).toDF("doc_id", "text")
    val probeBatch = mkDocs(ids.filter(_ % 3 == 2)).toDF("doc_id", "text")

    // reference: a clean single absorb, cross-checked against the
    // recompute form over the grown corpus
    val cleanDir = java.nio.file.Files
      .createTempDirectory("graft-idx-absorb-clean").toString
    DedupIndex.writeText(corpus, "doc_id", "text", cleanDir)
    val corpusOnly = sortedRows(Dedup.incrementalMinHashNearDupsReport(
      probeBatch, corpus, "doc_id", "text").pairs)
    DedupIndex.appendText(absorbBatch, "doc_id", "text", cleanDir)
    val cleanIdx = DedupIndex.loadText(spark, cleanDir)
    val expected = sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
      probeBatch, "doc_id", "text", cleanIdx).pairs)
    val recompute = sortedRows(Dedup.incrementalMinHashNearDupsReport(
      probeBatch, corpus.union(absorbBatch), "doc_id", "text").pairs)
    assert(expected === recompute)
    assert(expected !== corpusOnly,
      "fixture must make the absorbed batch change probe verdicts")

    // crash mid-commit: the manifest is published and the first
    // component ("bands" in sorted order) has moved live, "counts" has
    // not — exactly the state where the freshness anti-join would
    // re-absorb the batch and duplicate band rows
    val crashDir = java.nio.file.Files
      .createTempDirectory("graft-idx-absorb-crash").toString
    DedupIndex.writeText(corpus, "doc_id", "text", crashDir)
    DedupIndex.testCrashAfterComponentMoves = 1
    try {
      val e = intercept[RuntimeException] {
        DedupIndex.appendText(absorbBatch, "doc_id", "text", crashDir)
      }
      assert(e.getMessage.contains("injected crash"))
    } finally DedupIndex.testCrashAfterComponentMoves = -1

    // recovery on LOAD alone: the torn batch is rolled back, so a probe
    // sees the pre-absorb corpus, not duplicated band rows
    val rolledBack = DedupIndex.loadText(spark, crashDir)
    assert(sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
      probeBatch, "doc_id", "text", rolledBack).pairs) === corpusOnly)

    // the retried absorb then lands exactly once
    DedupIndex.appendText(absorbBatch, "doc_id", "text", crashDir)
    val retried = DedupIndex.loadText(spark, crashDir)
    assert(retried.bandKeys.groupBy(col("id"), col("band"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count() === 0,
      "duplicate band rows after crash-retry")
    assert(sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
      probeBatch, "doc_id", "text", retried).pairs) === expected)

    // sweep the other crash points: before ANY component moved
    // (manifest published, nothing live) and after all but the last
    // moved — retry must land identically from every crash state
    Seq(0, 4).foreach { fp =>
      val dirN = java.nio.file.Files
        .createTempDirectory(s"graft-idx-absorb-crash$fp").toString
      DedupIndex.writeText(corpus, "doc_id", "text", dirN)
      DedupIndex.testCrashAfterComponentMoves = fp
      try intercept[RuntimeException] {
        DedupIndex.appendText(absorbBatch, "doc_id", "text", dirN)
      } finally DedupIndex.testCrashAfterComponentMoves = -1
      DedupIndex.appendText(absorbBatch, "doc_id", "text", dirN)
      val got = sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
        probeBatch, "doc_id", "text",
        DedupIndex.loadText(spark, dirN)).pairs)
      assert(got === expected, s"crash point $fp")
    }
  }

  test("a second absorb against a held lease fails fast; a stale lease is reclaimed") {
    CachedPlans.clear()
    val ids = 0L until 80L
    val corpus = mkDocs(ids.filter(_ % 2 == 0)).toDF("doc_id", "text")
    val batch = mkDocs(ids.filter(_ % 2 == 1)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-lease").toString
    DedupIndex.writeText(corpus, "doc_id", "text", dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leaseFile = new org.apache.hadoop.fs.Path(dir, "_absorb.lease")

    // simulate another writer's LIVE lease: fresh mtime, foreign owner
    val out = fs.create(leaseFile, false)
    out.write("other-writer".getBytes("UTF-8")); out.close()
    val before = DedupIndex.loadText(spark, dir).counts.count()
    val e = intercept[IllegalStateException] {
      DedupIndex.appendText(batch, "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("lease") &&
      e.getMessage.contains("other-writer"))
    assert(DedupIndex.loadText(spark, dir).counts.count() === before,
      "failed-fast absorb must not touch the index")
    assert(fs.exists(leaseFile),
      "the foreign holder's lease must survive the failed attempt")

    // a load during a live foreign lease must NOT roll back the
    // holder's in-flight staging
    val staged = new org.apache.hadoop.fs.Path(dir, "_staging/inflight")
    fs.mkdirs(staged)
    val mfOut = fs.create(
      new org.apache.hadoop.fs.Path(staged, "MANIFEST.json"), false)
    mfOut.write("{}".getBytes("UTF-8")); mfOut.close()
    DedupIndex.loadText(spark, dir)
    assert(fs.exists(staged),
      "load must leave a live writer's staging alone")

    // the holder crashes (no heartbeat): once stale, the lease is
    // reclaimed, the abandoned staging rolled back, and the absorb lands
    val savedTtl = DedupIndex.leaseStaleMs
    DedupIndex.leaseStaleMs = 0L
    try {
      DedupIndex.appendText(batch, "doc_id", "text", dir)
    } finally DedupIndex.leaseStaleMs = savedTtl
    assert(!fs.exists(leaseFile), "lease must be released after absorb")
    assert(!fs.exists(staged), "stale staging must be rolled back")
    val grown = DedupIndex.loadText(spark, dir)
    assert(grown.counts.count() === before + batch.count())
    // grown-index probe verdicts match the recompute over the union
    val probe = mkDocs(Seq(1000L, 1001L)).toDF("doc_id", "text")
    assert(sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
      probe, "doc_id", "text", grown).pairs) ===
      sortedRows(Dedup.incrementalMinHashNearDupsReport(
        probe, corpus.union(batch), "doc_id", "text").pairs))
  }

  test("a corrupt or tampered _params.json fails loudly as index corruption") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-corrupt").toString
    DedupIndex.writeText(
      mkDocs((0L until 16L)).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    DedupIndex.loadText(spark, indexDir) // sanity: valid index loads
    val params = java.nio.file.Paths.get(indexDir, "_params.json")
    val original = new String(java.nio.file.Files.readAllBytes(params),
      java.nio.charset.StandardCharsets.UTF_8)
    // writing through java.nio leaves hadoop's LocalFileSystem .crc
    // sidecar stale; drop it so the read exercises OUR validation, not
    // hadoop's transport checksum
    def write(text: String): Unit = {
      java.nio.file.Files.write(params, text.getBytes)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(indexDir, "._params.json.crc"))
    }

    // half-written / truncated file
    write(original.take(original.length / 2))
    val e1 = intercept[IllegalStateException] {
      DedupIndex.loadText(spark, indexDir)
    }
    assert(e1.getMessage.contains(s"dedup index at $indexDir is corrupt"))

    // valid JSON whose fields were tampered with (checksum mismatch)
    write(original.replace("\"numHashes\":12", "\"numHashes\":13"))
    val e2 = intercept[IllegalStateException] {
      DedupIndex.loadText(spark, indexDir)
    }
    assert(e2.getMessage.contains("checksum mismatch"))

    // restored file loads again
    write(original)
    DedupIndex.loadText(spark, indexDir)
  }

  test("a fresh catalog re-attaches to a RETIRED index: tombstones survive the session boundary") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-retirereload").toString
    val corpusIds = (0L until 80L).filter(_ % 2 == 0)
    val retired = corpusIds.filter(_ % 10 == 0)
    DedupIndex.writeText(mkDocs(corpusIds).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    DedupIndex.retireText(retired.toDF("doc_id"), "doc_id", indexDir)
    val batch = mkDocs((0L until 80L).filter(_ % 2 == 1))
      .toDF("doc_id", "text")
    def probe() = sortedRows(Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir)))
    val want = probe()
    // simulate a NEW session: drop every index table (incl. dochashes),
    // then load again — the DDL re-attach must infer the fmt-2 schema
    // and the tombstone read must keep filtering
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val idx = DedupIndex.loadText(spark, indexDir)
    assert(idx.tombstones.count() === retired.size)
    assert(probe() === want, "re-attached index lost its retirement")
  }

  test("a fresh catalog re-attaches to an existing index via DDL") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-reload").toString
    val corpus = mkDocs((0L until 40L).filter(_ % 2 == 0))
      .toDF("doc_id", "text")
    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    val before = DedupIndex.loadText(spark, indexDir).hashes.count()
    // simulate a NEW session: the catalog has never heard of the tables
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val idx = DedupIndex.loadText(spark, indexDir)
    assert(idx.hashes.count() === before)
    // and the re-registered table still carries the bucket spec
    val agg = idx.bandKeys.groupBy(col("bkey"))
      .agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "re-registered table lost its bucket metadata")
  }

  test("auto-compaction threshold counts tombstones exactly (footer count == row count)") {
    CachedPlans.clear()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-tombcount").toString
    val corpus = mkDocs((0L until 40L).filter(_ % 2 == 0))
      .toDF("doc_id", "text")
    DedupIndex.writeText(corpus, "doc_id", "text", dir)
    // retire 3 live docs → exactly 3 (id, gen) tombstone rows. The
    // IfNeeded check now counts them from parquet FOOTERS (no Spark
    // job); the boundary pins the count value exactly: fires only
    // strictly ABOVE the threshold.
    DedupIndex.retireText(
      Seq(0L, 2L, 4L).toDF("doc_id"), "doc_id", dir)
    assert(!DedupIndex.compactTextIfNeeded(spark, dir, maxTombstones = 3),
      "threshold == count must not fire")
    assert(DedupIndex.compactTextIfNeeded(spark, dir, maxTombstones = 2),
      "count above threshold must fire")
    // compaction cleared the set: even threshold 0 stays quiet
    assert(!DedupIndex.compactTextIfNeeded(spark, dir, maxTombstones = 0))
  }

}
