package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC verb lifecycle against the persisted index: retire/update/
  * resurrect across every probe modality, and the delta-maintained
  * band sizes staying equal to live-set recounts through every verb.
  */
class DedupIndexLifecycleSpec extends DedupIndexSpecBase {
  import spark.implicits._

  test("CDC retire: tombstoned docs vanish from every probe modality; replay is a no-op; compaction reclaims") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-retire").toString
    val all = (0L until 120L)
    val corpusIds = all.filter(_ % 2 == 0)
    val retiredIds = corpusIds.filter(_ % 10 == 0)
    val liveIds = corpusIds.filterNot(_ % 10 == 0)
    val corpus = mkDocs(corpusIds).toDF("doc_id", "text")
    val batch = mkDocs(all.filter(_ % 2 == 1)).toDF("doc_id", "text")

    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    DedupIndex.retireText(retiredIds.toDF("doc_id"), "doc_id", indexDir)

    // the ground truth: probes against the index after retirement must
    // equal recompute probes against the LIVE corpus alone — exact-hash,
    // band/LSH candidate, and Jaccard-verify modalities all covered
    val liveCorpus = mkDocs(liveIds).toDF("doc_id", "text")
    def exactProbe() = Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir))
    def lshProbe() = Dedup.incrementalMinHashNearDupsReportIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir)).pairs
    def simProbe() = Dedup.incrementalSimHashNearDupsReportIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir)).pairs
    val exactLive = Dedup.incrementalExact(batch, liveCorpus,
      "doc_id", "text")
    val lshLive = Dedup.incrementalMinHashNearDupsReport(
      batch, liveCorpus, "doc_id", "text").pairs
    val simLive = Dedup.incrementalSimHashNearDupsReport(
      batch, liveCorpus, "doc_id", "text").pairs
    assert(sortedRows(exactProbe()) === sortedRows(exactLive))
    assert(sortedRows(lshProbe()) === sortedRows(lshLive))
    assert(sortedRows(simProbe()) === sortedRows(simLive))
    assert(lshProbe().count() > 0, "fixture must still produce pairs")
    assert(simProbe().count() > 0, "simhash fixture must produce pairs")
    // ...and differ from the pre-retirement corpus (the gate is real:
    // some retired doc was the only holder of its hash/pairs)
    val exactStale = Dedup.incrementalExact(batch, corpus, "doc_id", "text")
    assert(sortedRows(exactProbe()) !== sortedRows(exactStale),
      "retirement changed nothing — fixture is vacuous")
    // hash liveness is per-copy: group g=0 has exact dups 0 (retired)
    // and 4·k... ids 0,10,... retired; a hash with a SURVIVING copy must
    // still match (mkDocs groups of 4 share templates across ids)
    assert(exactProbe().filter(col("verdict") === "dup_of_existing")
      .count() > 0, "hashes with surviving copies must keep matching")

    // replay of the same delete batch: nothing changes, no new files
    def tombFiles() = {
      val d = new java.io.File(s"$indexDir/tombstones")
      if (d.exists) d.listFiles.map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      else Set.empty[String]
    }
    val before = tombFiles()
    DedupIndex.retireText(retiredIds.toDF("doc_id"), "doc_id", indexDir)
    assert(tombFiles() === before, "replayed delete batch wrote files")
    assert(sortedRows(exactProbe()) === sortedRows(exactLive))

    // compaction physically reclaims: tombstones empty again, retired
    // rows gone from the stored components, probes bit-identical
    def dataFiles(c: String) = {
      val d = new java.io.File(s"$indexDir/$c")
      d.listFiles.map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    }
    val bandsBefore = dataFiles("bands")
    DedupIndex.compactText(spark, indexDir)
    assert(tombFiles().isEmpty, "compaction must clear the tombstones")
    assert(dataFiles("bands") !== bandsBefore,
      "compaction must rewrite the band component")
    val compacted = DedupIndex.loadText(spark, indexDir)
    assert(compacted.counts.filter(
      col("id").isin(retiredIds: _*)).count() === 0,
      "retired ids survived compaction in the stored rows")
    assert(sortedRows(exactProbe()) === sortedRows(exactLive))
    assert(sortedRows(lshProbe()) === sortedRows(lshLive))
    assert(sortedRows(simProbe()) === sortedRows(simLive))
    // no stray staging/trash left behind
    assert(!new java.io.File(s"$indexDir/_staging").exists)
    assert(!new java.io.File(s"$indexDir/_trash").exists)
  }

  test("CDC update: re-absorbing changed content refreshes in place; unchanged content is a no-op; retire-then-absorb resurrects") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-refresh").toString
    val all = (0L until 120L)
    val corpusIds = all.filter(_ % 2 == 0)
    val updatedIds = corpusIds.filter(_ % 10 == 0)
    val docOf = mkDocs(corpusIds).toMap
    def v2(t: String) = t + " v2 refreshed"
    val corpus = corpusIds.map(i => (i, docOf(i))).toDF("doc_id", "text")
    // the refreshed corpus the probes must agree with after the update
    val refreshed = corpusIds
      .map(i => (i, if (i % 10 == 0) v2(docOf(i)) else docOf(i)))
      .toDF("doc_id", "text")
    val batch = mkDocs(all.filter(_ % 2 == 1)).toDF("doc_id", "text")
    def exactProbe() = Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir))
    def lshProbe() = Dedup.incrementalMinHashNearDupsReportIndexed(
      batch, "doc_id", "text", DedupIndex.loadText(spark, indexDir)).pairs

    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    // the UPDATE batch: changed content for the % 10 slice, unchanged
    // content for the % 6 slice (the no-op rows), absorbed together
    val updateBatch = corpusIds.filter(i => i % 10 == 0 || i % 6 == 0)
      .map(i => (i, if (i % 10 == 0) v2(docOf(i)) else docOf(i)))
      .toDF("doc_id", "text")
    DedupIndex.appendText(updateBatch, "doc_id", "text", indexDir)

    // every probe modality now answers for the REFRESHED corpus: old
    // content stopped matching, new content matches
    val exactWant = sortedRows(
      Dedup.incrementalExact(batch, refreshed, "doc_id", "text"))
    val lshWant = sortedRows(Dedup.incrementalMinHashNearDupsReport(
      batch, refreshed, "doc_id", "text").pairs)
    assert(sortedRows(exactProbe()) === exactWant)
    assert(sortedRows(lshProbe()) === lshWant)
    // the gate is real: the stale corpus answers differently
    assert(exactWant !== sortedRows(
      Dedup.incrementalExact(batch, corpus, "doc_id", "text")),
      "refresh changed nothing — fixture is vacuous")
    // displaced generations are tombstoned, exactly one per updated id
    val idx = DedupIndex.loadText(spark, indexDir)
    assert(idx.tombstones.count() === updatedIds.size)
    // counts stays one LIVE row per id (no duplicate ledger rows)
    assert(idx.counts.groupBy(col("id")).count()
      .filter(col("count") > 1).count() === 0)

    // replaying the whole update batch is a no-op: no new files anywhere
    def files(c: String) = {
      val d = new java.io.File(s"$indexDir/$c")
      if (d.exists) d.listFiles.map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
      else Set.empty[String]
    }
    val before = Seq("bands", "counts", "dochashes", "tombstones")
      .map(c => c -> files(c)).toMap
    DedupIndex.appendText(updateBatch, "doc_id", "text", indexDir)
    Seq("bands", "counts", "dochashes", "tombstones").foreach { c =>
      assert(files(c) === before(c), s"replayed update wrote $c files")
    }
    assert(sortedRows(exactProbe()) === exactWant)

    // compaction drops the displaced rows and keeps the refreshed view
    DedupIndex.compactText(spark, indexDir)
    assert(DedupIndex.loadText(spark, indexDir).tombstones.count() === 0)
    assert(sortedRows(exactProbe()) === exactWant)
    assert(sortedRows(lshProbe()) === lshWant)

    // retire a slice, then re-absorb it with its ORIGINAL content: the
    // generational tombstones make this a resurrection, no compaction
    // in between
    val cycled = corpusIds.filter(_ % 12 == 0)
    DedupIndex.retireText(cycled.toDF("doc_id"), "doc_id", indexDir)
    DedupIndex.appendText(
      cycled.map(i => (i, if (i % 10 == 0) v2(docOf(i)) else docOf(i)))
        .toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    assert(sortedRows(exactProbe()) === exactWant)
    assert(sortedRows(lshProbe()) === lshWant)
  }

  test("delta-maintained LSH and SimHash bucket sizes equal live band counts through every verb") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-sizes").toString
    val even = mkDocs((0L until 60L).filter(_ % 2 == 0))
    DedupIndex.writeText(even.toDF("doc_id", "text"), "doc_id", "text",
      indexDir)

    def check(when: String): Unit = {
      val idx = DedupIndex.loadText(spark, indexDir)
      for ((label, deltas, rows) <- Seq(
          ("lsh", idx.bucketSizes, idx.bandKeys),
          ("simhash", idx.simBucketSizes, idx.simBandKeys))) {
        val fromDeltas = sortedRows(deltas)
        val fromRows = sortedRows(rows.groupBy(col("bkey"))
          .agg(count(lit(1)).as("n")))
        assert(fromDeltas === fromRows,
          s"$when/$label: delta-served sizes diverged from live band counts")
        assert(fromDeltas.nonEmpty, s"$when/$label: vacuous (no buckets)")
      }
    }
    check("fresh build")
    // absorb new ids + replay part of the original corpus (no-op rows
    // must contribute no deltas)
    DedupIndex.appendText(
      (mkDocs(Seq(200L, 201L, 202L)) ++ even.take(5))
        .toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    check("after absorb")
    // refresh: id 0 changes text — its displaced generation's
    // contributions must reverse while the re-derived ones land
    DedupIndex.appendText(
      Seq((0L, "completely replaced text for the zeroth document " +
        "with a wholly different shape and vocabulary"))
        .toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    check("after refresh")
    DedupIndex.retireText((0L until 20L by 2).toDF("doc_id"), "doc_id",
      indexDir)
    check("after retire")
    // replayed retire commits nothing — sizes must not double-reverse
    DedupIndex.retireText((0L until 20L by 2).toDF("doc_id"), "doc_id",
      indexDir)
    check("after replayed retire")
    DedupIndex.appendText(even.filter(_._1 == 2L).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    check("after resurrect")
    DedupIndex.compactText(spark, indexDir)
    check("after compact")
    // and the probes actually serve the cap from the deltas: each
    // probe's input includes its sizes component ("/sizes/" — distinct
    // from "/simsizes/"), so the O(stored-bands) recount is gone
    val batch = mkDocs(Seq(301L, 303L)).toDF("doc_id", "text")
    val idx = DedupIndex.loadText(spark, indexDir)
    val lshProbe = Dedup.incrementalMinHashNearDupsReportIndexed(
      batch, "doc_id", "text", idx).pairs
    val simProbe = Dedup.incrementalSimHashNearDupsReportIndexed(
      batch, "doc_id", "text", idx).pairs
    // probe CONSTRUCTION persists the candidate pair set (the r17
    // verify-scan In-prune collects its ids from it), and the
    // CacheManager then substitutes an InMemoryRelation into these
    // probes' post-substitution plans — hiding the candidate stage's
    // file scans from Dataset.inputFiles. Clear the registry so the
    // assertions below inspect the substitution-free plan shape (what
    // a fresh execution reads); the serving-time cache reuse is the
    // separately-gated CachedPlans contract, not what this test pins.
    CachedPlans.clear()
    assert(lshProbe.inputFiles.exists(_.contains("/sizes/")),
      "LSH probe does not read the delta-maintained sizes — vacuous switch")
    assert(simProbe.inputFiles.exists(_.contains("/simsizes/")),
      "SimHash probe does not read the delta-maintained sizes — vacuous switch")
    // and the candidate stage's stored-side scan is PRUNED to the
    // batch's touched bucket keys: the band-component scan must carry a
    // bucket-pruning set (SelectedBucketsCount), so the probe's stored
    // side reads touched bucket files only — batch-tracked, not
    // corpus-tracked
    for ((label, probe) <- Seq(("lsh", lshProbe), ("simhash", simProbe))) {
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"$label probe's stored band scan is not bucket-pruned:\n$plan")
    }
  }

}
