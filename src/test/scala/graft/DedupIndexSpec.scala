package graft

import graft.operators.{Dedup, DedupIndex, Similarity}
import graft.plans.CachedPlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted dedup/ANN corpus index: probes against a loaded index
  * must (a) reproduce the recompute forms bit-exactly, (b) never scan
  * the corpus text/vector source, and (c) keep the corpus side
  * shuffle-free thanks to the bucketed layout.
  */
class DedupIndexSpec extends DedupIndexSpecBase {
  import spark.implicits._

  test("indexed text probes match recompute bit-exactly, reading only the index") {
    CachedPlans.clear()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-idx-corpus").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-text").toString
    // corpus is FILE-backed so a leaked text scan would show up in the
    // probe's inputFiles; the batch stays in-memory (contributes none)
    mkDocs((0L until 120L).filter(_ % 2 == 0)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val batch = mkDocs((0L until 120L).filter(_ % 2 == 1))
      .toDF("doc_id", "text")

    DedupIndex.writeText(corpus, "doc_id", "text", indexDir)
    val idx = DedupIndex.loadText(spark, indexDir)
    assert(idx.params === DedupIndex.TextParams(3, 12, 4, portable = true,
      numBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt))

    // exact probe: bit-identical verdicts
    val exactIdx = Dedup.incrementalExactIndexed(
      batch, "doc_id", "text", idx)
    val exactRe = Dedup.incrementalExact(batch, corpus, "doc_id", "text")
    assert(sortedRows(exactIdx) === sortedRows(exactRe))
    assert(exactIdx.count() > 0)

    // minhash probe: bit-identical pairs (incl. jaccard doubles)
    val lshIdx = Dedup.incrementalMinHashNearDupsReportIndexed(
      batch, "doc_id", "text", idx).pairs
    val lshRe = Dedup.incrementalMinHashNearDupsReport(
      batch, corpus, "doc_id", "text").pairs
    assert(sortedRows(lshIdx) === sortedRows(lshRe))
    assert(lshIdx.count() > 0, "fixture must produce near-dup pairs")

    // simhash probe: bit-identical pairs over the stored signatures
    val simIdx = Dedup.incrementalSimHashNearDupsReportIndexed(
      batch, "doc_id", "text", idx).pairs
    val simRe = Dedup.incrementalSimHashNearDupsReport(
      batch, corpus, "doc_id", "text").pairs
    assert(sortedRows(simIdx) === sortedRows(simRe))
    assert(simIdx.count() > 0, "fixture must produce simhash pairs")

    // no probe may scan the corpus text source
    Seq(exactIdx, lshIdx, simIdx).foreach { probe =>
      val files = probe.inputFiles
      assert(files.nonEmpty, "probe should read the index parquet")
      assert(files.forall(!_.contains(corpusDir)),
        s"probe scanned corpus text:\n${files.mkString("\n")}")
      assert(files.forall(_.contains(indexDir)),
        s"unexpected extra input:\n${files.mkString("\n")}")
    }
  }

  test("corpus-side bucket aggregation and probe join run without exchanging the index") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-plan").toString
    DedupIndex.writeText(
      mkDocs((0L until 200L).filter(_ % 2 == 0)).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    val idx = DedupIndex.loadText(spark, indexDir)
    // the oversized-bucket aggregate leads with the bucket column, so
    // HashPartitioning(bkey) satisfies the clustering
    val agg = idx.bandKeys
      .groupBy(col("bkey"), col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_size"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucket-size aggregate shuffles the index:\n$aggPlan")
    assert(agg.count() > 0)
    // the probe join on the composite bucket key engages the bucketed
    // scan: with broadcast off, the ONLY Exchange is the new batch's
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val newBands = (0 until 40)
        .map(i => (s"${i % 4}|k$i", 9000L + i)).toDF("bkey", "b_id")
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

  test("tombstone-filtered probes keep the bucketed corpus scan and broadcast the tombstones") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-retireplan").toString
    val corpusIds = (0L until 200L).filter(_ % 2 == 0)
    DedupIndex.writeText(mkDocs(corpusIds).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    DedupIndex.retireText(
      corpusIds.filter(_ % 10 == 0).toDF("doc_id"), "doc_id", indexDir)
    val idx = DedupIndex.loadText(spark, indexDir)
    // the live view's anti-join must be a BROADCAST join over the
    // bucketed scan — a shuffled anti-join would re-Exchange the corpus
    // side on every probe and break the index's core scale property
    val plan = idx.bandKeys.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone filter must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"tombstone filter shuffles the corpus side:\n$plan")
    // and the bucket-keyed aggregate over the FILTERED view still rides
    // the bucketed layout: no Exchange beyond the broadcast
    val agg = idx.bandKeys.groupBy(col("bkey"))
      .agg(count(lit(1)).as("n"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("ShuffleExchange"),
      s"bucket aggregate over the live view shuffles:\n$aggPlan")
    assert(agg.count() > 0)
  }

  test("absorb's freshness ledger reads the bucketed counts scan without exchanging the corpus side") {
    CachedPlans.clear()
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-absorbplan").toString
    DedupIndex.writeText(
      mkDocs((0L until 200L).filter(_ % 2 == 0)).toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    val idx = DedupIndex.loadText(spark, indexDir)
    // the shape appendText uses to restrict stored state to batch ids:
    // counts is bucketed by id, so with broadcast off the ONLY Exchange
    // is the batch side shuffling into the bucket layout — at 100 TB the
    // corpus-side ledger never moves, absorb cost tracks the batch
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batchIds = (0L until 50L).map(i => i * 2).toDF("id")
      val state = idx.counts.select(col("id"))
        .join(batchIds, Seq("id"), "left_semi")
      val plan = state.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"ledger restriction must ride the bucketed scan:\n$plan")
      val exchanges = plan.split("\n").count(_.contains("Exchange"))
      assert(exchanges === 1,
        s"expected exactly the batch-side Exchange, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("union staged writes commit the same index as per-component writes") {
    // r18: union staged writes are OPT-IN (spark.graft.stage.unionwrites,
    // default OFF — measured net-negative on this host, see DedupIndex
    // scaladoc). When enabled, the four bkey-bucketed components of a
    // text absorb ride two union inserts (bands+simbands,
    // sizes+simsizes). This spec pins the opt-in path byte-equal to the
    // default per-component path: same base + same absorb sequence
    // (including a refresh, which adds negative size deltas and
    // tombstones) must commit byte-equal component CONTENTS either way.
    CachedPlans.clear()
    val dirU = java.nio.file.Files
      .createTempDirectory("graft-idx-union").toString
    val dirS = java.nio.file.Files
      .createTempDirectory("graft-idx-serial").toString
    val corpusIds = (0L until 80L).filter(_ % 2 == 0)
    val docOf = mkDocs(corpusIds).toMap
    val corpus = corpusIds.map(i => (i, docOf(i))).toDF("doc_id", "text")
    // absorb: new docs + a refresh of the %10 slice
    val absorb = (corpusIds.filter(_ % 10 == 0)
        .map(i => (i, docOf(i) + " v2")) ++
      mkDocs((100L until 130L))).toDF("doc_id", "text")
    def build(dir: String, union: Boolean): DedupIndex.TextIndex = {
      spark.conf.set("spark.graft.stage.unionwrites", union.toString)
      try {
        DedupIndex.writeText(corpus, "doc_id", "text", dir)
        DedupIndex.appendText(absorb, "doc_id", "text", dir)
      } finally spark.conf.unset("spark.graft.stage.unionwrites")
      DedupIndex.loadText(spark, dir)
    }
    val u = build(dirU, union = true)
    val s = build(dirS, union = false)
    def eq(name: String, a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.schema.map(f => (f.name, f.dataType)) ===
        b.schema.map(f => (f.name, f.dataType)), s"$name schema drift")
      assert(sortedRows(a) === sortedRows(b), s"$name content drift")
    }
    eq("bands", u.bandKeys, s.bandKeys)
    eq("simbands", u.simBandKeys, s.simBandKeys)
    eq("sizes", u.bucketSizes, s.bucketSizes)
    eq("simsizes", u.simBucketSizes, s.simBucketSizes)
    eq("sigs", u.sigs, s.sigs)
    eq("shingles", u.shingles, s.shingles)
    eq("counts", u.counts, s.counts)
    eq("dochashes", u.dochashes, s.dochashes)
    eq("hashes", u.hashes, s.hashes)
    eq("simhashes", u.simhashes, s.simhashes)
    assert(u.bandKeys.count() > 0)
  }

  test("randomized absorb/retire/compact sequences keep probes equal to live-set recompute") {
    CachedPlans.clear()
    // the lifecycle property: after ANY interleaving of absorb, retire
    // and compact, probing the index equals recomputing against the
    // model's live set — where the model tracks the documented
    // generational semantics (absorb of an id with matching live
    // content is a no-op, of a tombstoned id RESURRECTS it at a fresh
    // generation; retire tombstones only live generations; compact
    // physically removes dead rows without changing the live set)
    val rng = new scala.util.Random(20260814L)
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-idx-lifecycle").toString
    val pool = (0L until 120L)
    val docOf = mkDocs(pool).toMap
    def docsDf(ids: Iterable[Long]) =
      ids.toSeq.sorted.map(i => (i, docOf(i))).toDF("doc_id", "text")
    // probe batch = the pool's own texts under shifted ids, so exact
    // hash liveness and near-dup candidacy are both exercised per step
    val probeBatch = pool.map(i => (i + 1000L, docOf(i)))
      .toDF("doc_id", "text")

    var indexed = pool.filter(_ % 3 == 0).toSet
    var tombstoned = Set.empty[Long]
    DedupIndex.writeText(docsDf(indexed), "doc_id", "text", indexDir)

    def checkExact(): Unit = {
      val live = indexed -- tombstoned
      val got = sortedRows(Dedup.incrementalExactIndexed(
        probeBatch, "doc_id", "text",
        DedupIndex.loadText(spark, indexDir)))
      val want = sortedRows(Dedup.incrementalExact(
        probeBatch, docsDf(live), "doc_id", "text"))
      assert(got === want,
        s"probe != live recompute (|indexed|=${indexed.size}, " +
          s"|tombstoned|=${tombstoned.size})")
    }
    def checkLsh(): Unit = {
      val live = indexed -- tombstoned
      val got = sortedRows(Dedup.incrementalMinHashNearDupsReportIndexed(
        probeBatch, "doc_id", "text",
        DedupIndex.loadText(spark, indexDir)).pairs)
      val want = sortedRows(Dedup.incrementalMinHashNearDupsReport(
        probeBatch, docsDf(live), "doc_id", "text").pairs)
      assert(got === want, "LSH probe != live recompute")
    }

    for (step <- 1 to 9) {
      rng.nextInt(3) match {
        case 0 => // absorb a mixed batch: fresh + already-indexed + tombstoned
          val chosen = pool.filter(_ => rng.nextInt(4) == 0).toSet
          if (chosen.nonEmpty) {
            DedupIndex.appendText(docsDf(chosen), "doc_id", "text",
              indexDir)
            indexed ++= chosen
            tombstoned --= chosen // absorbing a dead id resurrects it
          }
        case 1 => // retire a mixed batch: live + unknown + re-deletes
          val chosen = pool.filter(_ => rng.nextInt(5) == 0).toSet
          if (chosen.nonEmpty) {
            DedupIndex.retireText(chosen.toSeq.toDF("doc_id"), "doc_id",
              indexDir)
            tombstoned ++= (chosen & indexed)
          }
        case 2 =>
          DedupIndex.compactText(spark, indexDir)
          indexed --= tombstoned
          tombstoned = Set.empty
      }
      checkExact()
      if (step % 3 == 0) checkLsh()
    }
    // end with a compaction and a final full check of both modalities
    DedupIndex.compactText(spark, indexDir)
    indexed --= tombstoned
    tombstoned = Set.empty
    checkExact()
    checkLsh()
    assert(indexed.nonEmpty, "degenerate run — fixture never kept docs")
  }

}
