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
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long]): Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet gray town square every single evening"
    ids.map { i =>
      // groups of 4 share a template; member 0/1 of a group are exact
      // dups, member 2 a near-dup (one word swapped), member 3 distinct
      val g = i / 4
      i % 4 match {
        case 0 | 1 => (i, s"group $g: $base")
        case 2 => (i, s"group $g: ${base.replace("lazy", "sleepy")}")
        case _ => (i, s"doc $i is entirely different text " +
          s"about topic ${i * 37} with its own unique vocabulary $i")
      }
    }
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
  }

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
