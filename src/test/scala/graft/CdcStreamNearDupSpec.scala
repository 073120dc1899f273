package graft

import graft.model.{CdcColumns => C, ListingMode}
import graft.operators.ChangeLogReducer
import graft.sources.{CdcFileLister, ChangeLogReader}
import graft.streaming.CdcStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming near-dup/dedup: watermark-bounded cross-batch pair
  * detection, index-aware probes against persisted corpora, estimator
  * error bounds, event-time expiry, and perceptual keys.
  */
class CdcStreamNearDupSpec extends CdcStreamSpecBase {
  import spark.implicits._

  test("streaming dedup drops cross-batch replays within the watermark") {
    val dir = Files.createTempDirectory("stream_dd").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: docs 1, 2; batch 2 replays doc 1 (later ts) + new doc 3
    Seq((1L, ts(0), "a"), (2L, ts(1), "b"))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b1")
    Seq((1L, ts(2), "a-replay"), (3L, ts(3), "c"))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
    val q = graft.streaming.CdcStream
      .dedupStream(stream, "ts", "1 hour", Seq("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out")
      .select("doc_id", "payload").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      "first occurrence kept, within-watermark replay dropped")
  }

  test("streaming incremental dedup probes the static corpus index") {
    val dir = Files.createTempDirectory("stream_incr").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: corpus dup + fresh doc; batch 2: replay of the fresh text
    // (within-stream dup) + another fresh doc
    Seq((10L, ts(0), "known text"), (11L, ts(1), "fresh one"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((12L, ts(2), "fresh one"), (13L, ts(3), "fresh two"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b2")
    // the already-deduped corpus's stored hash index
    val corpusIndex = Seq("known text").toDF("t")
      .select(md5($"t").as("content_hash"))

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/b*/")
    val q = graft.streaming.CdcStream
      .incrementalDedupStream(stream, corpusIndex, "text", "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("incr_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("incr_out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 10 hits the corpus index, 12 replays 11 within the watermark
    assert(got === Seq(11L, 13L))
  }

  test("streaming near-dup detection flags pairs within and across batches") {
    val dir = Files.createTempDirectory("stream_nd").toString
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // batch 1: two identical docs (within-batch pair); batch 2: a third
    // identical doc (cross-batch pairs vs state) + a disjoint doc
    Seq((1L, same), (2L, same))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, same), (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("neardup_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    // identical docs agree on every minhash component in every band
    assert(cands.forall(_._3 === 1.0))
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      "within-batch pair + both cross-batch pairs, disjoint doc unflagged")
    // on identical docs the estimate equals exact Jaccard, so the
    // stream's output matches the batch pipeline's verified pairs here
    // (in general streams emit CANDIDATES; batch re-verifies exactly)
    val batchPairs = graft.operators.Dedup.minHashNearDups(
        spark.read.parquet(s"$dir/b*/"), "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(batchPairs === pairs)
  }

  test("index-aware near-dup pairs arrivals against the persisted corpus from batch 1") {
    val dir = Files.createTempDirectory("stream_ndidx").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val freshText = "one two three four five six seven eight nine ten"
    // the already-indexed corpus: docs 100 (known) and 101 (unrelated)
    val corpus = Seq(
      (100L, corpusText),
      (101L, "red green blue cyan magenta yellow black white gray pink"))
      .toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("stream_ndidx_idx").toString
    graft.operators.DedupIndex.writeText(corpus, "doc_id", "text", idxDir)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    // batch 1: a near-dup of corpus doc 100 — a plain nearDupStream
    // restarted with empty state would emit NOTHING for it; the indexed
    // form must pair it immediately. batch 2: twin fresh docs (the
    // stateful new×new path must still work alongside the probe).
    Seq((1L, corpusText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, freshText), (3L, freshText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndidx_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("ndidx_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cands.forall(_._3 === 1.0), cands)
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L)),
      "corpus probe pairs (100,1); stateful path pairs (2,3); " +
        "unrelated corpus doc 101 stays unflagged")
  }

  test("index-aware streaming near-dup probe ignores retired corpus docs") {
    val dir = Files.createTempDirectory("stream_ndret").toString
    val idxDir = Files.createTempDirectory("stream_ndret_idx").toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // docs 100 and 101 share the text — both would pair an arrival;
    // retiring 100 must leave only 101 pairing (per-copy liveness)
    graft.operators.DedupIndex.writeText(
      Seq((100L, corpusText), (101L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    graft.operators.DedupIndex.retireText(
      Seq(100L).toDF("doc_id"), "doc_id", idxDir)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    Seq((1L, corpusText)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndret_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndret_out")
      .filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.distinct
    assert(pairs === Seq((101L, 1L)),
      s"retired corpus doc must not pair the stream probe: $pairs")
  }

  test("streaming near-dup estimator error vs batch exact Jaccard is bounded") {
    // The stream accepts corpus candidates on the 12-hash SIGNATURE
    // AGREEMENT estimate (est = matching components / 12) while the
    // batch pipeline verifies exact Jaccard — a documented divergence.
    // This case QUANTIFIES it: est is Binomial(12, J)/12, so Hoeffding
    // gives P(|est − J| ≥ ε) ≤ 2·exp(−24ε²) — ≈ 2% at ε = 0.4, ≈ 11%
    // at ε = 0.35. The declared contract asserted here:
    //   (a) no acceptance flip outside the |J − t| < 0.35 gray zone,
    //   (b) every emitted estimate within 0.4 of its exact Jaccard,
    //   (c) flips confined to a minority of the verified pairs.
    // Fixture: 30 corpus/arrival pairs with ANALYTIC Jaccard — each
    // pair has its own 40-word vocabulary, the two docs share k of
    // their 20 distinct words, so J = k / (40 − k) sweeps 0.05…1.0
    // across the t = 0.5 threshold (shingleN = 1 ⇒ shingles = words).
    val dir = Files.createTempDirectory("stream_nderr").toString
    val ks = Seq(2, 5, 8, 10, 12, 13, 14, 16, 18, 20)
    val pairsSpec = for (rep <- 0 until 3; k <- ks) yield (rep, k)
    def words(pair: Int, from: Int, n: Int): String =
      (from until from + n).map(j => s"p${pair}w$j").mkString(" ")
    val fixtures = pairsSpec.zipWithIndex.map { case ((_, k), p) =>
      // corpus doc: words 0..19; arrival: words (20−k)..(39−k) → k shared
      val corpusDoc = (1000L + p, words(p, 0, 20))
      val arrival = (p.toLong, words(p, 20 - k, 20))
      val jexact = k.toDouble / (40 - k).toDouble
      (p, corpusDoc, arrival, jexact)
    }
    val corpus = fixtures.map(_._2).toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("stream_nderr_idx").toString
    graft.operators.DedupIndex.writeText(corpus, "doc_id", "text", idxDir,
      shingleN = 1)
    val idx = graft.operators.DedupIndex.loadText(spark, idxDir)

    fixtures.map(_._3).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStreamIndexed(stream, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("nderr_out").start()
    try q.processAllAvailable() finally q.stop()

    val t = 0.5
    val jOf = fixtures.map(f => f._1 -> f._4).toMap
    // stream-accepted (corpus probe side only) with the emitted estimate
    val streamAcc = spark.table("nderr_out")
      .filter(!$"overflow" && $"a_id" >= 1000L)
      .select(($"a_id" - 1000L).as("p"), $"est_jaccard")
      .as[(Long, Double)].collect().toMap
    // batch-accepted: same index candidacy, EXACT-Jaccard verify
    val batchAcc = graft.operators.Dedup
      .incrementalMinHashNearDupsReportIndexed(
        fixtures.map(_._3).toDF("doc_id", "text"), "doc_id", "text", idx,
        threshold = t)
      .pairs.select(($"a_id" - 1000L).as("p"), $"jaccard")
      .as[(Long, Double)].collect().toMap
    // the analytic Jaccard IS the batch-verified one (sanity)
    batchAcc.foreach { case (p, j) =>
      assert(math.abs(j - jOf(p.toInt)) < 1e-12, s"pair $p: $j") }
    assert(batchAcc.nonEmpty && streamAcc.nonEmpty)

    // (b) every emitted estimate within Hoeffding ε = 0.4 of exact
    streamAcc.foreach { case (p, est) =>
      assert(math.abs(est - jOf(p.toInt)) <= 0.4,
        s"pair $p: est $est vs exact ${jOf(p.toInt)} — estimator drifted " +
          "past the 0.4 bound (P ≈ 2% per pair under Hoeffding)")
    }
    // (a) flips only inside the |J − t| < 0.35 gray zone
    val flips = (streamAcc.keySet diff batchAcc.keySet) ++
      (batchAcc.keySet diff streamAcc.keySet)
    flips.foreach { p =>
      assert(math.abs(jOf(p.toInt) - t) < 0.35,
        s"pair $p flipped with exact J = ${jOf(p.toInt)} — outside the " +
          "gray zone the 12-hash estimate is contracted to respect")
    }
    // (c) flips are the minority of all pairs either side verified
    val union = streamAcc.keySet ++ batchAcc.keySet
    assert(flips.size.toDouble / union.size <= 0.34,
      s"${flips.size}/${union.size} acceptance flips — estimator too " +
        "noisy for the declared threshold contract")
    val falseAcc = (streamAcc.keySet diff batchAcc.keySet).size
    val falseRej = (batchAcc.keySet diff streamAcc.keySet).size
    info(s"measured on the 30-pair sweep: $falseAcc false-accepts, " +
      s"$falseRej false-rejects over ${union.size} verified pairs; " +
      s"flip J values: ${flips.toSeq.sorted.map(p => jOf(p.toInt))
        .map(j => f"$j%.3f").mkString(", ")}")
    // non-vacuity: clear accepts (J = 1) agree on both sides
    val sureIds = fixtures.filter(_._4 >= 0.99).map(_._1.toLong)
    assert(sureIds.forall(p => streamAcc.contains(p) && batchAcc.contains(p)),
      "exact-duplicate pairs must be accepted by BOTH semantics")
  }

  test("index-aware embedding near-dup pairs arrivals against the persisted vector index") {
    val dir = Files.createTempDirectory("stream_endidx").toString
    val dim = 8
    // two well-separated clusters; members of a cluster are near-dups
    def vec(cluster: Int, jitter: Int): Array[Float] = Array.tabulate(dim)(
      d => (if (cluster == 0) 10f else -10f) + ((jitter + d * 3) % 5) * 0.1f)
    // the already-indexed corpus: one vector per cluster
    val corpus = Seq((100L, vec(0, 1)), (101L, vec(1, 2)))
      .toDF("vec_id", "embedding")
    val idxDir = Files.createTempDirectory("stream_endidx_idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      idxDir, planes = 2, dim = dim)
    val idx = graft.operators.DedupIndex.loadVectors(spark, idxDir)

    // batch 1: a near-dup of corpus vector 100 — pairs via the index
    // probe immediately. batch 2: twin fresh cluster-1 vectors — the
    // stateful new×new path pairs them (and each pairs corpus 101).
    Seq((1L, vec(0, 3))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, vec(1, 4)), (3L, vec(1, 4)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.embedNearDupStreamIndexed(stream, "vec_id",
        "embedding", idx, threshold = 0.9)
      .writeStream.outputMode("append")
      .format("memory").queryName("endidx_out").start()
    try q.processAllAvailable() finally q.stop()

    val cands = spark.table("endidx_out")
      .filter(!$"overflow")
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cands.forall(_._3 >= 0.9), cands)
    val pairs = cands.map(c => (c._1, c._2)).distinct.sorted
    assert(pairs === Seq((2L, 3L), (100L, 1L), (101L, 2L), (101L, 3L)),
      "corpus probes (100,1)/(101,2)/(101,3); stateful path (2,3)")

    // corpus-pair scores are bit-identical to the batch indexed probe
    val batchScores = graft.operators.Similarity
      .incrementalCosineNearDupsIndexed(
        spark.read.parquet(s"$dir/b*/"), "vec_id", "embedding", idx,
        threshold = 0.9)
      .select("a_id", "b_id", "score")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val streamCorpusScores = cands.filter(_._1 >= 100L).distinct.sorted
    assert(streamCorpusScores === batchScores)
  }

  test("near-dup state expires past the event-time horizon") {
    val dir = Files.createTempDirectory("stream_ndttl").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val third = "red green blue cyan magenta yellow black white gray pink"
    // b1 seeds bucket A at 10:00 (expiry 11:00 with a 1h horizon);
    // b2 advances the watermark to 12:00; b3 gives bucket A an idle
    // trigger at watermark > expiry → state removed; b4's identical doc
    // must NOT pair with doc 1 — only with its same-batch twin
    Seq((1L, ts(10, 0), same)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, ts(13, 0), other)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b2")
    Seq((4L, ts(13, 30), third)).toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(s"$dir/b3")
    Seq((5L, ts(13, 45), same), (6L, ts(13, 50), same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b4")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text",
        eventTime = Some(("ts", "1 hour")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ndttl_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndttl_out").filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().distinct.sorted.toSeq
    assert(pairs === Seq((5L, 6L)),
      "expired bucket must not pair across the horizon; fresh twins must")
  }

  test("near-dup stream survives null event-time rows") {
    val dir = Files.createTempDirectory("stream_ndnull").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a null-timestamp row rides along in BOTH batches: it must be
    // dropped (not NPE the bucket-expiry max) and never pair
    Seq((1L, Option(ts(10, 0)), same), (2L, Option.empty[java.sql.Timestamp], same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b1")
    Seq((3L, Option(ts(10, 5)), same), (4L, Option.empty[java.sql.Timestamp], same))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$dir/b2")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.nearDupStream(stream, "doc_id", "text",
        eventTime = Some(("ts", "1 hour")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ndnull_out").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("ndnull_out").filter(!$"overflow")
      .select("a_id", "b_id").as[(Long, Long)].collect().distinct.sorted.toSeq
    assert(pairs === Seq((1L, 3L)),
      "timestamped twins pair; null-ts rows are dropped, not fatal")
  }

  test("streaming perceptual dedup keys on what the image looks like") {
    val dir = Files.createTempDirectory("stream_ahash").toString
    import graft.operators.MediaCodecs
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rgbA = Array.tabulate(192)(i =>
      if ((i / 3) % 8 >= 4) 200.toByte else 0.toByte)
    val rgbB = Array.tabulate(192)(i =>
      if ((i / 3) % 8 < 4) 200.toByte else 0.toByte)
    // b1: BMP of pattern A + an undecodable payload; b2: a PNG
    // RE-ENCODE of pattern A (byte-different, perceptually identical),
    // a BMP of pattern B, another undecodable payload
    Seq((1L, ts(0), MediaCodecs.encodeBmp(8, 8, rgbA)),
        (4L, ts(1), Array[Byte](1, 2, 3, 4, 5)))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b1")
    Seq((2L, ts(5), MediaCodecs.encodePng(8, 8, rgbA)),
        (3L, ts(6), MediaCodecs.encodeBmp(8, 8, rgbB)),
        (5L, ts(7), Array[Byte](9, 9, 9, 9, 9)))
      .toDF("doc_id", "ts", "payload").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = CdcStream.ahashDedupStream(stream, "doc_id", "payload",
        "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("ahash_out").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ahash_out").select("doc_id", "decoded")
      .as[(Long, Boolean)].collect().toMap
    assert(rows.keySet === Set(1L, 3L, 4L, 5L),
      s"the PNG re-encode of pattern A must dedup against its BMP: $rows")
    // decodable rows carry their code; undecodable rows pass with the flag
    assert(rows(1L) && rows(3L) && !rows(4L) && !rows(5L))
  }

}
