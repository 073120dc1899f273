package graft

import org.apache.spark.sql.functions._

/** BM25 retrieval and the LSH recall gate: rank semantics, the exact
  * integer quantization replayed by a driver-side reference
  * implementation, query-term capping, and the recall report's
  * invariants (bucket-10 pairs are ALWAYS candidates; counts bounded).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Bigram terms, mirroring the operator's termNgram = 2 path. */
  private def termsOf(s: String): Seq[String] =
    tokensOf(s).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq

  /** Driver-side replay of the quantized BM25 (BigInt, so no overflow
    * concerns): the reference the Spark plan must match bit-for-bit.
    */
  private def refBm25(docs: Seq[(Long, String)], qId: Long, qText: String,
      qTerms: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> termsOf(t) }.toMap
    val n = BigInt(docs.size)
    val total = BigInt(toks.values.map(_.size).sum)
    val tf = docs.flatMap { case (id, t) =>
      termsOf(t).groupBy(identity).map { case (w, o) => (id, w, o.size) }
    }
    val df = tf.groupBy(_._2).map { case (w, rows) => w -> BigInt(rows.size) }
    // rarest-first term selection, mirroring the operator: terms absent
    // from the corpus are excluded, ties break lexicographically
    val qts = termsOf(qText).distinct
      .flatMap(w => df.get(w).map(d => (d, w)))
      .sortBy { case (d, w) => (d, w) }.take(qTerms).map(_._2).toSet
    tf.filter { case (_, w, _) => qts.contains(w) }
      .groupBy(_._1).map { case (id, rows) =>
        val dl = BigInt(toks(id).size)
        val score = rows.map { case (_, w, tfv) =>
          val t = BigInt(tfv)
          val num = BigInt(10000) * (2 * n - 2 * df(w) + 1) * 44 * t * total
          val den = (2 * df(w) + 1) *
            (BigInt(20) * t * total + 6 * total + 18 * dl * n)
          num / den
        }.sum
        id -> (BigInt(rows.size).toLong, score.toLong)
      }
  }

  private val corpus = Seq(
    0L -> "apple banana cherry",
    1L -> "apple banana cherry dog egg",
    2L -> "apple banana xx yy zz",
    3L -> "apple k1 k2 k3 k4",
    4L -> "qq ww ee rr tt")

  test("bm25 ranks by quantized score and matches the driver-side replay") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq(0L -> "apple banana cherry").toDF("doc_id", "text")
    val out = graft.operators.Retrieval
      .bm25TopK(docs, queries, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .orderBy("rank")
      .select("q_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.forall(_._1 === 0L))
    // docs 3/4 share no query bigram ("apple k1" != "apple banana"): absent
    assert(!out.exists(r => r._3 === 3L || r._3 === 4L))
    val ref = refBm25(corpus, 0L, "apple banana cherry", 8)
    assert(out.map(r => r._3 -> (r._4, r._5)).toMap === ref)
    // ranks follow (score desc, doc_id): the full-match short doc wins
    val expected = ref.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.map(_._1)
    assert(out.sortBy(_._2).map(_._3) === expected)
    assert(out.head._3 === 0L, "self-retrieval must rank first")
  }

  test("bm25 breaks score ties by doc_id and caps query terms") {
    val docs = Seq(
      0L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",
      10L -> "unique1 zeta", 11L -> "unique1 zeta",
      9L -> "t9 t10 pad1 pad2").toDF("doc_id", "text")
    // tie: identical docs 10/11 under a query matching both
    val tie = Seq(100L -> "unique1 zeta").toDF("doc_id", "text")
    val tieOut = graft.operators.Retrieval
      .bm25TopK(docs, tie, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .orderBy("rank").select("doc_id", "score")
      .as[(Long, Long)].collect().toSeq
    assert(tieOut.map(_._1) === Seq(10L, 11L))
    assert(tieOut(0)._2 === tieOut(1)._2)
    // qTerms = 8: the query has 9 bigrams; "t9 t10" is the COMMONEST
    // (df 2 — docs 0 and 9 — vs df 1), so it falls off the rarest-8 cut
    // and doc 9 (which shares ONLY that bigram) is never retrieved
    val q10 = Seq(200L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
      .toDF("doc_id", "text")
    val capped = graft.operators.Retrieval
      .bm25TopK(docs, q10, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(capped === Set(0L))
  }

  test("declared query runs on testdata: contiguous ranks, scores sorted") {
    val out = graft.queries.RetrievalQueries
      .bm25TopK(spark, "/root/testdata/sf0.001")
      .select("q_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to rows.size), s"ranks not contiguous for $q")
      assert(sorted.map(_._5).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"scores not non-increasing for $q")
      assert(rows.forall(r => r._4 >= 1 && r._4 <= 8 && r._5 > 0))
      // when the query doc survives into its own top-k it matches all
      // its terms (n_terms can only tie, never exceed); absence is
      // legitimate — shorter full-matches outscore under length
      // normalization, and a 7-term match with rarer/denser terms can
      // outscore an 8-term one (observed on this corpus)
      rows.find(r => r._3 === q).foreach { self =>
        assert(self._4 === rows.map(_._4).max)
      }
    }
  }

  test("indexed bm25 probe matches recompute bit-for-bit, never scans corpus text") {
    graft.plans.CachedPlans.clear()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-bm25-corpus").toString
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft-bm25-idx").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    graft.operators.DedupIndex.writeLexical(
      docs, "doc_id", "text", indexDir, termNgram = 2)
    val idx = graft.operators.DedupIndex.loadLexical(spark, indexDir)
    assert(idx.nDocs === 5L && idx.params.termNgram === 2)
    val queries = Seq(0L -> "apple banana cherry").toDF("doc_id", "text")
    val probe = graft.operators.Retrieval
      .bm25TopKIndexed(idx, queries, "doc_id", "text")
    val recompute = graft.operators.Retrieval
      .bm25TopK(docs, queries, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    assert(probe.orderBy("rank").select(cols.head, cols.tail: _*)
      .collect().toSeq ===
      recompute.orderBy("rank").select(cols.head, cols.tail: _*)
        .collect().toSeq)
    val files = probe.inputFiles
    assert(files.nonEmpty && files.forall(!_.contains(corpusDir)),
      s"probe scanned corpus text:\n${files.mkString("\n")}")
    assert(files.forall(_.contains(indexDir)),
      s"unexpected extra input:\n${files.mkString("\n")}")
  }

  test("declared indexed bm25 query equals the recompute query on testdata") {
    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    val idxOut = graft.queries.RetrievalQueries
      .bm25TopKIndexed(spark, "/root/testdata/sf0.001")
      .select(cols.head, cols.tail: _*).collect().toSeq
    val reOut = graft.queries.RetrievalQueries
      .bm25TopK(spark, "/root/testdata/sf0.001")
      .select(cols.head, cols.tail: _*).collect().toSeq
    assert(idxOut.nonEmpty && idxOut === reOut)
  }

  test("phrase and proximity: slop 0 degenerates to the phrase, slop finds stretched matches, indexed == recompute") {
    graft.plans.CachedPlans.clear()
    val docs = Seq(
      0L -> "the quick brown fox jumps",          // exact occurrence
      1L -> "the quick xx brown fox",             // stretched by 1 word
      2L -> "the quick xx yy zz brown",           // stretched by 3 — past slop 2
      3L -> "brown quick the order matters not",  // reordered — never matches
      4L -> "the quick brown the quick brown"     // two occurrences
    ).toDF("doc_id", "text")
    val q = Seq(100L -> "the quick brown extra words ignored")
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame,
        freqCol: String): Seq[(Long, Long, Long)] =
      df.select(col("doc_id"), col("rank").cast("long"), col(freqCol))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val phrase = rows(graft.operators.Retrieval.phraseTopK(
      docs, q, "doc_id", "text", "doc_id", "text"), "phrase_freq")
    // exact matches: doc 4 (two starts) ranks first, doc 0 second
    assert(phrase === Seq((0L, 2L, 1L), (4L, 1L, 2L)))
    // slop 0 IS the phrase — same docs, same frequencies, same ranks
    val prox0 = rows(graft.operators.Retrieval.proximityTopK(
      docs, q, "doc_id", "text", "doc_id", "text", slop = 0), "prox_freq")
    assert(prox0 === phrase)
    // slop 2 additionally admits the 1-word stretch (gap 2 ≤ slop+1)
    // but not the 3-word stretch (gap 4), never the reordered doc; the
    // double occurrence still counts 2 distinct anchors
    val prox2 = rows(graft.operators.Retrieval.proximityTopK(
      docs, q, "doc_id", "text", "doc_id", "text", slop = 2), "prox_freq")
    assert(prox2 === Seq((0L, 2L, 1L), (1L, 3L, 1L), (4L, 1L, 2L)))
    // the indexed forms replay both bit-for-bit from the positions
    // component
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-phrase-idx").toString
    graft.operators.DedupIndex.writeLexical(docs, "doc_id", "text",
      idxDir, termNgram = 2)
    val idx = graft.operators.DedupIndex.loadLexical(spark, idxDir)
    assert(rows(graft.operators.Retrieval.phraseTopKIndexed(
      idx, q, "doc_id", "text"), "phrase_freq") === phrase)
    assert(rows(graft.operators.Retrieval.proximityTopKIndexed(
      idx, q, "doc_id", "text", slop = 2), "prox_freq") === prox2)
  }

  test("rrf fusion: both-list docs outrank single-list, exact quantized sums") {
    val a = Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3), (1L, 200L, 5))
      .toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 101L, 1), (1L, 103L, 2), (1L, 104L, 5))
      .toDF("q_id", "doc_id", "rank")
    val out = graft.operators.Retrieval.rrfFuse(Seq(a, b))
      .orderBy("rank")
      .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // contributions: floor(10000/(60+r)) = 163, 161, 158, _, 153 for r=1,2,3,5
    // doc 101 in BOTH lists (r2 + r1 = 161+163 = 324) beats every
    // single-list doc including A's r1; 104/200 tie at 153 -> doc_id order
    assert(out.map(r => (r._3, r._4, r._5)) === Seq(
      (101L, 2L, 324L), (100L, 1L, 163L), (103L, 1L, 161L),
      (102L, 1L, 158L), (104L, 1L, 153L), (200L, 1L, 153L)))
    assert(out.map(_._2) === (1 to 6))
  }

  test("declared hybrid query: legs fuse, self excluded, scores replay") {
    val out = graft.queries.RetrievalQueries
      .hybridRrf(spark, "/root/testdata/sf0.001")
      .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(!out.exists(r => r._3 === r._1), "self must not be retrieved")
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to rows.size), s"ranks not contiguous for $q")
      assert(sorted.map(_._5).sliding(2).forall {
        case Seq(x, y) => x >= y; case _ => true })
    }
    assert(out.forall(r => r._4 >= 1 && r._4 <= 2))
    // a doc's score must be expressible as a sum of n_lists valid
    // contributions floor(10000/(60+r)), r in 1..LegK
    val valid = (1 to graft.queries.RetrievalQueries.LegK)
      .map(r => 10000L / (60 + r)).toSet
    assert(out.filter(_._4 === 1L).forall(r => valid.contains(r._5)))
    assert(out.filter(_._4 === 2L).forall(r =>
      valid.exists(c => valid.contains(r._5 - c))))
  }

  test("ivf-legged hybrid: fused ranks contiguous, self excluded, quantized sums") {
    val out = graft.queries.RetrievalQueries
      .hybridRrfIvf(spark, "/root/testdata/sf0.001")
      .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(!out.exists(r => r._3 === r._1), "self must not be retrieved")
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.sortBy(_._2).map(_._2) === (1 to rows.size),
        s"ranks not contiguous for $q")
    }
    val valid = (1 to graft.queries.RetrievalQueries.LegK)
      .map(r => 10000L / (60 + r)).toSet
    assert(out.filter(_._4 === 1L).forall(r => valid.contains(r._5)))
    assert(out.filter(_._4 === 2L).forall(r =>
      valid.exists(c => valid.contains(r._5 - c))))
  }

  test("ivf-indexed hybrid: well-formed fusion, dense leg reads lists not stored vectors") {
    val df = graft.queries.RetrievalQueries
      .hybridRrfIvfIndexed(spark, "/root/testdata/sf0.001")
    val out = df.select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(!out.exists(r => r._3 === r._1), "self must not be retrieved")
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.sortBy(_._2).map(_._2) === (1 to rows.size),
        s"ranks not contiguous for $q")
    }
    val valid = (1 to graft.queries.RetrievalQueries.LegK)
      .map(r => 10000L / (60 + r)).toSet
    assert(out.filter(_._4 === 1L).forall(r => valid.contains(r._5)))
    assert(out.filter(_._4 === 2L).forall(r =>
      valid.exists(c => valid.contains(r._5 - c))))
    // the scale contract this form exists for: the dense leg probes the
    // persisted IVF structure (inverted code lists + stored centroids),
    // NEVER the full stored-vector table — the corpus-scan-per-query
    // shape round 11 flagged
    val files = df.inputFiles
    assert(files.exists(_.contains("/lists/")),
      "dense leg must probe the IVF inverted lists")
    assert(files.exists(_.contains("/centroids/")),
      "dense leg must broadcast the stored centroids")
    assert(!files.exists(_.contains("/buckets/")),
      "dense leg scans the stored-vector table — the brute-leg " +
        "scale-killer is back")
  }

  test("hybrid fusion stays exact over a CDC-maintained lexical index") {
    import java.nio.file.Files
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(d => (((seed * 7 + d * 3) % 11) - 5).toFloat)
    def doc(i: Long) = s"fused$i doc$i shared hybrid filler words fused$i"
    def docV2(i: Long) = doc(i) + " revised second edition"
    val lexDir = Files.createTempDirectory("hyb-maint-lex").toString
    val vecDir = Files.createTempDirectory("hyb-maint-vec").toString
    val seed = (1L to 6L).map(i => i -> doc(i))
    graft.operators.DedupIndex.writeLexical(
      seed.toDF("doc_id", "text"), "doc_id", "text", lexDir, termNgram = 2)
    graft.operators.DedupIndex.writeVectors(
      seed.map { case (i, _) => (i, vec(i.toInt)) }
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", vecDir, planes = 2, dim = dim)
    // CDC: refresh doc 3, retire doc 5 — the lexical leg's statistics
    // all move; the dense leg is untouched
    graft.operators.DedupIndex.appendLexical(
      Seq(3L -> docV2(3)).toDF("doc_id", "text"), "doc_id", "text", lexDir)
    graft.operators.DedupIndex.retireLexical(
      Seq(5L).toDF("doc_id"), "doc_id", lexDir)
    val live = Seq(1L -> doc(1), 2L -> doc(2), 3L -> docV2(3),
      4L -> doc(4), 6L -> doc(6))
    val queries = Seq((1L, doc(1), vec(1)), (10L, docV2(3), vec(10)))
      .toDF("doc_id", "text", "embedding")
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    def leg(lexDf: org.apache.spark.sql.DataFrame) = lexDf
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(lexW))
      .select(col("q_id"), col("doc_id"), col("rank"))
    val vecIdx = graft.operators.DedupIndex.loadVectors(spark, vecDir)
    val den = graft.operators.Similarity.ivfSq8TopKIndexed(
        queries, "doc_id", "embedding", vecIdx, 3, nprobe = 3)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    def fused(lexDf: org.apache.spark.sql.DataFrame) =
      graft.operators.Retrieval.rrfFuse(Seq(leg(lexDf), den), 3)
        .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
        .as[(Long, Int, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
    val maintained = fused(graft.operators.Retrieval.bm25TopKIndexed(
      graft.operators.DedupIndex.loadLexical(spark, lexDir),
      queries, "doc_id", "text", 3, 8))
    val recompute = fused(graft.operators.Retrieval.bm25TopK(
      live.toDF("doc_id", "text"), queries,
      "doc_id", "text", "doc_id", "text", 3, 8, termNgram = 2))
    assert(maintained.nonEmpty && maintained === recompute,
      "fusion over the maintained lexical index diverged from the " +
        "live-corpus recompute")
  }

  test("indexed hybrid replays the recompute form row for row") {
    val sf = "/root/testdata/sf0.001"
    val cols = Seq("q_id", "rank", "doc_id", "n_lists", "rrf_score")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val recompute = rows(graft.queries.RetrievalQueries.hybridRrf(spark, sf))
    val indexed =
      rows(graft.queries.RetrievalQueries.hybridRrfIndexed(spark, sf))
    assert(indexed.nonEmpty)
    assert(indexed === recompute)
  }

  test("streaming bm25 search serves the index per micro-batch, replay-safe, rebuild-aware") {
    import java.nio.file.Files
    val idxDir = Files.createTempDirectory("bm25-stream-idx").toString
    val qDir = Files.createTempDirectory("bm25-stream-q").toString
    val outDir = Files.createTempDirectory("bm25-stream-out").toString
    val docs = corpus.toDF("doc_id", "text")
    graft.operators.DedupIndex.writeLexical(
      docs, "doc_id", "text", idxDir, termNgram = 2)
    Seq(0L -> "apple banana cherry").toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$qDir/b1")
    Seq(100L -> "apple banana xx yy").toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$qDir/b2")
    val schema = spark.read.parquet(s"$qDir/b1").schema
    def queryStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$qDir/b*/")
    val q = graft.streaming.CdcStream.startBm25Search(
      queryStream, "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory("bm25-stream-ck1").toString)
    try q.processAllAvailable() finally q.stop()

    val cols = Seq("q_id", "rank", "doc_id", "n_terms", "score")
    def sortedOut = spark.read.parquet(outDir)
      .select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(1)))
    def batchProbe(queries: Seq[(Long, String)]) = graft.operators.Retrieval
      .bm25TopKIndexed(graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries.toDF("doc_id", "text"), "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(1)))
    val expected = batchProbe(Seq(
      0L -> "apple banana cherry", 100L -> "apple banana xx yy"))
    assert(sortedOut === expected && expected.nonEmpty)

    // worst-case replay: same files, checkpoint LOST — the per-batch
    // dynamic partition overwrite rewrites instead of duplicating
    val q2 = graft.streaming.CdcStream.startBm25Search(
      queryStream, "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory("bm25-stream-ck2").toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(sortedOut === expected, "replayed batches must not duplicate")

    // a mid-stream rebuild is served by the NEXT batch with
    // self-consistent stats: re-index with an extra doc, re-serve
    graft.operators.DedupIndex.writeLexical(
      docs.unionByName(Seq(5L -> "apple banana cherry dog")
        .toDF("doc_id", "text")),
      "doc_id", "text", idxDir, termNgram = 2)
    val q3 = graft.streaming.CdcStream.startBm25Search(
      queryStream, "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory("bm25-stream-ck3").toString)
    try q3.processAllAvailable() finally q3.stop()
    val rebuilt = batchProbe(Seq(
      0L -> "apple banana cherry", 100L -> "apple banana xx yy"))
    assert(sortedOut === rebuilt, "served results must match the rebuilt index")
    assert(rebuilt != expected, "rebuilt index must serve refreshed rankings")
  }

  test("streaming phrase search serves the positions per micro-batch, sees CDC refreshes, replays clean") {
    import java.nio.file.Files
    graft.plans.CachedPlans.clear()
    val idxDir = Files.createTempDirectory("ph-stream-idx").toString
    val qDir = Files.createTempDirectory("ph-stream-q").toString
    val outDir = Files.createTempDirectory("ph-stream-out").toString
    val pdocs = Seq(
      0L -> "the quick brown fox jumps",
      1L -> "the quick xx brown fox",
      4L -> "the quick brown the quick brown")
    graft.operators.DedupIndex.writeLexical(
      pdocs.toDF("doc_id", "text"), "doc_id", "text", idxDir,
      termNgram = 2)
    Seq(100L -> "the quick brown anything after")
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$qDir/b1")
    val schema = spark.read.parquet(s"$qDir/b1").schema
    def queryStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$qDir/b*/")
    def start(ck: String) = graft.streaming.CdcStream.startPhraseSearch(
      queryStream, "doc_id", "text", idxDir, outDir,
      Files.createTempDirectory(ck).toString)
    val cols = Seq("q_id", "rank", "doc_id", "phrase_freq")
    def got(qIds: Set[Long]) = spark.read.parquet(outDir)
      .filter($"q_id".isin(qIds.toSeq: _*))
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    def expected(queries: Seq[(Long, String)]) = graft.operators.Retrieval
      .phraseTopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries.toDF("doc_id", "text"), "doc_id", "text")
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val q = start("ph-stream-ck1")
    try {
      q.processAllAvailable()
      val exp1 = expected(Seq(100L -> "the quick brown anything after"))
      assert(exp1.nonEmpty && exp1.exists(_._3 == 4L),
        s"fixture must rank the double-occurrence doc: $exp1")
      assert(got(Set(100L)) === exp1)

      // CDC refresh through the MAINTAINED positions: doc 4 loses its
      // phrases — the NEXT trigger must stop ranking it
      graft.operators.DedupIndex.appendLexical(
        Seq(4L -> "totally different words now without it")
          .toDF("doc_id", "text"),
        "doc_id", "text", idxDir)
      Seq(200L -> "the quick brown probe two")
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$qDir/b2")
      q.processAllAvailable()
      val after = got(Set(200L))
      assert(after === expected(Seq(200L -> "the quick brown probe two")))
      assert(!after.exists(_._3 == 4L),
        s"refreshed-away phrase still ranks: $after")
      assert(after.exists(_._3 == 0L), "surviving phrase doc must rank")

      // lost checkpoint: replayed batches rewrite their own partitions
      // against the CURRENT index — no stacking, no resurrection
      val q2 = start("ph-stream-ck2")
      try q2.processAllAvailable() finally q2.stop()
      assert(got(Set(100L)) ===
        expected(Seq(100L -> "the quick brown anything after")),
        "replayed batch must re-probe the live positions, unduplicated")
      assert(!got(Set(100L, 200L)).exists(_._3 == 4L))
    } finally q.stop()
  }

  test("streaming proximity search serves the positions per micro-batch, sees CDC retires, replays clean") {
    import java.nio.file.Files
    graft.plans.CachedPlans.clear()
    val idxDir = Files.createTempDirectory("px-stream-idx").toString
    val qDir = Files.createTempDirectory("px-stream-q").toString
    val outDir = Files.createTempDirectory("px-stream-out").toString
    // doc 0 exact phrase, doc 1 one-word gap (in slop), doc 2 in-order
    // but out of slop, doc 4 two stretched occurrences
    val pdocs = Seq(
      0L -> "the quick brown fox jumps",
      1L -> "the quick xx brown fox",
      2L -> "the quick xx yy zz brown fox",
      4L -> "the xx quick yy brown and the quick zz brown")
    graft.operators.DedupIndex.writeLexical(
      pdocs.toDF("doc_id", "text"), "doc_id", "text", idxDir,
      termNgram = 2)
    Seq(100L -> "the quick brown anything after")
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$qDir/b1")
    val schema = spark.read.parquet(s"$qDir/b1").schema
    def queryStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$qDir/b*/")
    def start(ck: String) = graft.streaming.CdcStream
      .startProximitySearch(queryStream, "doc_id", "text", idxDir,
        outDir, Files.createTempDirectory(ck).toString, slop = 2)
    val cols = Seq("q_id", "rank", "doc_id", "prox_freq")
    def got(qIds: Set[Long]) = spark.read.parquet(outDir)
      .filter($"q_id".isin(qIds.toSeq: _*))
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    def expected(queries: Seq[(Long, String)]) = graft.operators.Retrieval
      .proximityTopKIndexed(
        graft.operators.DedupIndex.loadLexical(spark, idxDir),
        queries.toDF("doc_id", "text"), "doc_id", "text", slop = 2)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val q = start("px-stream-ck1")
    try {
      q.processAllAvailable()
      val exp1 = expected(Seq(100L -> "the quick brown anything after"))
      assert(exp1.exists(_._3 == 1L),
        s"fixture must rank the in-slop stretched match: $exp1")
      assert(exp1.exists(_._3 == 4L) && !exp1.exists(_._3 == 2L),
        s"slop=2 must admit doc 4 and reject doc 2: $exp1")
      assert(got(Set(100L)) === exp1)

      // CDC RETIRE through the maintained positions: the top stretched
      // doc is deleted mid-stream — the NEXT trigger must stop ranking
      // it without any rebuild
      graft.operators.DedupIndex.retireLexical(
        Seq(4L).toDF("doc_id"), "doc_id", idxDir)
      Seq(200L -> "the quick brown probe two")
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$qDir/b2")
      q.processAllAvailable()
      val after = got(Set(200L))
      assert(after === expected(Seq(200L -> "the quick brown probe two")))
      assert(!after.exists(_._3 == 4L),
        s"retired doc still ranks in the proximity probe: $after")
      assert(after.exists(_._3 == 1L), "surviving in-slop doc must rank")

      // lost checkpoint: replayed batches rewrite their own partitions
      // against the CURRENT (post-retire) index — no stacking, no
      // resurrection of the retired doc
      val q2 = start("px-stream-ck2")
      try q2.processAllAvailable() finally q2.stop()
      assert(got(Set(100L)) ===
        expected(Seq(100L -> "the quick brown anything after")),
        "replayed batch must re-probe the live positions, unduplicated")
      assert(!got(Set(100L, 200L)).exists(_._3 == 4L))
    } finally q.stop()
  }

  test("streaming hybrid search fuses both persisted indexes per micro-batch, batch-equal") {
    import java.nio.file.Files
    val dim = 8
    // deterministic non-degenerate vectors (norms > 0, pairwise distinct)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(d => (((seed * 7 + d * 3) % 11) - 5).toFloat)
    val docs = corpus.toDF("doc_id", "text")
    val vecs = corpus.map { case (id, _) => (id, vec(id.toInt)) }
      .toDF("vec_id", "embedding")
    val lexDir = Files.createTempDirectory("hyb-lex").toString
    val vecDir = Files.createTempDirectory("hyb-vec").toString
    graft.operators.DedupIndex.writeLexical(
      docs, "doc_id", "text", lexDir, termNgram = 2)
    graft.operators.DedupIndex.writeVectors(
      vecs, "vec_id", "embedding", vecDir, planes = 2, dim = dim)

    // batch 1: an in-corpus query (self must drop from BOTH legs);
    // batch 2: an in-corpus query plus a FOREIGN query (id 10 — dense
    // leg still ranks corpus neighbors, lexical leg matches on bigrams)
    val q1 = Seq((0L, "apple banana cherry", vec(0)))
    val q2 = Seq((2L, "apple banana xx yy zz", vec(2)),
      (10L, "apple banana qq ww", vec(10)))
    val qDir = Files.createTempDirectory("hyb-q").toString
    q1.toDF("doc_id", "text", "embedding")
      .coalesce(1).write.parquet(s"$qDir/b1")
    q2.toDF("doc_id", "text", "embedding")
      .coalesce(1).write.parquet(s"$qDir/b2")
    val schema = spark.read.parquet(s"$qDir/b1").schema
    val outDir = Files.createTempDirectory("hyb-out").toString
    val q = graft.streaming.CdcStream.startHybridSearch(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$qDir/b*/"),
      "doc_id", "text", "embedding", lexDir, vecDir, outDir,
      Files.createTempDirectory("hyb-ck").toString, k = 3, legK = 3)
    try q.processAllAvailable() finally q.stop()

    // batch reference: the same legs over ALL queries in one pass —
    // per-query independence makes micro-batch boundaries invisible.
    // The dense leg is the INDEX-SERVED IVF∘SQ8 probe (stored
    // centroids + inverted code lists), matching the stream's
    // scale-safe leg — never a scan of the stored vectors.
    val allQ = (q1 ++ q2).toDF("doc_id", "text", "embedding")
    val lexIdx = graft.operators.DedupIndex.loadLexical(spark, lexDir)
    val vecIdx = graft.operators.DedupIndex.loadVectors(spark, vecDir)
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    val lex = graft.operators.Retrieval
      .bm25TopKIndexed(lexIdx, allQ, "doc_id", "text", 3, 8)
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(lexW))
      .select(col("q_id"), col("doc_id"), col("rank"))
    val den = graft.operators.Similarity.ivfSq8TopKIndexed(
        allQ, "doc_id", "embedding", vecIdx, 3, nprobe = 3)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    val expected = graft.operators.Retrieval.rrfFuse(Seq(lex, den), 3)
      .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    def got = spark.read.parquet(outDir)
      .select("q_id", "rank", "doc_id", "n_lists", "rrf_score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty)
    assert(got === expected)
    assert(got.map(_._1).distinct.sorted === Seq(0L, 2L, 10L))
    assert(!got.exists(r => r._1 === r._3), "self must not be retrieved")

    // checkpoint-lost replay: dynamic partition overwrite rewrites
    // each batch's own partition instead of duplicating
    val qr = graft.streaming.CdcStream.startHybridSearch(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$qDir/b*/"),
      "doc_id", "text", "embedding", lexDir, vecDir, outDir,
      Files.createTempDirectory("hyb-ck2").toString, k = 3, legK = 3)
    try qr.processAllAvailable() finally qr.stop()
    assert(got === expected, "replayed batches must not duplicate")
  }

  test("ivfTopKMulti slices are bit-identical to ivfTopK at each nprobe") {
    graft.plans.CachedPlans.clear()
    val sf = "/root/testdata/sf0.001"
    val emb = graft.queries.Tables.tbl(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") % 101 === 0)
    val multi = graft.operators.Similarity.ivfTopKMulti(
      emb, queries, "vec_id", "embedding", 10, numCentroids = 20,
      nprobes = Seq(1, 2, 3))
    for (np <- 1 to 3) {
      val slice = multi.filter(col("nprobe") === np)
        .select("q_id", "n_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect().toSeq.sorted
      val single = graft.operators.Similarity.ivfTopK(
          emb, queries, "vec_id", "embedding", 10, numCentroids = 20,
          nprobe = np)
        .select("q_id", "n_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect().toSeq.sorted
      assert(slice.nonEmpty && slice === single,
        s"multi slice diverged from ivfTopK at nprobe=$np")
    }
  }

  test("declared hybrid recall gate: counts bounded, overlap monotone-ish, self-consistent") {
    val out = graft.queries.RetrievalQueries
      .hybridRecall(spark, "/root/testdata/sf0.001")
      .select("nprobe", "n_queries", "n_brute", "n_ivf", "overlap",
        "displ_sum")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out.map(_._1) === Seq(1, 2, 3))
    out.foreach { case (np, nq, nb, ni, ov, ds) =>
      assert(nq > 0 && nb > 0 && ni > 0, s"vacuous at nprobe=$np")
      assert(ov <= math.min(nb, ni), s"overlap exceeds list sizes at $np")
      assert(ds >= 0)
      // every fused list is capped at HybridK per query
      assert(nb <= nq * graft.queries.RetrievalQueries.HybridK)
      assert(ni <= nq * graft.queries.RetrievalQueries.HybridK)
    }
    // brute-side stats are nprobe-independent by construction
    assert(out.map(o => (o._2, o._3)).distinct.size === 1)
  }

  test("lsh recall report: exact-dup bucket has recall 1.0, counts bounded") {
    // identical pair (J=1.0 -> bucket 10, sigs identical -> always hit),
    // a partial-overlap pair, and unrelated filler
    val shared = (1 to 12).map(i => s"a$i").mkString(" ")
    val partialA = (1 to 12).map(i => s"c$i").mkString(" ")
    val partialB = ((1 to 10).map(i => s"c$i") ++ Seq("d11", "d12")).mkString(" ")
    val docs = (Seq(
      1L -> shared, 2L -> shared,
      3L -> partialA, 4L -> partialB) ++
      (10L to 29L).map(i => i -> (1 to 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = graft.operators.Dedup
      .lshRecallReport(docs, "doc_id", "text")
      .select("j_bucket", "n_true", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byBucket = rep.map(r => r._1 -> r).toMap
    // identical docs: common=10 shingles, union=10 -> bucket 10
    assert(byBucket(10L)._2 >= 1L && byBucket(10L)._4 === 1.0)
    // partial pair: common=8 3-shingles of union 12 -> (8*10) div 12 = 6
    assert(byBucket.contains(6L))
    assert(rep.forall { case (b, nt, nh, r) =>
      b >= 3 && b <= 10 && nh <= nt && r >= 0.0 && r <= 1.0 })
  }

  test("declared lsh recall query is sane on testdata") {
    val rep = graft.queries.DedupQueries
      .lshRecall(spark, "/root/testdata/sf0.001")
      .select("j_bucket", "n_true", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rep.nonEmpty)
    assert(rep.forall { case (b, nt, nh, _) => nh <= nt && b >= 3 })
    rep.find(_._1 === 10L).foreach { case (_, _, _, r) =>
      assert(r === 1.0, "identical shingle sets must always be candidates")
    }
  }
}
