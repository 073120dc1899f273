package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(0, n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => ($"id" % 17 + d).cast("float")).as("embedding"))

  test("centroid count is bounded regardless of corpus size") {
    assert(Similarity.selectCentroids(corpus(1000), "vec_id", 20).count() === 20)
    assert(Similarity.selectCentroids(corpus(20000), "vec_id", 20).count() === 20)
    // deterministic: same corpus → identical selection
    val a = Similarity.selectCentroids(corpus(5000), "vec_id", 10)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val b = Similarity.selectCentroids(corpus(5000), "vec_id", 10)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("planesFor holds bucket occupancy as the corpus grows") {
    import graft.operators.Similarity.planesFor
    // occupancy n / 2^planes stays within ~2x of the target
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val p = planesFor(n, targetBucket = 256)
      val occupancy = n.toDouble / math.pow(2, p)
      assert(occupancy <= 256.0 && occupancy >= 64.0,
        s"n=$n planes=$p occupancy=$occupancy")
    }
    assert(planesFor(10, 256) === 1)    // tiny corpus floors at 1
    assert(planesFor(Long.MaxValue, 1) === 30) // cap
  }

  test("auto near-dup pairing derives planes from the corpus size") {
    import graft.operators.Similarity
    val c = corpus(1000)
      .select($"vec_id", transform($"embedding", x => x / lit(20f)).as("embedding"))
    val auto = Similarity.cosineNearDupPairsAuto(c, "vec_id", "embedding",
      threshold = 0.99, dim = 8, targetBucket = 64)
    val manual = Similarity.cosineNearDupPairs(c, "vec_id", "embedding",
      threshold = 0.99, planes = Similarity.planesFor(1000, 64), dim = 8)
    assert(auto.collect().toSet === manual.collect().toSet)
  }

  test("dot normalizes array<double> inputs instead of misreading them") {
    import graft.functions.VectorFunctions
    val df = Seq((Array(1.0d, 2.0d), Array(3.0d, 4.0d))).toDF("a", "b")
    val v = df.select(VectorFunctions.dot($"a", $"b").as("d")).head().getDouble(0)
    assert(v === 11.0)
    // un-castable inputs fail analysis instead of computing garbage
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(VectorFunctions.dot($"a", $"b")).head()
    }
  }

  test("binaryCode packs sign bits little-endian into one long") {
    import graft.operators.Similarity.binaryCode
    // signs (+,-,+,0,-,+) → bits 0,2,5 set (a zero coordinate is NOT
    // positive, so it contributes no bit)
    val df = Seq(Array(1f, -2f, 3f, 0f, -0.5f, 7f)).toDF("v")
    val code = df.select(binaryCode($"v", 6).as("c")).head().getLong(0)
    assert(code === ((1L << 0) | (1L << 2) | (1L << 5)))
    // full-width dim=64: all-positive sets every bit
    val all = Seq(Array.fill(64)(1f)).toDF("v")
      .select(binaryCode($"v", 64).as("c")).head().getLong(0)
    assert(all === -1L)
    intercept[IllegalArgumentException] {
      binaryCode($"v", 65)
    }
  }

  test("binaryTopK with cand covering the corpus reproduces brute force") {
    val c = corpus(60)
    val q = c.filter($"vec_id" < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    // with the candidate cut wider than the corpus, the Hamming
    // pre-filter drops nothing and the exact re-rank IS brute force
    val bin = Similarity.binaryTopK(c, q, "vec_id", "embedding",
      k = 5, cand = 100, dim = 8)
    val brute = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
    assert(rows(bin) === rows(brute))
    // a tight cut still yields k ranked rows per query with hamming
    // non-decreasing inside the candidate stage's cut
    val tight = Similarity.binaryTopK(c, q, "vec_id", "embedding",
      k = 3, cand = 10, dim = 8)
    val byQ = tight.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L) && byQ.values.forall(_ === 3L))
  }

  test("ivfTopK returns k ranked neighbors per query") {
    val c = corpus(500)
    val out = Similarity.ivfTopK(c, c.filter($"vec_id" < 3), "vec_id",
      "embedding", k = 4, numCentroids = 8, nprobe = 2)
    val byQ = out.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.keySet === Set(0L, 1L, 2L) && byQ.values.forall(_ === 4L))
  }

  test("semantic dedup keeps the lowest id per in-cluster duplicate set") {
    // two well-separated clusters; in-cluster vectors are mutual
    // near-dups (cosine ≈ 1), cross-cluster cosine is negative
    def vec(cluster: Int, j: Int): Array[Float] = Array.tabulate(8)(
      d => (if (cluster == 0) 10f else -10f) + ((j + d) % 3) * 0.01f)
    val emb = Seq(0L -> vec(0, 0), 1L -> vec(0, 1), 2L -> vec(0, 2),
      10L -> vec(1, 0), 11L -> vec(1, 1))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, numCentroids = 2)
      .select("id", "canonical_id", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // whatever the two hash-chosen centroids are, assignment lands each
    // vector with its own cluster (cross-cluster cosine < 0 < 0.9), so
    // exactly the two lowest ids survive
    assert(out === Seq((0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("indexed semantic dedup reproduces the recompute verdicts from stored lists") {
    def vec(cluster: Int, j: Int): Array[Float] = Array.tabulate(8)(
      d => (if (cluster == 0) 10f else -10f) + ((j + d) % 3) * 0.01f)
    val emb = Seq(0L -> vec(0, 0), 1L -> vec(0, 1), 2L -> vec(0, 2),
      10L -> vec(1, 0), 11L -> vec(1, 1))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sem-idx").toString
    graft.operators.DedupIndex.writeVectors(emb, "vec_id", "embedding",
      dir, planes = 2, dim = 8, numCentroids = 2)
    val idx = graft.operators.DedupIndex.loadVectors(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cluster_id", "canonical_id", "keep")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val got = rows(Similarity.semanticDedupIndexed(idx, threshold = 0.9))
    val want = rows(Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.9, numCentroids = 2))
    assert(got === want)
    assert(got.map(r => (r._1, r._3, r._4)) === Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("incremental cosine probe pairs existing against new only") {
    // vectors 0..9 similar to each other, 100..104 a distant cluster
    val pts = ((0 until 10).map(i => (i.toLong,
        Array.tabulate(8)(d => 100f + i + d))) ++
      (100 until 105).map(i => (i.toLong,
        Array.tabulate(8)(d => -100f - (i - 100) - d))))
    val all = pts.toDF("vec_id", "embedding")
    val got = Similarity.incrementalCosineNearDups(
        all.filter($"vec_id" % 2 === 1), all.filter($"vec_id" % 2 === 0),
        "vec_id", "embedding", threshold = 0.9, planes = 2, dim = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    // a is always existing (even), b always new (odd); the similar
    // even×even pairs (e.g. 0,2) must never appear
    assert(got.forall { case (a, b) => a % 2 == 0 && b % 2 == 1 }, got)
    // near-identical neighbors in the same cluster do collide
    assert(got.contains((0L, 1L)) || got.contains((2L, 1L)), got)
  }

  test("sq8 codes are uint8-bounded with per-dim reconstruction error ≤ scale/2") {
    val c = corpus(200)
    val dim = 8
    val ranges = Similarity.sq8Ranges(c, "embedding", dim)
    val mins = ranges.map(_._1)
    val scales = ranges.map(r => (r._2 - r._1) / 255.0)
    val rows = c.select($"vec_id",
        $"embedding",
        Similarity.sq8Encode($"embedding", mins, scales).as("codes"))
      .collect()
    rows.foreach { r =>
      val vec = r.getSeq[Float](r.fieldIndex("embedding"))
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      codes.foreach(code => assert(code >= 0 && code <= 255))
      vec.indices.foreach { d =>
        val recon = mins(d) + codes(d) * scales(d)
        val bound = math.max(scales(d) / 2.0, 1e-9) * (1 + 1e-9)
        assert(math.abs(recon - vec(d)) <= bound,
          s"dim $d: |${recon} - ${vec(d)}| > ${bound}")
      }
    }
  }

  test("sq8 encoding is total over vectors outside the training range") {
    // the incremental pattern: NEW vectors encoded against STORED corpus
    // ranges can fall outside (min, max) — codes must clamp to [0, 255],
    // not silently break the uint8 bound
    val mins = Seq(0.0, 0.0)
    val scales = Seq(1.0 / 255.0, 1.0 / 255.0) // trained on [0, 1]
    val out = Seq((1L, Array(-5.0f, 9.0f)), (2L, Array(0.5f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id",
        Similarity.sq8Encode($"embedding", mins, scales).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) === Seq(0, 255), "out-of-range must clamp")
    assert(out(2L) === Seq(128, 255), "in-range codes unchanged by clamp")
  }

  test("ivf×sq8 top-k prunes to probed lists and agrees with brute force on clusters") {
    val pts = (0 until 20).map(i => (i.toLong,
      Array.tabulate(8)(d => (if (i < 10) 1000f else -1000f) + i + d)))
    val c = pts.toDF("vec_id", "embedding")
    val q = c.filter($"vec_id" === 0 || $"vec_id" === 15)
    val got = Similarity.ivfSq8TopK(c, q, "vec_id", "embedding",
        k = 3, numCentroids = 4, nprobe = 2, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    // same-cluster neighbor wins: quantization noise and list pruning
    // cannot flip the far-apart cluster decision
    assert(got.keySet === Set(0L, 15L))
    assert(got(0L) < 10L && got(15L) >= 10L)
    // deterministic across runs
    val again = Similarity.ivfSq8TopK(c, q, "vec_id", "embedding",
        k = 3, numCentroids = 4, nprobe = 2, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    assert(got === again)
  }

  test("sq8 top-k agrees with brute force on well-separated clusters") {
    // two tight clusters far apart: quantization noise cannot flip the
    // nearest-cluster decision, so sq8's top hit matches exact search
    val pts = (0 until 20).map(i => (i.toLong,
      Array.tabulate(8)(d => (if (i < 10) 1000f else -1000f) + i + d)))
    val c = pts.toDF("vec_id", "embedding")
    val q = c.filter($"vec_id" === 0 || $"vec_id" === 15)
    val sq = Similarity.sq8TopK(c, q, "vec_id", "embedding", k = 3, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 3)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    // same-cluster neighbor wins under both scorings
    assert(sq.keySet === Set(0L, 15L))
    assert(sq(0L) < 10L && sq(15L) >= 10L)
    assert(exact(0L) < 10L && exact(15L) >= 10L)
    // deterministic across runs
    val again = Similarity.sq8TopK(c, q, "vec_id", "embedding", k = 3, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    assert(sq === again)
  }

  test("Sq8DotF matches the interpreted HOF fold bit-for-bit") {
    import graft.functions.VectorFunctions
    val mins = Seq(0.5, -1.25, 2.0, 0.0)
    val scales = Seq(0.01, 0.5, 0.0, 1.5)
    val df = Seq(
      (1L, Seq(0, 255, 17, 3), Seq(1.5f, -2.25f, 3.125f, 0.5f)),
      (2L, Seq(7, 1, 0, 200), Seq(-0.125f, 0.0f, 9.5f, -3.75f)),
      (3L, Seq(128, 64, 32, 16), Seq(1e-7f, -1e7f, 0.333f, 2.5f)))
      .toDF("id", "codes", "q")
    val minA = array(mins.map(lit(_)): _*)
    val scaleA = array(scales.map(lit(_)): _*)
    val hof = aggregate(
      transform(col("codes"), (code, i) =>
        element_at(col("q"), i + 1).cast("double") *
          (element_at(minA, i + 1) +
            code.cast("double") * element_at(scaleA, i + 1))),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      VectorFunctions.sq8Dot(col("codes"), col("q"), mins, scales)
        .as("fast"), hof.as("slow"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, slow) =>
      assert(java.lang.Double.doubleToRawLongBits(fast) ===
        java.lang.Double.doubleToRawLongBits(slow))
    }
    // mismatched code/query lengths poison to NULL like the fold
    val bad = Seq((1L, Seq(1, 2, 3), Seq(1f, 2f))).toDF("id", "codes", "q")
    assert(bad.select(VectorFunctions.sq8Dot(col("codes"), col("q"),
      mins, scales)).head().isNullAt(0))
  }

  test("pq codes are bounded, deterministic, and reconstruct to codebook rows") {
    val dim = 8
    val c = corpus(100)
    val cbs = Similarity.pqCodebooks(c, "vec_id", "embedding",
      m = 4, ksub = 8, dim = dim)
    assert(cbs.size === 4 && cbs.forall(_.size === 8) &&
      cbs.forall(_.forall(_.size === 2)))
    val rows = c.select($"vec_id",
        Similarity.pqEncode($"embedding", cbs).as("codes"),
        Similarity.pqRecon(
          Similarity.pqEncode($"embedding", cbs), cbs).as("recon"))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.size === 4)
      codes.foreach(cd => assert(cd >= 0 && cd < 8))
      // the reconstruction is EXACTLY the selected codebook entries
      val recon = r.getSeq[Double](2)
      val want = codes.zipWithIndex.flatMap { case (cd, s) => cbs(s)(cd) }
      assert(recon === want)
    }
    // deterministic: re-derived codebooks and codes match
    val cbs2 = Similarity.pqCodebooks(c, "vec_id", "embedding",
      m = 4, ksub = 8, dim = dim)
    assert(cbs === cbs2)
  }

  test("pq encode picks the closest codebook entry per subspace") {
    // hand-built codebooks: subspace entries at known positions
    val cbs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
      Seq(Seq(5.0, 5.0), Seq(-5.0, -5.0)))
    val df = Seq(
      (1L, Array(9f, 9f, -4f, -6f)),  // near entry 1 then entry 1
      (2L, Array(1f, -1f, 4f, 6f)))   // near entry 0 then entry 0
      .toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        Similarity.pqEncode($"embedding", cbs).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) === Seq(1, 1))
    assert(got(2L) === Seq(0, 0))
  }

  test("pq top-k agrees with brute force on well-separated clusters") {
    val pts = (0 until 20).map(i => (i.toLong,
      Array.tabulate(8)(d => (if (i < 10) 1000f else -1000f) + i + d)))
    val c = pts.toDF("vec_id", "embedding")
    val q = c.filter($"vec_id" === 0 || $"vec_id" === 15)
    val pq = Similarity.pqTopK(c, q, "vec_id", "embedding", k = 3,
        m = 4, ksub = 8, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    // codebook donors span both clusters, so the far-apart cluster
    // decision survives quantization
    assert(pq.keySet === Set(0L, 15L))
    assert(pq(0L) < 10L && pq(15L) >= 10L)
    val ivfPq = Similarity.ivfPqTopK(c, q, "vec_id", "embedding", k = 3,
        numCentroids = 4, nprobe = 2, m = 4, ksub = 8, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    assert(ivfPq.keySet === Set(0L, 15L))
    assert(ivfPq(0L) < 10L && ivfPq(15L) >= 10L)
    // deterministic across runs
    val again = Similarity.pqTopK(c, q, "vec_id", "embedding", k = 3,
        m = 4, ksub = 8, dim = 8)
      .filter($"rank" === 1).select("q_id", "n_id")
      .as[(Long, Long)].collect().toMap
    assert(pq === again)
  }

  test("refined PQ codebooks converge on the member means") {
    // two tight clusters; refined entries must land ON the cluster
    // means (within 2^-20 quantization), donors only near them
    val pts = (0 until 40).map(i => (i.toLong,
      Array.tabulate(4)(d => (if (i < 20) 100f else -100f) + (i % 5) * 0.1f + d)))
    val c = pts.toDF("vec_id", "embedding")
    val refined = Similarity.pqCodebooksRefined(c, "vec_id", "embedding",
      m = 2, ksub = 2, dim = 4)
    assert(refined.size === 2 && refined.forall(_.size === 2))
    // every refined entry is a mean of member points (or a donor), so
    // each component stays inside its cluster's value range:
    // [100, 103.4] or [-100, -96.6]
    refined.flatten.flatten.foreach { v =>
      assert((v >= -100.5 && v <= -96.5) || (v >= 99.5 && v <= 103.5), v)
    }
    // refinement is deterministic
    assert(refined === Similarity.pqCodebooksRefined(c, "vec_id",
      "embedding", m = 2, ksub = 2, dim = 4))
  }

  test("persisted-IVF top-k is bit-identical to the recompute form") {
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (if (i % 10 < 5) 10f else -10f) + ((i * 7 + d * 3) % 5) * 0.1f)
    val corpus = (0L until 60L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 6)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      dir, planes = 2, dim = dim, numCentroids = 10)
    val idx = graft.operators.DedupIndex.loadVectors(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
        .toSeq
    val got = rows(Similarity.ivfSq8TopKIndexed(queries, "vec_id",
      "embedding", idx, k = 3, nprobe = 2))
    val want = rows(Similarity.ivfSq8TopK(corpus, queries, "vec_id",
      "embedding", k = 3, numCentroids = 10, nprobe = 2, dim = dim))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("persisted-PQ top-k is bit-identical to the refined recompute form") {
    val dim = 8
    val corpus = this.corpus(80)
    val queries = corpus.filter($"vec_id" < 3)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      dir, planes = 2, dim = dim, numCentroids = 10)
    val idx = graft.operators.DedupIndex.loadVectors(spark, dir)
    assert(idx.params.pqM === 8 && idx.params.pqKsub === 16)
    assert(idx.pqCodebooks.size === 8 &&
      idx.pqCodebooks.head.size === 16 &&
      idx.pqCodebooks.head.head.size === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
    val got = rows(Similarity.pqTopKIndexed(queries, "vec_id",
      "embedding", idx, k = 3))
    val want = rows(Similarity.pqRefinedTopK(corpus, queries, "vec_id",
      "embedding", k = 3, m = 8, ksub = 16, dim = dim))
    assert(got === want)
    assert(got.nonEmpty)
    // the probe's scan reads (id, pqcodes) — never floats or SQ8 bytes
    val scans = Similarity.pqTopKIndexed(queries, "vec_id", "embedding",
        idx, k = 3)
      .queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
      .filter(_.contains(dir.split("/").last))
    assert(scans.exists(l => l.contains("pqcodes") &&
      !l.contains("vec:") && !l.contains("rnorm")),
      s"PQ probe must scan only (id, pqcodes):\n${scans.mkString("\n")}")
  }

  test("indexed binary top-k is bit-identical to recompute and scans only codes") {
    val dim = 8
    val corpus = this.corpus(80)
    val queries = corpus.filter($"vec_id" < 3)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bin-idx").toString
    graft.operators.DedupIndex.writeVectors(corpus, "vec_id", "embedding",
      dir, planes = 2, dim = dim, numCentroids = 10)
    val idx = graft.operators.DedupIndex.loadVectors(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rank", "hamming", "score")
        .as[(Long, Long, Int, Int, Double)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
    val got = rows(Similarity.binaryTopKIndexed(queries, "vec_id",
      "embedding", idx, k = 4, cand = 12))
    val want = rows(Similarity.binaryTopK(corpus, queries, "vec_id",
      "embedding", k = 4, cand = 12, dim = dim))
    assert(got === want)
    assert(got.nonEmpty)
    // the Hamming stage's scan of the buckets table must prune down to
    // (id, bcode) — dragging floats or SQ8 payload through the
    // pre-filter forfeits the 16-bytes-per-row point of the stage
    val hamScans = Similarity.binaryTopKIndexed(queries, "vec_id",
        "embedding", idx, k = 4, cand = 12)
      .queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
      .filter(_.contains(dir.split("/").last))
    assert(hamScans.exists(l => l.contains("bcode") &&
      !l.contains("vec:") && !l.contains("codes") && !l.contains("rnorm")),
      s"Hamming stage must scan only (id, bcode):\n${hamScans.mkString("\n")}")
  }

  test("jlTopK degenerates to brute force when cand covers the corpus") {
    // with every corpus row surviving stage 1, the exact re-rank IS the
    // brute ranking — the two-stage plumbing must not perturb it
    val emb = graft.queries.Tables.tbl(spark, "/root/testdata/sf0.001",
      "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val jl = graft.operators.Similarity
      .jlTopK(emb, q, "vec_id", "embedding", k = 10, cand = n + 1,
        rdim = 16, dim = 64)
      .select("q_id", "n_id", "rank").sort("q_id", "rank")
      .collect().toSeq
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      .select("q_id", "n_id", "rank").sort("q_id", "rank")
      .collect().toSeq
    assert(jl === brute)
  }

  test("ANN recall gate: pinned recall@k per method on the sf0.001 corpus") {
    // every approximate method is deterministic, so recall against the
    // brute baseline is a CONSTANT of (code, corpus) — pin it exactly.
    // A centroid/bucket/quantization regression that silently lowers
    // recall fails here even though each method's own oracle (which
    // replays the same approximation) would still match.
    val got = graft.queries.SimilarityQueries
      .annRecallReport(spark, "/root/testdata/sf0.001")
      .select("method", "hits", "possible")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("binary", 35L, 50L),
      ("ivf", 19L, 50L),
      ("ivf_pq", 5L, 50L),
      ("ivf_refined", 20L, 50L),
      ("ivf_sq8", 19L, 50L),
      ("jl", 20L, 50L),
      ("lsh", 4L, 50L),
      ("pq", 6L, 50L),
      ("pq_refined", 6L, 50L),
      ("sq8", 50L, 50L)))

    // the hash-SAMPLED form (the 100×-feasible estimator) is equally
    // deterministic: pin its counts too, and its declared sample size
    val sampled = graft.queries.SimilarityQueries
      .annRecallReportSampled(spark, "/root/testdata/sf0.001")
      .select("method", "hits", "possible", "n_queries")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(sampled === Seq(
      ("binary", 120L, 165L, 33L),
      ("ivf", 66L, 165L, 33L),
      ("ivf_pq", 20L, 165L, 33L),
      ("ivf_refined", 72L, 165L, 33L),
      ("ivf_sq8", 66L, 165L, 33L),
      ("jl", 77L, 165L, 33L),
      ("lsh", 21L, 165L, 33L),
      ("pq", 29L, 165L, 33L),
      ("pq_refined", 33L, 165L, 33L),
      ("sq8", 161L, 165L, 33L)))
    // the estimate tracks the exhaustive gate: every method's sampled
    // recall lands within 0.15 of its exhaustive recall
    val ex = got.map { case (m, h, p) => m -> h.toDouble / p }.toMap
    sampled.foreach { case (m, h, p, _) =>
      assert(math.abs(h.toDouble / p - ex(m)) <= 0.15,
        s"$m sampled recall ${h.toDouble / p} vs exhaustive ${ex(m)}")
    }
  }

  test("semantic decontamination: flagged + clean partition the corpus, gate non-vacuous") {
    val sf = "/root/testdata/sf0.001"
    val report = graft.queries.SimilarityQueries
      .semanticDecontaminationReport(spark, sf)
    val flagged = report.select(col("doc_id"))
      .as[Long].collect().toSet
    assert(flagged.nonEmpty, "no semantic contamination on testdata — " +
      "the clean query would pass vacuously")
    assert(flagged.forall(_ % 7 != 0), "an eval doc got flagged as corpus")
    val clean = graft.queries.SimilarityQueries
      .semanticDecontaminationClean(spark, sf)
      .select(col("doc_id")).as[Long].collect().toSet
    val corpus = graft.queries.Tables.tbl(spark, sf, "documents")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert((clean intersect flagged).isEmpty,
      "a flagged doc survived cleaning")
    assert((clean union flagged) === corpus,
      "clean + flagged must partition the training corpus")
    // every report row is a genuine >= threshold aggregate
    val bad = report.filter(col("n_hits") < 1 || col("top_score") < 0.35)
    assert(bad.isEmpty, "report carries a sub-threshold row")
  }

  test("sq8 saturation gate: build cohort never clamps, refreshed cohort does") {
    val m = graft.queries.SimilarityQueries
      .sq8SaturationReport(spark, "/root/testdata/sf0.001")
      .select("cohort", "n_clamped").as[(String, Long)].collect().toMap
    assert(m("build") === 0L,
      "ranges trained on the build cohort cannot clamp it")
    assert(m("refreshed") > 0L,
      "the negated refresh slice must escape the trained range — " +
        "a zero here means the gate is vacuous")
  }
}
