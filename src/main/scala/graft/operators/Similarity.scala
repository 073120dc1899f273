package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Embedding similarity search over `array<float>` columns.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set against
  *    the full corpus; cost O(corpus × queries). The correctness baseline.
  *  - `lshTopK`: random-hyperplane LSH — corpus and queries are bucketed
  *    by an 8-bit sign signature; candidates come only from the query's
  *    bucket. At 100 TB the bucket join is a plain shuffle join on a
  *    low-cardinality key; the brute-force cross product never happens.
  *
  * Hyperplanes are DERIVED FROM md5 (component sign = high bit of a hex
  * digit of md5("plane:dim")), so any engine — or an external oracle —
  * regenerates the identical planes; no RNG state is shipped anywhere.
  * All dot products are sequential double folds (VectorFunctions), making
  * scores bit-reproducible across engines.
  */
object Similarity {

  /** Deterministic ±1 sign matrix: signs(p)(i) for plane p, dimension i. */
  def hyperplaneSigns(planes: Int, dim: Int): Seq[Seq[Int]] = {
    val mdm = MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        val h = mdm.digest(s"$p:$i".getBytes(StandardCharsets.UTF_8))
        if ((h(0) & 0x80) != 0) 1 else -1
      }
    }
  }

  /** Bit-string LSH bucket for a vector column given the sign matrix.
    * Projections go through the codegen'd dot expression; ±1 signs are
    * exact in float, so results match the lambda-fold form bit-for-bit.
    */
  def lshBucket(vec: Column, signs: Seq[Seq[Int]]): Column = {
    val bitChars = signs.map { s =>
      val sArr = array(s.map(v => lit(v.toFloat)): _*)
      val proj = VectorFunctions.dot(vec, sArr)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitChars: _*)
  }

  /** Exact top-k cosine neighbors of each query vector (self excluded).
    * Output: q_id, n_id, score — deterministic (score desc, n_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Same output shape as bruteForceTopK; recall trades against the
    * number of planes (8 planes ⇒ 256 buckets ⇒ ~1/256 of the corpus
    * scanned per query).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val signs = hyperplaneSigns(planes, dim)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"),
      lshBucket(col(vecCol), signs).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"),
      lshBucket(col(vecCol), signs).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Johnson–Lindenstrauss random projection of a float vector onto
    * `signs.length` dimensions: component p = ⟨signs(p), v⟩ (the
    * Achlioptas ±1 construction — database-friendly: no gaussians, the
    * projection is `rdim` sign-dots through the same codegen expression
    * LSH bucketing uses, and the md5-derived matrix regenerates
    * identically in any engine). Unlike [[lshBucket]] the projection
    * VALUES are kept (array<double>), not just their signs — distances
    * survive approximately (the JL lemma), so the reduced space ranks
    * candidates where a bucket only gates them.
    */
  def jlProject(vec: Column, signs: Seq[Seq[Int]]): Column =
    array(signs.map { s =>
      VectorFunctions.dot(vec, array(s.map(v => lit(v.toFloat)): _*))
    }: _*)

  /** Random-projection two-stage top-k: stage 1 ranks candidates by
    * cosine IN THE REDUCED SPACE (`rdim` doubles per row instead of
    * `dim` floats — at rdim=16/dim=64 the candidate pass ships half the
    * bytes and runs a 4×-shorter fold per pair), keeping `cand` per
    * query; stage 2 re-ranks survivors by exact full-space cosine. The
    * tenth method family: where [[binaryTopK]] quantizes to 1 bit/dim
    * and [[sq8TopK]] to 8 bits/dim, JL REDUCES DIMENSIONS and keeps
    * full precision per kept dimension. Reduced dots use the portable
    * double fold (`dotFold` — the reduced components are doubles;
    * casting them to float would diverge from any external
    * recomputation). Output: bruteForceTopK shape + the stage-1
    * `rscore`.
    */
  def jlTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cand: Int, rdim: Int, dim: Int): DataFrame = {
    require(rdim > 0 && rdim < dim,
      s"JL projection must reduce: 0 < rdim=$rdim < dim=$dim")
    val signs = hyperplaneSigns(rdim, dim)
    def reduced(v: Column) = jlProject(v, signs)
    // reduced-space dots via the codegen'd double expression (dotD ==
    // dotFold bit-for-bit over doubles): the stage-1 dot runs per
    // CANDIDATE PAIR, where the interpreted HOF lambda was the dominant
    // per-pair term
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"),
      reduced(col(vecCol)).as("n_red"))
      .withColumn("n_rnorm", VectorFunctions.dotD(col("n_red"), col("n_red")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"),
      reduced(col(vecCol)).as("q_red"))
      .withColumn("q_rnorm", VectorFunctions.dotD(col("q_red"), col("q_red")))
    // stage 1 shuffles only (q_id, n_id, rscore) into the candidate cut
    val red = c.select(col("n_id"), col("n_red"), col("n_rnorm"))
      .crossJoin(broadcast(q.select(col("q_id"), col("q_red"),
        col("q_rnorm"))))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), VectorFunctions.cosineFrom(
        VectorFunctions.dotD(col("n_red"), col("q_red")),
        col("n_rnorm"), col("q_rnorm")).as("rscore"))
    val wCand = Window.partitionBy(col("q_id"))
      .orderBy(col("rscore").desc, col("n_id"))
    val candRows = red.withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= cand)
      .select("q_id", "n_id", "rscore")
    // stage 2 fetches full floats for the Q×cand survivors alone
    val scored = c.select(col("n_id"), col("n_vec"), col("n_norm"))
      .join(broadcast(candRows), Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_vec"), col("q_norm"))),
        Seq("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "rscore", "score")
  }

  /** Sign-bit binary code: bit i set iff vec[i] > 0, packed into one
    * LONG (dim ≤ 64). The 1-bit-per-dimension quantization of
    * Charikar-style sign hashing — a 64-dim float vector (256 B) becomes
    * 8 B, so the candidate-generation pass streams 32× less data than a
    * float scan and compares codes with one xor+popcount. Exact integer
    * arithmetic end-to-end (distinct powers of two cannot carry), so any
    * engine derives the identical code from the same vector.
    */
  def binaryCode(vec: Column, dim: Int): Column = {
    require(dim > 0 && dim <= 64,
      s"binaryCode packs into one long, dim <= 64, got $dim")
    // native codegen packer (plans.BinaryCodeF): same distinct-powers
    // integer sum as the HOF fold it replaces (which ran interpreted
    // per row), bit-identical codes
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.plans.BinaryCodeF(
      ColumnBridge.expression(vec.cast("array<float>"))))
  }

  /** Binary-quantized top-k: Hamming distance over packed sign codes
    * selects `cand` candidates per query (ties by n_id), which are then
    * re-ranked by exact cosine. The classic two-stage binary pre-filter:
    * stage 1 touches only an 8-byte code per corpus row (at 100 TB a
    * persisted code column is a ~32× smaller scan than the floats, and
    * the broadcast query side keeps it a map-shaped pass into a keyed
    * top-cand window); stage 2's float math runs on cand×|queries| rows
    * only. The Hamming distances are exact integers, so the candidate
    * cut is engine-identical; the re-rank is the usual sequential-fold
    * cosine. Output shape matches bruteForceTopK plus the stage-1
    * `hamming` distance.
    */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cand: Int, dim: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"),
      binaryCode(col(vecCol), dim).as("n_code"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"),
      binaryCode(col(vecCol), dim).as("q_code"))
    // stage 1 shuffles ONLY (q_id, n_id, hamming) through the
    // candidate window — the floats would multiply the shuffle payload
    // ~25× for rows the cut is about to discard
    val ham = c.select(col("n_id"), col("n_code"))
      .crossJoin(broadcast(q.select(col("q_id"), col("q_code"))))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        bit_count(col("n_code").bitwiseXOR(col("q_code"))).as("hamming"))
    val wCand = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming"), col("n_id"))
    val candRows = ham.withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= cand)
      .select("q_id", "n_id", "hamming")
    // stage 2 fetches floats for the Q×cand survivors alone
    val scored = c.select(col("n_id"), col("n_vec"), col("n_norm"))
      .join(broadcast(candRows), Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_vec"), col("q_norm"))),
        Seq("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "hamming", "score")
  }

  /** [[binaryTopK]] probing the persisted vector index instead of
    * recomputing corpus codes: stage 1 scans ONLY the index's
    * `(id, bcode)` columns — 16 bytes per corpus row against 260+ for
    * the float vectors, so at 100 TB the Hamming pass reads ~6% of the
    * bytes — and selects `cand` candidates per query through the
    * bounded-buffer [[graft.functions.TopKAggregator]] (map-side
    * partial top-k: at most `cand` skinny rows per query per map task
    * cross the shuffle, vs the recompute form's full N×Q window sort).
    * Stage 2 fetches floats for the Q×cand survivors alone (broadcast
    * candidate join back into the bucketed table) and re-ranks by exact
    * cosine. Bit-identical to [[binaryTopK]] over the indexed corpus:
    * stored codes/norms are the same exact integers / IEEE folds the
    * recompute derives from the floats, and the aggregator's tie-break
    * (hamming asc, id asc) replays the window's.
    */
  def binaryTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
      idx: DedupIndex.VectorIndex, k: Int, cand: Int): DataFrame = {
    require(idx.params.dim <= 64,
      s"binary probe needs dim <= 64 sign bits, index has ${idx.params.dim}")
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"),
      binaryCode(col(vecCol), idx.params.dim).as("q_code"))
    val ham = idx.buckets.select(col("id").as("n_id"), col("bcode"))
      .crossJoin(broadcast(q.select(col("q_id"), col("q_code"))))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        bit_count(col("bcode").bitwiseXOR(col("q_code")))
          .cast("int").as("hamming"))
    val topCand = new graft.functions.TopKAggregator(cand).toColumn
    val candRows = ham.as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapValues(t => (-t._3.toDouble, t._2))
      .agg(topCand.name("top"))
      .flatMap { case (qid, top) => top.map(p => (qid, p._2, (-p._1).toInt)) }
      .toDF("q_id", "n_id", "hamming")
    val scored = idx.buckets
      .select(col("id").as("n_id"), col("vec").as("n_vec"),
        col("norm").as("n_norm"))
      .join(broadcast(candRows), Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_vec"), col("q_norm"))),
        Seq("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "hamming", "score")
  }

  /** [[jlTopK]] probing the persisted vector index: stage 1 scans ONLY
    * the index's `(id, rvec, rnormjl)` columns — jlRdim doubles per
    * corpus row instead of dim floats, with the projection itself
    * amortized into the index write — and selects `cand` candidates per
    * query through the bounded-buffer [[graft.functions.TopKAggregator]]
    * (map-side partial top-k, at most `cand` skinny rows per query per
    * map task across the shuffle). Stage 2 fetches floats for the
    * survivors and re-ranks by exact cosine. Bit-identical to
    * [[jlTopK]] over the indexed corpus: stored projections are the same
    * IEEE folds the recompute derives, and the aggregator's tie-break
    * (rscore desc, id asc) replays the window's.
    */
  def jlTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
      idx: DedupIndex.VectorIndex, k: Int, cand: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val jlSigns = hyperplaneSigns(idx.params.jlRdim, idx.params.dim)
    val qRed = jlProject(col(vecCol), jlSigns)
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"),
      qRed.as("q_red"),
      VectorFunctions.dotD(qRed, qRed).as("q_rnorm"))
    // a zero-norm vector makes cosineFrom NULL; the window form ranks
    // those NULLS LAST (desc ordering) with the same n_id tie-break, so
    // coalescing to -inf inside the aggregator — where a nullable Double
    // would otherwise NPE decoding into the primitive tuple — replays
    // the exact same candidate cut; the sentinel turns back into NULL
    // after the flatMap (finite inputs can never fold to -inf)
    val red = idx.buckets
      .select(col("id").as("n_id"), col("rvec"), col("rnormjl"))
      .crossJoin(broadcast(q.select(col("q_id"), col("q_red"),
        col("q_rnorm"))))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), coalesce(VectorFunctions.cosineFrom(
        VectorFunctions.dotD(col("rvec"), col("q_red")),
        col("rnormjl"), col("q_rnorm")),
        lit(Double.NegativeInfinity)).as("rscore"))
    val topCand = new graft.functions.TopKAggregator(cand).toColumn
    val candRows = red.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._3, t._2))
      .agg(topCand.name("top"))
      .flatMap { case (qid, top) => top.map(p => (qid, p._2, p._1)) }
      .toDF("q_id", "n_id", "rscore")
      .withColumn("rscore",
        when(col("rscore") === lit(Double.NegativeInfinity),
          lit(null).cast("double")).otherwise(col("rscore")))
    val scored = idx.buckets
      .select(col("id").as("n_id"), col("vec").as("n_vec"),
        col("norm").as("n_norm"))
      .join(broadcast(candRows), Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_vec"), col("q_norm"))),
        Seq("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "rscore", "score")
  }

  /** IVF-style approximate top-k: an inverted file over deterministic
    * centroids — the `numCentroids` corpus vectors that sort first by
    * md5(id). Hash order is a uniform pseudo-random sample, reproducible
    * in any engine, and BOUNDED: the broadcast centroid set is O(C) no
    * matter how large the corpus grows (an id-predicate subset would
    * scale linearly with data and eventually kill the driver). Every
    * vector joins its nearest centroid's list; a query probes its
    * `nprobe` closest lists only.
    *
    * At 100 TB: centroid selection is a distributed top-C (per-partition
    * heads merged on the driver), the assignment pass is one broadcast
    * join over the C centroids, the inverted lists are just a `cent_id`
    * column to shuffle-partition by, and each query touches ~nprobe/C of
    * the corpus. Complements `lshTopK` (bit-signature buckets) with the
    * list-probing trade-off real IVF indexes make.
    */
  /** Nearest-centroid assignment as a map-side argmax over a PRIMITIVE
    * key: `c` is (n_id, n_vec, n_norm), `cent` must carry (cent_idx,
    * cent_vec, cent_norm) with cent_idx dense in [0, 1024); returns
    * (n_id, cent_idx).
    *
    * The key packs (score, centroid) into ONE order-preserving BIGINT:
    *   floor(score * 2^52) * 1024 + (1023 - cent_idx)
    * Scaling by 2^52 is exact (power of two — only the exponent moves),
    * floor is exact, and |score| <= 1 keeps the product inside int64, so
    * the encoding is deterministic and identical in any engine; max()
    * picks the best quantized score with ties to the LOWEST centroid
    * index. Quantization at 2^-52 equals double-precision ULP at
    * |score| ~ 1, and the oracles mirror the same encoding, so both
    * engines agree bit-for-bit. Null scores (zero-norm vectors) coalesce
    * below every real key and still assign deterministically.
    *
    * Primitive key = the aggregation stays in whole-stage-codegen
    * HashAggregate (an argmax via min_by/max_by carries a struct buffer,
    * forcing interpreted SortAggregate — the trap the reducer's max_by
    * variant documents). The broadcast nested-loop join expands each
    * corpus row into C candidates, but the projection keeps only
    * (n_id, key): the map-side max collapses C rows to one BEFORE any
    * exchange, so the shuffle moves N skinny rows, not N×C vector
    * payloads.
    */
  private[operators] def nearestCentIdx(c: DataFrame,
      cent: DataFrame): DataFrame = {
    val pow52 = 4503599627370496.0 // 2^52
    val nullKey = -4503599627370497L // < floor(-1 * 2^52)
    val candKey = (coalesce(
      floor(col("cent_score") * lit(pow52)), lit(nullKey)) * lit(1024L)
      + (lit(1023L) - col("cent_idx"))).as("_ck")
    c.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("cent_vec")),
        col("n_norm"), col("cent_norm")))
      .select(col("n_id"), candKey)
      .groupBy(col("n_id"))
      .agg(max(col("_ck")).as("_ck"))
      .select(col("n_id"),
        (lit(1023L) - pmod(col("_ck"), lit(1024L))).as("cent_idx"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int, nprobe: Int)
      : DataFrame = {
    require(numCentroids > 0, s"numCentroids must be > 0, got $numCentroids")
    require(numCentroids <= 1024,
      s"numCentroids must be <= 1024 (dense index packs into 10 bits), " +
        s"got $numCentroids")
    // dense 0-based centroid index in cent_id order: the set is O(C) and
    // broadcast, so the single-partition ranking window is trivial
    val cent = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    // assignment = nearestCentIdx's map-side argmax (see its scaladoc for
    // the shuffle/codegen contract); re-attach the winning centroid id
    // (broadcast, O(C)) and the vector payload (one corpus-sized hash
    // join — the same single corpus exchange the aggregate itself would
    // otherwise have carried)
    val assigned = nearestCentIdx(c, cent)
      .join(broadcast(cent.select(col("cent_idx").cast("long").as("cent_idx"),
        col("cent_id"))), Seq("cent_idx"))
      .join(c, Seq("n_id"))
      .select(col("n_id"), col("n_vec"), col("n_norm"), col("cent_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cent_id"))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** [[ivfTopK]] evaluated at SEVERAL nprobe settings in one pass — the
    * engine of the hybrid recall gate: the corpus assignment (the
    * expensive argmax) runs ONCE, probes keep their centroid rank
    * `crk` up to max(nprobes), the scored candidate set is persisted
    * once, and each requested nprobe is a filter + per-query rank over
    * that shared set. Per-nprobe results are bit-identical to
    * [[ivfTopK]] at that nprobe (filtering crk after the join selects
    * exactly the candidates its probes would have produced). Emits
    * (nprobe, q_id, n_id, rank, score).
    */
  def ivfTopKMulti(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int, nprobes: Seq[Int])
      : DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ > 0),
      s"nprobes must be positive, got $nprobes")
    require(numCentroids > 0 && numCentroids <= 1024,
      s"numCentroids must be in (0, 1024], got $numCentroids")
    val maxNp = nprobes.max
    val cent = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    val assigned = nearestCentIdx(c, cent)
      .join(broadcast(cent.select(
        col("cent_idx").cast("long").as("cent_idx"), col("cent_id"))),
        Seq("cent_idx"))
      .join(c, Seq("n_id"))
      .select(col("n_id"), col("n_vec"), col("n_norm"), col("cent_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= maxNp)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cent_id"),
        col("crk"))
    val scored = graft.plans.CachedPlans.cached(
      assigned.join(broadcast(probes), Seq("cent_id"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("score", VectorFunctions.cosineFrom(
          VectorFunctions.dot(col("n_vec"), col("q_vec")),
          col("n_norm"), col("q_norm")))
        .select(col("q_id"), col("n_id"), col("crk"), col("score")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    nprobes.map { np =>
      scored.filter(col("crk") <= np)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(lit(np).as("nprobe"), col("q_id"), col("n_id"),
          col("rank"), col("score"))
    }.reduce(_ unionByName _)
  }

  /** IVF with one Lloyd (k-means) refinement round — the real IVF build
    * path: seed centroids are assigned, re-estimated as the mean of
    * their members, and the index is rebuilt over the refined centroids
    * before probing. Tighter cells than raw sampled seeds, same probe
    * economics.
    *
    * Cross-engine-exact mean: each float component is quantized to
    * floor(value * 2^20) (exact power-of-two scaling), summed as LONGS —
    * order-independent, so shuffle/AQE scheduling can't move the result —
    * and the mean is reconstructed with a fixed double-op sequence
    * (sum → /count → /2^20 → float), every step IEEE-deterministic. 2^-20
    * quantization error on centroid COORDINATES only nudges cell
    * boundaries (assignment quality, not correctness), and the long sums
    * hold ~2^43 members per centroid before overflow — far past any real
    * cell.
    *
    * Scale shape per round: one broadcast-NLJ argmax (nearestCentIdx's
    * skinny shuffle), one posexplode → (cent_idx, dim) partial-agg
    * groupBy — C×D result rows, trivially small — and one broadcast
    * rebuild. Empty cells drop out, standard k-means behavior.
    */
  def ivfRefinedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int, nprobe: Int)
      : DataFrame = {
    require(numCentroids > 0 && numCentroids <= 1024,
      s"numCentroids must be in (0, 1024], got $numCentroids")
    val seed = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    val pow20 = 1048576.0 // 2^20
    // Lloyd step: members' component means, exact long arithmetic
    val refined = nearestCentIdx(c, seed)
      .join(c, Seq("n_id"))
      .select(col("cent_idx"), posexplode(col("n_vec")).as(Seq("pos", "v")))
      .select(col("cent_idx"), col("pos"),
        floor(col("v").cast(DoubleType) * lit(pow20)).as("q"))
      .groupBy(col("cent_idx"), col("pos"))
      .agg(sum(col("q")).as("_s"), count(lit(1)).as("_n"))
      .select(col("cent_idx"), col("pos"),
        (col("_s").cast(DoubleType) / col("_n").cast(DoubleType) / lit(pow20))
          .cast("float").as("m"))
      .groupBy(col("cent_idx"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cent_vec"))
      .select(col("cent_idx").cast("long").as("cent_idx"), col("cent_vec"),
        VectorFunctions.normSq(col("cent_vec")).as("cent_norm"))
    // rebuild the index over refined centroids; centroid identity is now
    // the dense index (refined cells have no source vector id)
    val assigned = nearestCentIdx(c, refined)
      .join(c, Seq("n_id"))
      .select(col("n_id"), col("n_vec"), col("n_norm"), col("cent_idx"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_idx"))
    val probes = q.crossJoin(broadcast(refined))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_norm"), col("cent_idx"))
    val scored = assigned.join(broadcast(probes), Seq("cent_idx"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("n_vec"), col("q_vec")),
        col("n_norm"), col("q_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Plane count that holds expected LSH bucket occupancy at
    * `targetBucket` as the corpus grows: planes ≈ log2(n / targetBucket).
    * Within-bucket pairing is ~occupancy², so FIXING planes while n grows
    * reverts toward all-pairs; deriving it keeps the near-dup join
    * linear-ish. Capped at 30 (past that, signature length — not bucket
    * count — is the tool).
    */
  def planesFor(corpusSize: Long, targetBucket: Int = 256): Int = {
    require(targetBucket > 0, s"targetBucket must be > 0, got $targetBucket")
    val ratio = math.max(corpusSize.toDouble / targetBucket, 1.0)
    math.min(math.max(math.ceil(math.log(ratio) / math.log(2)).toInt, 1), 30)
  }

  /** Bounded deterministic centroid sample: the `n` rows sorting first by
    * md5(id) — a uniform hash-order sample any engine reproduces.
    * Physically a TakeOrdered (per-partition top-n, merged once), never a
    * full sort.
    */
  def selectCentroids(corpus: DataFrame, idCol: String, n: Int): DataFrame =
    corpus.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)

  /** Dense 0-based renumber of the centroid set in `cent_id` order,
    * done ON THE DRIVER: the input is ≤1024 rows by the callers'
    * `require`, so collecting is a bounded-broadcast-sized transfer and
    * the result comes back as a LocalRelation — no single-partition
    * window, no Exchange, and no "No Partition Defined … serious
    * performance degradation" WARN noise burying a real
    * unpartitioned-window regression in the logs. (A `partitionBy(
    * lit(0))` window does NOT silence it: Catalyst folds the literal
    * key out and WindowExec still sees an empty partition spec.)
    */
  /** Memoized per (centroid plan, input snapshot): the collect EXECUTES
    * the bounded TakeOrdered over the corpus, and every construction of
    * every ivf* recompute query re-paid that job before its own work —
    * a pure per-execution fixed cost (the r20 verdict's c8-beats-c32
    * diagnosis); the renumbered LocalRelation is a pure function of the
    * centroid plan + its input files.
    */
  private[graft] def withCentIdx0(cent: DataFrame): DataFrame =
    graft.plans.CachedPlans.memoValue("cent_idx0", cent) {
      val spark = cent.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        cent.schema.fields :+ org.apache.spark.sql.types.StructField(
          "cent_idx", org.apache.spark.sql.types.IntegerType,
          nullable = false))
      val rows = cent.orderBy(col("cent_id")).collect()
      val renumbered: Seq[org.apache.spark.sql.Row] =
        rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(renumbered.asJava, schema)
    }

  /** `cosineNearDupPairs` with the plane count DERIVED from the corpus
    * size (one count job + planesFor) — the production entry point, so
    * bucket occupancy holds as data grows. The fixed-planes form below
    * exists for the oracle-pinned declared queries (the oracle inlines
    * the sign matrix, which must not depend on row counts).
    */
  def cosineNearDupPairsAuto(corpus: DataFrame, idCol: String,
      vecCol: String, threshold: Double, dim: Int,
      targetBucket: Int = 256): DataFrame = {
    val planes = planesFor(corpus.count(), targetBucket)
    cosineNearDupPairs(corpus, idCol, vecCol, threshold, planes, dim)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-blocked
    * (pairs must share a bucket — the all-pairs product never
    * materializes).
    *
    * `planes` must grow with the corpus: within-bucket pairing is
    * ~N²/2^planes, so hold bucket occupancy constant with
    * planes ≈ log2(N) - log2(target bucket size) (use
    * `cosineNearDupPairsAuto` / `planesFor`). The declared test query
    * uses 2 planes for recall at test scale only.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int, dim: Int): DataFrame = {
    val signs = hyperplaneSigns(planes, dim)
    val side = corpus.select(col(idCol), col(vecCol),
      VectorFunctions.normSq(col(vecCol)).as("norm"),
      lshBucket(col(vecCol), signs).as("bucket"))
    val a = side.select(col("bucket"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"), col("norm").as("a_norm"))
    val b = side.select(col("bucket"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"), col("norm").as("b_norm"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("a_vec"), col("b_vec")),
        col("a_norm"), col("b_norm")))
      .filter(col("score") >= threshold)
      // no distinct needed: each vector lives in exactly ONE bucket (a
      // single signature string), so the self-join emits each unordered
      // pair at most once — a distinct would re-shuffle the result
      .select("a_id", "b_id", "score")
  }

  /** Incremental embedding near-dup probe: pairs are EXISTING × NEW
    * bucket collisions only — the embedding twin of
    * `Dedup.incrementalMinHashNearDupsReport`. The existing side's
    * buckets are in a real deployment the stored LSH index; the probe
    * joins the (small) new batch against it without ever re-pairing
    * existing×existing. Output: (a_id existing, b_id new, score ≥
    * threshold). Id spaces must be disjoint.
    */
  def incrementalCosineNearDups(newVecs: DataFrame, existing: DataFrame,
      idCol: String, vecCol: String, threshold: Double, planes: Int,
      dim: Int): DataFrame = {
    val signs = hyperplaneSigns(planes, dim)
    def side(df: DataFrame, prefix: String) = df.select(
      lshBucket(col(vecCol), signs).as("bucket"),
      col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec"),
      VectorFunctions.normSq(col(vecCol)).as(s"${prefix}_norm"))
    side(existing, "a").join(side(newVecs, "b"), Seq("bucket"))
      // disjoint-id contract backstop: overlapping id spaces must not
      // produce score=1 self-pairs
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("a_vec"), col("b_vec")),
        col("a_norm"), col("b_norm")))
      .filter(col("score") >= threshold)
      .select("a_id", "b_id", "score")
  }

  /** Index-backed form of [[incrementalCosineNearDups]]: the corpus side
    * is the PERSISTED LSH-bucket table ([[DedupIndex.writeVectors]]) —
    * vectors, buckets and squared norms read directly, nothing
    * recomputed, and the parquet bucketing on the LSH bucket key means
    * the probe join shuffles only the new batch. Hyperplane signs are
    * re-derived from the index's stored (planes, dim) so the probe can't
    * bucket with a different geometry than the index. Pairs are
    * bit-identical to the recompute form (same signs, same stored
    * vectors, same norm expression evaluated at write time).
    */
  def incrementalCosineNearDupsIndexed(newVecs: DataFrame, idCol: String,
      vecCol: String, idx: DedupIndex.VectorIndex,
      threshold: Double): DataFrame = {
    val signs = hyperplaneSigns(idx.params.planes, idx.params.dim)
    val a = idx.buckets.select(col("bucket"), col("id").as("a_id"),
      col("vec").as("a_vec"), col("norm").as("a_norm"))
    val b = newVecs.select(lshBucket(col(vecCol), signs).as("bucket"),
      col(idCol).as("b_id"), col(vecCol).as("b_vec"),
      VectorFunctions.normSq(col(vecCol)).as("b_norm"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("a_vec"), col("b_vec")),
        col("a_norm"), col("b_norm")))
      .filter(col("score") >= threshold)
      .select("a_id", "b_id", "score")
  }

  /** SemDeDup-style semantic deduplication (public construction from
    * Abbas et al. 2023, arXiv:2303.09540): cluster embeddings by
    * nearest deterministic centroid, then WITHIN each cluster mark
    * every vector that has a lower-id cluster-mate at cosine ≥
    * `threshold` as a semantic duplicate of the SMALLEST such mate.
    * One verdict row per vector: (id, cluster_id, canonical_id, keep).
    * The rule is deliberately local (cluster-scoped, not transitively
    * closed) — that is SemDeDup's trade: near-duplicate semantics
    * at Σ_c n_c² pair cost instead of brute-force n².
    *
    * Scale shape: the corpus-sized work is the assignment argmax
    * ([[nearestCentIdx]]'s skinny map-side-collapsed shuffle) plus ONE
    * self-join shuffled on the cluster key; C grows with the corpus
    * (≤1024 here, the argmax packing bound) to hold n_c ≈ n/C flat, so
    * pair work stays n²/C. Deterministic end to end — hash-ordered
    * centroids, packed-argmax assignment, IEEE-fold cosines — so the
    * whole verdict table is oracle-exact, not heuristically checked.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numCentroids: Int): DataFrame = {
    require(numCentroids > 0 && numCentroids <= 1024,
      s"numCentroids must be in (0, 1024], got $numCentroids")
    val cent = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    // three consumers (both self-join sides + the verdict join): cache
    // so the corpus-sized assignment argmax runs once, not three times
    val assigned = graft.plans.CachedPlans.cached(
      nearestCentIdx(c, cent)
        .join(c, Seq("n_id"))
        .join(broadcast(cent.select(col("cent_idx"), col("cent_id"))),
          Seq("cent_idx"))
        .select(col("cent_id").as("cluster_id"), col("n_id"),
          col("n_vec"), col("n_norm")))
    semanticVerdictsFrom(assigned, threshold)
  }

  /** [[semanticDedup]] with the cluster assignment read from the
    * persisted index's inverted lists instead of recomputed: the
    * corpus-sized nearest-centroid argmax (N·C dots) is amortized into
    * the one-time index build; the probe joins (cent_id, n_id) against
    * the stored floats and runs the identical within-cluster pruning.
    * Bit-identical verdicts — the stored list assignment came from the
    * same argmax under the same stored centroid floats, and the exact
    * cosine runs on the same stored vectors/norms.
    */
  def semanticDedupIndexed(idx: DedupIndex.VectorIndex,
      threshold: Double): DataFrame = {
    val assigned = graft.plans.CachedPlans.cached(
      idx.lists.select(col("cent_id").as("cluster_id"), col("n_id"))
        .join(idx.buckets.select(col("id").as("n_id"),
          col("vec").as("n_vec"), col("norm").as("n_norm")), Seq("n_id")))
    semanticVerdictsFrom(assigned, threshold)
  }

  /** The SemDeDup verdict half over an assignment of (cluster_id, n_id,
    * n_vec, n_norm): within-cluster pairwise cosine, collapse onto the
    * lowest qualifying id, one verdict row per vector.
    */
  private def semanticVerdictsFrom(assigned: DataFrame,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("cluster_id").as("ci"),
      col("n_id").as("a_id"), col("n_vec").as("a_vec"),
      col("n_norm").as("a_norm"))
    val b = assigned.select(col("cluster_id").as("ci"),
      col("n_id").as("b_id"), col("n_vec").as("b_vec"),
      col("n_norm").as("b_norm"))
    val dups = a.join(b, Seq("ci"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("a_vec"), col("b_vec")),
        col("a_norm"), col("b_norm")))
      .filter(col("score") >= threshold)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
    assigned.select(col("n_id"), col("cluster_id"))
      .join(dups, col("n_id") === col("b_id"), "left")
      .select(col("n_id").as("id"), col("cluster_id"),
        coalesce(col("dup_of"), col("n_id")).as("canonical_id"),
        col("dup_of").isNull.as("keep"))
  }

  // -------------------------------------------- int8 scalar quantization

  /** Per-dimension (min, max) over the corpus — the SQ8 training step.
    *
    * Shape: posexplode is a NARROW transform; the groupBy on `pos` (≤dim
    * distinct keys) partial-aggregates map-side, so each partition ships
    * at most `dim` (min,max) rows into the final shuffle regardless of
    * corpus size — O(partitions × dim) network, 100 TB-safe. The collect
    * is bounded at `dim` rows (same bounded-broadcast contract as the
    * IVF centroid set).
    */
  def sq8Ranges(corpus: DataFrame, vecCol: String,
      dim: Int): Seq[(Double, Double)] =
    // memoized per (corpus plan, input snapshot, vecCol, dim): the
    // stats pass is corpus-scale and every construction of the sq8
    // recompute queries re-ran it — the values are a pure function of
    // the corpus files
    graft.plans.CachedPlans.memoValue(s"sq8_ranges|$vecCol|$dim", corpus) {
      val rows = corpus
        .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(min(col("v").cast(DoubleType)).as("mn"),
          max(col("v").cast(DoubleType)).as("mx"))
        .collect()
      val byPos = rows.map(r =>
        r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      (0 until dim).map(i => byPos.getOrElse(i, (0.0, 0.0)))
    }

  /** Encode a float vector to uint8 codes against per-dim ranges:
    * `code_d = floor((v_d - min_d) / scale_d + 0.5)` clamped to
    * `[0, 255]`, with `scale_d = (max_d - min_d) / 255` (constant dims →
    * code 0). The clamp makes the encoder total over vectors OUTSIDE the
    * training range — the incremental pattern (encode a new batch against
    * stored corpus ranges) would otherwise silently emit codes < 0 or
    * > 255 and break the uint8 bound. All arithmetic in double with an
    * explicit floor(x + 0.5) — not a platform `round` — so any engine
    * reproduces the codes bit-exactly.
    */
  /** Pre-clamp raw SQ8 quantization index per component:
    * `floor((v - min) / scale + 0.5)` (0 where the dimension is
    * degenerate). This is the ONE definition of the encoder's rounding
    * — [[sq8Encode]] clamps it into [0, 255], and the saturation gate
    * (`embed_sq8_saturation`) counts where the clamp actually bites,
    * so the diagnostic can never drift from what the encoder does.
    */
  def sq8RawIndex(vec: Column, mins: Seq[Double],
      scales: Seq[Double]): Column = {
    val minA = array(mins.map(lit(_)): _*)
    val scaleA = array(scales.map(lit(_)): _*)
    transform(vec, (v, i) =>
      when(element_at(scaleA, i + 1) === 0.0, lit(0.0))
        .otherwise(floor(
          (v.cast(DoubleType) - element_at(minA, i + 1)) /
            element_at(scaleA, i + 1) + lit(0.5))))
  }

  def sq8Encode(vec: Column, mins: Seq[Double],
      scales: Seq[Double]): Column = {
    // native codegen encoder (plans.Sq8EncodeF): identical rounding +
    // cast-then-clamp sequence as the HOF form (two nested interpreted
    // transforms with per-element literal-array element_at), codes
    // bit-identical; sq8RawIndex stays the rounding's single SOURCE
    // definition for the saturation diagnostic
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.plans.Sq8EncodeF(
      ColumnBridge.expression(vec.cast("array<float>")),
      ColumnBridge.expression(
        array(mins.map(lit(_)): _*).cast("array<double>")),
      ColumnBridge.expression(
        array(scales.map(lit(_)): _*).cast("array<double>"))))
  }

  /** [[ivfSq8TopK]] probing the PERSISTED IVF structure
    * ([[DedupIndex.writeVectors]]'s `centroids/` + `lists/` components)
    * instead of recomputing centroid selection and corpus assignment per
    * run: centroids are a stored O(C) broadcast, the inverted lists are
    * a bucketed scan of (cent_id, n_id, codes) — ¼-footprint payload,
    * assignment amortized into the index write, only the probed lists'
    * candidate rows ever shuffle (through the final top-k window).
    * Bit-identical to [[ivfSq8TopK]] over the same corpus: same stored
    * assignment argmax, same frozen ranges, same asymmetric fold — so
    * the recompute form's oracle gates this one too.
    */
  def ivfSq8TopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
      idx: DedupIndex.VectorIndex, k: Int, nprobe: Int): DataFrame = {
    val mins = idx.ranges.map(_._1)
    val scales = idx.ranges.map(r => (r._2 - r._1) / 255.0)
    val cent = idx.centroids
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cent_id"))
    val scored = idx.lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score",
        VectorFunctions.sq8Dot(col("codes"), col("q_vec"), mins, scales))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Reconstruction of SQ8 codes as a DOUBLE array
    * (`min_d + code_d · scale_d`) — the asymmetric-scoring payload.
    * Kept in double end-to-end (no float round trip) so reconstruction
    * folds are bit-reproducible across engines.
    */
  def sq8Recon(codes: Column, mins: Seq[Double],
      scales: Seq[Double]): Column = {
    val minA = array(mins.map(lit(_)): _*)
    val scaleA = array(scales.map(lit(_)): _*)
    transform(codes, (c, i) =>
      element_at(minA, i + 1) +
        c.cast(DoubleType) * element_at(scaleA, i + 1))
  }

  /** [[incrementalCosineNearDupsIndexed]] scoring asymmetrically from
    * the index's STORED SQ8 codes instead of its float vectors: the
    * corpus side of the probe reads (bucket, id, codes, rnorm) — ¼ the
    * vector payload — and candidates score as full-precision batch
    * vector against code reconstruction under the index's frozen
    * ranges, cosine-normalized by the STORED reconstruction norm. Same
    * bucket-join shape as the exact indexed probe (corpus side bucketed,
    * only the batch shuffles); scores carry SQ8's per-dim ≤ scale_d/2
    * reconstruction error, which is the deal a 100 TB corpus takes to
    * cache 4× more index per executor.
    */
  def incrementalCosineNearDupsSq8Indexed(newVecs: DataFrame,
      idCol: String, vecCol: String, idx: DedupIndex.VectorIndex,
      threshold: Double): DataFrame = {
    val signs = hyperplaneSigns(idx.params.planes, idx.params.dim)
    val mins = idx.ranges.map(_._1)
    val scales = idx.ranges.map(r => (r._2 - r._1) / 255.0)
    val a = idx.buckets.select(col("bucket"), col("id").as("a_id"),
      col("codes").as("a_codes"), col("rnorm").as("a_norm"))
    val b = newVecs.select(lshBucket(col(vecCol), signs).as("bucket"),
      col(idCol).as("b_id"), col(vecCol).as("b_vec"),
      VectorFunctions.normSq(col(vecCol)).as("b_norm"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") =!= col("b_id"))
      // Sq8DotF computes q_i·recon_i where the fold form computed
      // recon_i·q_i — IEEE multiplication is commutative bit-exactly,
      // so scores (and the oracle) are unchanged
      .withColumn("score", VectorFunctions.cosineFrom(
        VectorFunctions.sq8Dot(col("a_codes"), col("b_vec"), mins, scales),
        col("a_norm"), col("b_norm")))
      .filter(col("score") >= threshold)
      .select("a_id", "b_id", "score")
  }

  /** Approximate top-k by asymmetric distance: full-precision query
    * against the uint8-quantized corpus (`score = Σ q_d · (min_d +
    * code_d · scale_d)`, a left double fold — bit-reproducible).
    *
    * This is the memory lever for 100 TB ANN: codes are dim bytes per
    * vector vs 4·dim for floats — the corpus side scans/caches at ¼ the
    * footprint, and the ranges are a 2·dim-value broadcast. Quantization
    * error is bounded per dim by scale_d/2. Composes with the pruning
    * levers ([[ivfTopK]] inverted lists / [[lshTopK]] buckets) — this
    * form scans all codes, pruning is deliberately orthogonal.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int): DataFrame = {
    val ranges = sq8Ranges(corpus, vecCol, dim)
    val mins = ranges.map(_._1)
    val scales = ranges.map(r => (r._2 - r._1) / 255.0)
    val c = corpus.select(col(idCol).as("n_id"),
      sq8Encode(col(vecCol), mins, scales).as("codes"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score",
        VectorFunctions.sq8Dot(col("codes"), col("q_vec"), mins, scales))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** IVF × SQ8: quantized codes INSIDE the inverted lists — the
    * memory-and-pruning composition a 100 TB ANN deployment actually
    * runs. Assignment and list probing use FULL-PRECISION centroids
    * (cell boundaries must not move with quantization); the stored lists
    * hold uint8 codes (¼ the float footprint), and probed candidates are
    * scored asymmetrically — full-precision query against code
    * reconstruction, the same bit-reproducible fold as [[sq8TopK]]. Each
    * query therefore touches ~nprobe/C of the corpus AND reads ¼ the
    * bytes per touched vector; versus [[sq8TopK]]'s full scan, only the
    * probed lists are scored.
    *
    * Same bounded-broadcast contract as [[ivfTopK]] (O(C) centroids,
    * dim-bounded SQ8 ranges); quantization error is bounded per dim by
    * scale_d/2 exactly as in [[sq8TopK]], on top of IVF's list-recall
    * trade-off.
    */
  // -------------------------------------------- product quantization

  /** PQ codebooks from a bounded deterministic donor sample: the `ksub`
    * corpus rows sorting first by md5(id) (the same hash-order sample
    * [[selectCentroids]] uses) are collected — O(ksub · dim) driver
    * transfer, corpus-size-independent — sorted by id, and sliced into
    * `m` per-subspace codebooks. `codebooks(s)(j)` is donor j's
    * sub-vector for subspace s, as DOUBLES (float → double widening is
    * exact, so both engines see identical codebook values).
    *
    * Real PQ trains per-subspace k-means; the hash-ordered donor sample
    * is the same determinism trade [[ivfTopK]] makes for its seed
    * centroids (and one Lloyd round could refine it identically).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && dim % m == 0,
      s"dim ($dim) must divide into m ($m) subspaces")
    require(ksub > 0 && ksub <= 256,
      s"ksub must be in (0, 256] (codes are one byte), got $ksub")
    // memoized per (corpus plan, input snapshot, params): the donor
    // TakeOrdered ran per construction of every pq recompute query
    graft.plans.CachedPlans.memoValue(
      s"pq_codebooks|$idCol|$vecCol|$m|$ksub|$dim", corpus) {
      val subDim = dim / m
      val donors = selectCentroids(corpus, idCol, ksub)
        .select(col(idCol).as("cent_id"),
          col(vecCol).cast("array<double>").as("v"))
        .orderBy(col("cent_id"))
        .collect()
        .map(_.getSeq[Double](1))
      (0 until m).map { s =>
        donors.toSeq.map(v => v.slice(s * subDim, (s + 1) * subDim))
      }
    }
  }

  /** [[pqCodebooks]] with one Lloyd (k-means) refinement round per
    * subspace — the training step real PQ runs: every corpus sub-vector
    * is assigned to its nearest donor entry, each entry is re-estimated
    * as the member mean, and entries with no members keep their donor
    * value (dense code indices must survive). Means use the same
    * cross-engine-exact arithmetic as [[ivfRefinedTopK]]: components
    * quantized to floor(v·2^20) and summed as LONGS (order-independent),
    * then a fixed double-op sequence (sum → /count → /2^20 → float →
    * double), every step IEEE-deterministic.
    *
    * Scale shape: assignment is [[pqEncode]]'s map-side expression (no
    * join — codebooks are literals), the Lloyd step is one explode →
    * (subspace, code, dim) partial-agg groupBy whose result is bounded
    * at m·ksub·subDim rows — collected like [[sq8Ranges]]' dim-bounded
    * stats.
    */
  def pqCodebooksRefined(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, dim: Int): Seq[Seq[Seq[Double]]] =
    // memoized per (corpus plan, input snapshot, params): the Lloyd
    // stats pass is a FULL corpus pqEncode + aggregate, and every
    // construction of ann_pq_refined re-paid it — the dominant term of
    // that query's per-rep cost at sf0.1
    graft.plans.CachedPlans.memoValue(
      s"pq_codebooks_refined|$idCol|$vecCol|$m|$ksub|$dim", corpus) {
      pqCodebooksRefinedRun(corpus, idCol, vecCol, m, ksub, dim)
    }

  private def pqCodebooksRefinedRun(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, ksub: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val cbs0 = pqCodebooks(corpus, idCol, vecCol, m, ksub, dim)
    val subDim = dim / m
    val pow20 = 1048576.0 // 2^20
    val stats = corpus
      .select(col(vecCol).as("v"), pqEncode(col(vecCol), cbs0).as("codes"))
      .select(posexplode(col("codes")).as(Seq("s", "j")), col("v"))
      .select(col("s"), col("j"),
        explode(sequence(lit(0), lit(subDim - 1))).as("i"), col("v"))
      .select(col("s"), col("j"), col("i"),
        floor(element_at(col("v"),
          col("s") * subDim + col("i") + 1).cast(DoubleType) * lit(pow20))
          .as("q"))
      .groupBy(col("s"), col("j"), col("i"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3).toDouble / r.getLong(4).toDouble / pow20)
          .toFloat.toDouble)
      .toMap
    cbs0.zipWithIndex.map { case (cb, s) =>
      cb.zipWithIndex.map { case (donor, j) =>
        if (stats.contains((s, j, 0)))
          (0 until subDim).map(i => stats((s, j, i)))
        else donor
      }
    }
  }

  /** Encode a float vector to `m` PQ codes: per subspace, the 0-based
    * index of the codebook entry with the smallest squared L2 distance
    * to the sub-vector (ties → lowest index, via `array_position`'s
    * first-match). Distances are left double folds of `(v−c)²` from
    * 0.0 — the same sequential-fold contract every score in this file
    * carries — so codes are bit-reproducible in any engine.
    *
    * Storage story: `m` byte-sized codes replace `dim` floats — at
    * (m=8, dim=64) a 32× corpus-side compression vs floats (SQ8 is 4×),
    * the representation web-scale ANN actually holds in memory.
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    // native codegen encoder (plans.PqEncodeF): same per-(s, j) left
    // fold from 0.0 of (double(v_i) − c_i)² and the same first-match
    // argmin as the HOF form it replaces (transform/aggregate/zip_with
    // ran interpreted at m·ksub·subDim lambda evals per row — the PQ
    // family's dominant corpus-side cost), so codes are bit-identical
    val m = codebooks.size
    val ksub = codebooks.head.size
    val flat = codebooks.flatten.flatten
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.plans.PqEncodeF(
      ColumnBridge.expression(vec.cast("array<float>")),
      ColumnBridge.expression(
        array(flat.map(lit(_)): _*).cast("array<double>")),
      m, ksub))
  }

  /** Reconstruction of PQ codes as a dim-length DOUBLE array: the
    * selected codebook entries concatenated in subspace order — the
    * scan-time scratch ADC scoring folds over (never stored; the stored
    * representation stays `m` bytes).
    */
  def pqRecon(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    concat(codebooks.zipWithIndex.map { case (cb, s) =>
      val cbLit = array(cb.map(cj => array(cj.map(lit(_)): _*)): _*)
      element_at(cbLit, element_at(codes, s + 1) + 1)
    }: _*)

  /** Approximate top-k by PQ asymmetric distance: the corpus is `m`
    * codes per vector (32× smaller than floats at m=8/dim=64), each
    * candidate scores as `Σ_d q_d · recon_d` — the full-precision query
    * against the codebook reconstruction, one sequential double fold
    * over all dim components (NOT per-subspace partial sums: a single
    * flat fold is what the oracle replays, and IEEE addition is not
    * associative). Reconstruction is computed once per CORPUS row, not
    * per pair. Like [[sq8TopK]] this scans all codes; [[ivfPqTopK]]
    * adds the pruning.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int, dim: Int): DataFrame =
    pqTopKWith(corpus, queries, idCol, vecCol, k,
      pqCodebooks(corpus, idCol, vecCol, m, ksub, dim))

  /** [[pqTopK]] over Lloyd-refined codebooks
    * ([[pqCodebooksRefined]]) — tighter cells than raw donor samples,
    * same probe economics; the recall lift shows up in
    * `ann_recall_report`.
    */
  def pqRefinedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int, dim: Int): DataFrame =
    pqTopKWith(corpus, queries, idCol, vecCol, k,
      pqCodebooksRefined(corpus, idCol, vecCol, m, ksub, dim))

  /** [[pqRefinedTopK]] served from the persisted index (fmt 5): the
    * scan reads ONLY `(id, pqcodes)` — m bytes of payload per corpus
    * row, a 32× smaller read than the floats at (m=8, dim=64) — and the
    * stored refined codebooks (loaded once, m·ksub·subDim doubles)
    * reconstruct candidates for the asymmetric dot. Training, encoding,
    * and the Lloyd refinement are amortized into the one-time write;
    * absorbs encode under the FROZEN codebooks. Bit-identical to the
    * recompute form: stored codes were produced by the same
    * [[pqEncode]] literals and parquet round-trips doubles exactly.
    */
  def pqTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
      idx: DedupIndex.VectorIndex, k: Int): DataFrame = {
    val cbs = idx.pqCodebooks
    val c = idx.buckets.select(col("id").as("n_id"),
        col("pqcodes").as("pcodes"))
      .withColumn("recon", pqRecon(col("pcodes"), cbs))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // asymmetric dot via the codegen'd double expression: q_vec widens
    // to double per QUERY row (exact, same cast the HOF lambda applied
    // per element), the per-PAIR fold is one tight loop — bit-identical
    // scores, none of the interpreted-lambda per-pair cost
    val scored = c.crossJoin(broadcast(
        q.withColumn("q_vec_d", col("q_vec").cast("array<double>"))))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.dotD(col("q_vec_d"),
        col("recon")))
      .drop("q_vec_d")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  private def pqTopKWith(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cbs: Seq[Seq[Seq[Double]]]): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
      pqEncode(col(vecCol), cbs).as("codes"))
      .withColumn("recon", pqRecon(col("codes"), cbs))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // codegen'd per-pair asymmetric dot, as in pqTopKIndexed
    val scored = c.crossJoin(broadcast(
        q.withColumn("q_vec_d", col("q_vec").cast("array<double>"))))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.dotD(col("q_vec_d"),
        col("recon")))
      .drop("q_vec_d")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** IVF × PQ: the composition production ANN engines ship as "IVF-PQ"
    * — full-precision centroids assign vectors and pick probed lists
    * (cell boundaries independent of quantization, exactly as in
    * [[ivfSq8TopK]]), the inverted lists store `m`-byte PQ codes, and
    * probed candidates score asymmetrically against the codebook
    * reconstruction. Each query touches ~nprobe/C of the corpus at
    * 1/32 the bytes per candidate (m=8/dim=64) — the memory×pruning
    * product that holds a 100 TB corpus's index in cluster RAM.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int, nprobe: Int, m: Int,
      ksub: Int, dim: Int): DataFrame = {
    require(numCentroids > 0 && numCentroids <= 1024,
      s"numCentroids must be in (0, 1024], got $numCentroids")
    val cbs = pqCodebooks(corpus, idCol, vecCol, m, ksub, dim)
    val cent = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    val codes = corpus.select(col(idCol).as("n_id"),
      pqEncode(col(vecCol), cbs).as("codes"))
    val assigned = nearestCentIdx(c, cent)
      .join(broadcast(cent.select(
        col("cent_idx").cast("long").as("cent_idx"), col("cent_id"))),
        Seq("cent_idx"))
      .join(codes, Seq("n_id"))
      .select(col("n_id"), col("cent_id"),
        pqRecon(col("codes"), cbs).as("recon"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"),
        col("q_vec").cast("array<double>").as("q_vec_d"), col("cent_id"))
    // codegen'd per-pair asymmetric dot (see pqTopKWith): query widened
    // to double on the broadcast side, bit-identical scores
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score", VectorFunctions.dotD(col("q_vec_d"),
        col("recon")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int, nprobe: Int,
      dim: Int): DataFrame = {
    require(numCentroids > 0 && numCentroids <= 1024,
      s"numCentroids must be in (0, 1024], got $numCentroids")
    val ranges = sq8Ranges(corpus, vecCol, dim)
    val mins = ranges.map(_._1)
    val scales = ranges.map(r => (r._2 - r._1) / 255.0)
    val cent = withCentIdx0(selectCentroids(corpus, idCol, numCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"),
        VectorFunctions.normSq(col(vecCol)).as("cent_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFunctions.normSq(col(vecCol)).as("n_norm"))
    // the inverted lists store CODES, not vectors: assignment runs on
    // full precision, then the vector payload is dropped for good
    val codes = corpus.select(col(idCol).as("n_id"),
      sq8Encode(col(vecCol), mins, scales).as("codes"))
    val assigned = nearestCentIdx(c, cent)
      .join(broadcast(cent.select(
        col("cent_idx").cast("long").as("cent_idx"), col("cent_id"))),
        Seq("cent_idx"))
      .join(codes, Seq("n_id"))
      .select(col("n_id"), col("codes"), col("cent_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFunctions.normSq(col(vecCol)).as("q_norm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cent_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_score", VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("q_vec"), col("cent_vec")),
        col("q_norm"), col("cent_norm")))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cent_id"))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("score",
        VectorFunctions.sq8Dot(col("codes"), col("q_vec"), mins, scales))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }
}
