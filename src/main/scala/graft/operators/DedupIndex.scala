package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted corpus-side dedup/ANN indexes — the store/load half of the
  * incremental-probe design. The probe operators
  * ([[Dedup.incrementalExact]], [[Dedup.incrementalMinHashNearDupsReport]],
  * [[Similarity.incrementalCosineNearDups]]) verdict a NEW batch against
  * an EXISTING corpus; their recompute forms re-derive the corpus-side
  * tables (distinct content hashes, band keys, shingles, LSH buckets)
  * from corpus TEXT on every run. At 100 TB that means every daily batch
  * pays a full corpus scan + shingle + minhash. This object materializes
  * those tables ONCE as bucketed parquet, so a probe run reads only the
  * index — never corpus text — and the bucket layout feeds the probe
  * joins and aggregations without shuffling the corpus side (the same
  * no-Exchange property ScaleOpsSpec proves for
  * [[ScaleOps.writeBucketed]]).
  *
  * A TEXT index (one directory) holds five bucketed tables plus a params
  * file:
  *   - `hashes/`    (content_hash)            bucketed by content_hash
  *   - `bands/`     (id, band, band_key, bkey) bucketed by bkey — `bkey`
  *     is the SINGLE band-scoped join key `band || '|' || band_key`:
  *     Spark's v1 bucketed-scan join engages only when the join keys
  *     equal the bucket columns exactly (a superset like (band,
  *     band_key) gets "Bucketed: false (disabled by query planner)" and
  *     re-shuffles the corpus side — measured in graft.dev
  *     .IndexJoinProbe), so the composite column is what keeps the probe
  *     join corpus-side-Exchange-free
  *   - `shingles/`  (id, shingle)             bucketed by id
  *   - `counts/`    (id, n_shingles)          bucketed by id
  *   - `sigs/`      (id, sig: array<bigint>)  bucketed by id — the full
  *     MinHash signatures, for consumers that verify by signature
  *     agreement instead of exact Jaccard (the streaming probe)
  * A VECTOR index holds one:
  *   - `buckets/`   (id, bucket, vec, norm)   bucketed by bucket
  * `_params.json` pins the hash/geometry parameters (shingleN, numHashes,
  * bands, portable / planes, dim) so a probe can only run with the SAME
  * functions that built the index — loading validates, probing reuses.
  *
  * Ids are stored as BIGINT (the engine's document/vector id contract).
  * Bucket counts default to the session's shuffle partitioning.
  *
  * Catalog lifecycle: Spark only exposes bucket metadata through the
  * catalog, so [[writeText]]/[[writeVectors]] register each component as
  * an EXTERNAL bucketed table (name derived from the index directory) and
  * the load path re-issues `CREATE TABLE ... CLUSTERED BY ... LOCATION`
  * when the session doesn't know the table yet (fresh session over an
  * existing index — the daily-batch pattern).
  */
object DedupIndex {

  final case class TextParams(shingleN: Int, numHashes: Int, bands: Int,
      portable: Boolean, numBuckets: Int)

  final case class VectorParams(planes: Int, dim: Int, numBuckets: Int)

  /** Loaded text index: every member is a bucketed-table scan. */
  final case class TextIndex(dir: String, params: TextParams,
      hashes: DataFrame, bandKeys: DataFrame, shingles: DataFrame,
      counts: DataFrame, sigs: DataFrame)

  /** Loaded vector index: `buckets` is a bucketed-table scan. */
  final case class VectorIndex(dir: String, params: VectorParams,
      buckets: DataFrame)

  // ------------------------------------------------------------- write

  /** Build and persist the text-dedup index of `corpus` under `dir`
    * (overwriting any previous index there): distinct content hashes for
    * the exact probe, band keys for the LSH probe, hashed shingles +
    * per-doc counts for the Jaccard verify. One corpus scan feeds all
    * four tables (the shingle table is computed once and reused).
    */
  def writeText(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4,
      portable: Boolean = true, numBuckets: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val n = bucketsOrDefault(spark, numBuckets)
    dropComponents(spark, dir,
      Seq("hashes", "bands", "shingles", "counts", "sigs"))
    val sh = graft.plans.CachedPlans.cached(
      Dedup.hashedShingleTable(corpus, idCol, textCol, shingleN, portable))
    // the signature table feeds both the band-key table and the stored
    // sigs component — cache so the k min-aggregates run once
    val sig = graft.plans.CachedPlans.cached(
      Dedup.minHashSignatures(sh, idCol, numHashes, portable))
    writeComponent(
      corpus.select(md5(col(textCol)).as("content_hash")).distinct(),
      dir, "hashes", Seq("content_hash"), n)
    writeComponent(
      Dedup.lshBandKeys(sig, idCol, bands, numHashes / bands, portable)
        .select(col(idCol).cast("long").as("id"), col("band"),
          col("band_key"),
          bandedKey(col("band"), col("band_key")).as("bkey")),
      dir, "bands", Seq("bkey"), n)
    writeComponent(
      sig.select(col(idCol).cast("long").as("id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig")),
      dir, "sigs", Seq("id"), n)
    writeComponent(
      sh.select(col(idCol).cast("long").as("id"), col("shingle")),
      dir, "shingles", Seq("id"), n)
    writeComponent(
      sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
        .select(col(idCol).cast("long").as("id"), col("n_shingles")),
      dir, "counts", Seq("id"), n)
    writeParams(spark, dir,
      s"""{"kind":"text","shingleN":$shingleN,"numHashes":$numHashes,""" +
        s""""bands":$bands,"portable":$portable,"numBuckets":$n}""")
  }

  /** Build and persist the vector-ANN index of `corpus` under `dir`:
    * each vector with its hyperplane-LSH bucket and precomputed squared
    * norm, bucketed (in the parquet sense) by the LSH bucket so a probe
    * batch joins against co-located candidates.
    */
  def writeVectors(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, planes: Int, dim: Int, numBuckets: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val n = bucketsOrDefault(spark, numBuckets)
    dropComponents(spark, dir, Seq("buckets"))
    val signs = Similarity.hyperplaneSigns(planes, dim)
    writeComponent(
      corpus.select(col(idCol).cast("long").as("id"),
        Similarity.lshBucket(col(vecCol), signs).as("bucket"),
        col(vecCol).as("vec"),
        graft.functions.VectorFunctions.normSq(col(vecCol)).as("norm")),
      dir, "buckets", Seq("bucket"), n)
    writeParams(spark, dir,
      s"""{"kind":"vector","planes":$planes,"dim":$dim,"numBuckets":$n}""")
  }

  /** Absorb a new batch into an existing text index — the second half of
    * the daily-batch loop (probe the batch, then index what you keep, so
    * tomorrow's batch probes today's corpus). Appends to all five
    * bucketed tables in the index's own layout; the write is
    * batch-sized, the corpus tables are never rewritten.
    *
    * Idempotent per document id: rows whose id is already indexed are
    * skipped (anti-join against `counts`), and only content hashes the
    * index has never seen are appended — so a crashed-and-retried absorb
    * (or a batch overlapping a previous one) cannot duplicate index
    * rows. Single-writer contract: concurrent absorbs into one directory
    * are not coordinated. Id spaces must stay disjoint from future probe
    * batches, as everywhere in the incremental family.
    */
  def appendText(newDocs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = newDocs.sparkSession
    val idx = loadText(spark, dir) // registers tables + pins geometry
    val p = idx.params
    val fresh = newDocs.join(idx.counts.select(col("id")),
      newDocs(idCol).cast("long") === col("id"), "left_anti")
    val sh = graft.plans.CachedPlans.cached(
      Dedup.hashedShingleTable(fresh, idCol, textCol, p.shingleN,
        p.portable))
    val sig = graft.plans.CachedPlans.cached(
      Dedup.minHashSignatures(sh, idCol, p.numHashes, p.portable))
    appendComponent(
      fresh.select(md5(col(textCol)).as("content_hash")).distinct()
        .join(idx.hashes, Seq("content_hash"), "left_anti"),
      dir, "hashes", Seq("content_hash"), p.numBuckets)
    appendComponent(
      Dedup.lshBandKeys(sig, idCol, p.bands, p.numHashes / p.bands,
          p.portable)
        .select(col(idCol).cast("long").as("id"), col("band"),
          col("band_key"),
          bandedKey(col("band"), col("band_key")).as("bkey")),
      dir, "bands", Seq("bkey"), p.numBuckets)
    appendComponent(
      sig.select(col(idCol).cast("long").as("id"),
        array((0 until p.numHashes).map(i => col(s"h$i")): _*).as("sig")),
      dir, "sigs", Seq("id"), p.numBuckets)
    appendComponent(
      sh.select(col(idCol).cast("long").as("id"), col("shingle")),
      dir, "shingles", Seq("id"), p.numBuckets)
    appendComponent(
      sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
        .select(col(idCol).cast("long").as("id"), col("n_shingles")),
      dir, "counts", Seq("id"), p.numBuckets)
  }

  /** [[appendText]]'s vector twin: absorb new vectors into an existing
    * vector index under its stored geometry. Idempotent per id.
    */
  def appendVectors(newVecs: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val spark = newVecs.sparkSession
    val idx = loadVectors(spark, dir)
    val p = idx.params
    val fresh = newVecs.join(idx.buckets.select(col("id")),
      newVecs(idCol).cast("long") === col("id"), "left_anti")
    val signs = Similarity.hyperplaneSigns(p.planes, p.dim)
    appendComponent(
      fresh.select(col(idCol).cast("long").as("id"),
        Similarity.lshBucket(col(vecCol), signs).as("bucket"),
        col(vecCol).as("vec"),
        graft.functions.VectorFunctions.normSq(col(vecCol)).as("norm")),
      dir, "buckets", Seq("bucket"), p.numBuckets)
  }

  // -------------------------------------------------------------- load

  /** Load a text index written by [[writeText]], re-registering the
    * bucketed external tables if this session hasn't seen them.
    */
  def loadText(spark: SparkSession, dir: String): TextIndex = {
    val p = readParams(spark, dir, "text")
    val params = TextParams(p("shingleN").toInt, p("numHashes").toInt,
      p("bands").toInt, p("portable").toBoolean, p("numBuckets").toInt)
    TextIndex(dir, params,
      hashes = component(spark, dir, "hashes", Seq("content_hash"),
        params.numBuckets),
      bandKeys = component(spark, dir, "bands", Seq("bkey"),
        params.numBuckets),
      shingles = component(spark, dir, "shingles", Seq("id"),
        params.numBuckets),
      counts = component(spark, dir, "counts", Seq("id"),
        params.numBuckets),
      sigs = component(spark, dir, "sigs", Seq("id"),
        params.numBuckets))
  }

  /** Load a vector index written by [[writeVectors]]. */
  def loadVectors(spark: SparkSession, dir: String): VectorIndex = {
    val p = readParams(spark, dir, "vector")
    val params = VectorParams(p("planes").toInt, p("dim").toInt,
      p("numBuckets").toInt)
    VectorIndex(dir, params,
      buckets = component(spark, dir, "buckets", Seq("bucket"),
        params.numBuckets))
  }

  /** The single-column band-scoped join key probes must use against the
    * `bands` table (see class doc for why a composite beats joining on
    * (band, band_key)).
    */
  def bandedKey(band: org.apache.spark.sql.Column,
      bandKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("|", band.cast("string"), bandKey)

  // --------------------------------------------------------- internals

  private def bucketsOrDefault(spark: SparkSession, n: Int): Int =
    if (n > 0) n
    else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Deterministic catalog name for a component: the directory digest
    * keys it, so two indexes never collide and the same index always
    * re-registers under the same name.
    */
  private def tableName(dir: String, component: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    s"graft_idx_${hex}_$component"
  }

  private def componentPath(dir: String, component: String) =
    new org.apache.hadoop.fs.Path(dir, component)

  private def dropComponents(spark: SparkSession, dir: String,
      components: Seq[String]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    components.foreach { c =>
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(dir, c)}")
      val p = componentPath(dir, c)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  private def writeComponent(df: DataFrame, dir: String, component: String,
      bucketCols: Seq[String], numBuckets: Int): Unit =
    ScaleOps.writeBucketedAt(df,
      tableName(dir, component),
      componentPath(dir, component).toString,
      bucketCols, numBuckets)

  /** Append into a registered bucketed component (same spec, extra files
    * per bucket — Spark's bucketed scan merges per-bucket file sets),
    * then refresh the session's listing so open plans see the new files.
    */
  private def appendComponent(df: DataFrame, dir: String,
      component: String, bucketCols: Seq[String], numBuckets: Int): Unit = {
    val table = tableName(dir, component)
    df.write
      .mode("append")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
    df.sparkSession.catalog.refreshTable(table)
  }

  /** Register-if-absent and scan one bucketed component. The CREATE
    * TABLE path (fresh session over an existing index) infers the column
    * schema from the parquet footers and re-declares the bucket spec —
    * Spark keeps bucket metadata only in the catalog.
    */
  private def component(spark: SparkSession, dir: String, name: String,
      bucketCols: Seq[String], numBuckets: Int): DataFrame = {
    val table = tableName(dir, name)
    if (!spark.catalog.tableExists(table)) {
      val path = componentPath(dir, name).toString
      val schemaDdl = spark.read.parquet(path).schema.toDDL
      val cols = bucketCols.mkString(", ")
      spark.sql(
        s"""CREATE TABLE $table ($schemaDdl) USING parquet
           |CLUSTERED BY ($cols) SORTED BY ($cols)
           |INTO $numBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    spark.table(table)
  }

  private def writeParams(spark: SparkSession, dir: String,
      json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_params.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readParams(spark: SparkSession, dir: String,
      expectKind: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dir, "_params.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new IllegalArgumentException(s"no dedup index at $dir")
    val in = fs.open(p)
    val json =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val fields = """"(\w+)":("?)([^",}]+)\2""".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(3)).toMap
    require(fields.get("kind").contains(expectKind),
      s"index at $dir is kind=${fields.getOrElse("kind", "?")}, " +
        s"expected $expectKind")
    fields
  }
}
