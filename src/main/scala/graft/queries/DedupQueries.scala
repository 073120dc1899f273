package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Deduplication operators over the `documents` table (LLM-data-pipeline
  * north star). Portable md5 hashing so every result is oracle-checkable.
  */
object DedupQueries {

  /** Exact dedup: content-hash groups with a canonical (min) doc id.
    * Single hash-shuffle; at 100 TB this is the standard
    * hash-partition-by-digest dedup.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy(col("doc_id"))
  }

  def exactSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** DuckDB CTE producing the distinct (doc_id, shingle) table for word
    * n-grams — must mirror TextFunctions.wordShingles exactly.
    */
  private def shingleCte(n: Int, cteName: String,
      src: String = "documents"): String =
    s"""toks_$cteName AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM $src),
      |$cteName AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN len(t) < $n THEN array_to_string(t, ' ')
      |      ELSE array_to_string(t[i:i+${n - 1}], ' ') END AS shingle
      |    FROM (SELECT doc_id, t,
      |            unnest(range(1, greatest(len(t) - ${n - 1}, 1) + 1)) AS i
      |          FROM toks_$cteName)))""".stripMargin

  /** MinHash + LSH near-duplicate pairs, verified with exact Jaccard.
    * 12 portable (md5) min-hashes, 4 bands × 3 rows, Jaccard ≥ 0.5 over
    * word 3-gram shingles.
    */
  def minHashLsh(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.minHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .orderBy(col("a_id"), col("b_id"))

  /** Incremental exact dedup as a declared op: even doc_ids play the
    * already-deduped corpus, odd ids the arriving batch; each batch doc
    * gets a kept / dup_of_existing / dup_within_batch verdict from one
    * hash-probe join (the corpus is never re-paired).
    */
  def incrementalExact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExact(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  def incrementalExactSql: String =
    incrementalExactSqlFor("doc_id % 2 = 0", "doc_id % 2 = 1")

  /** The exact-probe oracle with configurable corpus/batch membership —
    * shared by the even/odd probe and the evolved-index (absorb) probe.
    */
  private def incrementalExactSqlFor(existingPred: String,
      newPred: String, src: String = "documents"): String =
    s"""WITH eh AS (
      |  SELECT DISTINCT md5(text) AS content_hash
      |  FROM $src WHERE $existingPred),
      |nh AS (
      |  SELECT doc_id, md5(text) AS content_hash
      |  FROM $src WHERE $newPred),
      |j AS (
      |  SELECT n.doc_id, n.content_hash,
      |    e.content_hash IS NOT NULL AS seen,
      |    row_number() OVER (PARTITION BY n.content_hash ORDER BY n.doc_id) AS rk
      |  FROM nh n LEFT JOIN eh e USING (content_hash))
      |SELECT doc_id, content_hash,
      |  CASE WHEN seen THEN 'dup_of_existing'
      |       WHEN rk > 1 THEN 'dup_within_batch'
      |       ELSE 'kept' END AS verdict
      |FROM j ORDER BY doc_id""".stripMargin

  /** Incremental MinHash near-dup probe as a declared op: same even/odd
    * corpus/batch split; candidates only from NEW×EXISTING band-key
    * collisions, Jaccard-verified ≥ 0.5.
    */
  def incrementalLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReport(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalExact]] probing the PERSISTED corpus index instead of
    * recomputing the corpus side — same even/odd split, same oracle,
    * bit-identical verdicts; the probe plan never scans corpus text
    * (DedupIndexSpec asserts it).
    */
  def incrementalExactIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.text(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  /** [[incrementalLsh]] probing the PERSISTED band-key/shingle index —
    * same split, same oracle, bit-identical pairs.
    */
  def incrementalLshIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.text(spark, sfDir),
        threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalExactIndexed]] against an index GROWN BY ABSORB
    * ([[graft.operators.DedupIndex.appendText]]): the corpus is the
    * even docs PLUS the absorbed `doc_id % 4 == 1` batch, the probe
    * batch is `doc_id % 4 == 3`, and the oracle recomputes over the
    * union — so the absorb path itself (staged commit, freshness
    * anti-join, never-seen-hash filter) is oracle-gated end to end,
    * not just spec-tested.
    */
  def incrementalExactAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 4 === 3),
        "doc_id", "text", QueryIndexes.textAbsorbed(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  def incrementalExactAbsorbedSql: String =
    incrementalExactSqlFor("(doc_id % 2 = 0 OR doc_id % 4 = 1)",
      "doc_id % 4 = 3")

  /** [[incrementalLshIndexed]]'s absorb twin: band keys, signatures,
    * shingles and counts of the absorbed batch all came through
    * [[graft.operators.DedupIndex.appendText]]'s staged commit.
    */
  def incrementalLshAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 4 === 3),
        "doc_id", "text", QueryIndexes.textAbsorbed(spark, sfDir),
        threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalLshAbsorbedSql: String =
    incrementalLshSqlFor(c => s"($c % 2 = 0 OR $c % 4 = 1)",
      c => s"$c % 4 = 3")

  /** [[incrementalExactIndexed]] against an index that absorbed a CDC
    * DELETE batch ([[graft.operators.DedupIndex.retireText]]): corpus =
    * even ids with the `doc_id % 10 == 0` slice retired, probe batch =
    * odd ids — and the ORACLE recomputes over the LIVE corpus alone, so
    * retirement is gated end to end (staged tombstone commit, live-view
    * anti-joins, a hash dying exactly when its last copy retires), not
    * just spec-tested.
    */
  def incrementalExactRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRetired(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  def incrementalExactRetiredSql: String =
    incrementalExactSqlFor("(doc_id % 2 = 0 AND doc_id % 10 <> 0)",
      "doc_id % 2 = 1")

  /** [[incrementalLshIndexed]]'s retirement twin: band keys, shingles
    * and counts of retired docs are all invisible to the candidate and
    * verify stages, gated against the live-corpus recompute oracle.
    */
  def incrementalLshRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRetired(spark, sfDir),
        threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalLshRetiredSql: String =
    incrementalLshSqlFor(c => s"($c % 2 = 0 AND $c % 10 <> 0)",
      c => s"$c % 2 = 1")

  /** [[incrementalExactRetired]] after [[graft.operators.DedupIndex
    * .compactText]] ran: same live corpus, same oracle, but the probe
    * reads physically rewritten tombstone-free components — so the
    * compaction rewrite (live rows kept, retired rows dropped, bucket
    * layout intact, hash set re-derived) is itself oracle-gated.
    */
  def incrementalExactCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textCompacted(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  /** [[incrementalLshRetired]] after [[graft.operators.DedupIndex
    * .compactText]] ran ([[QueryIndexes.textCompacted]]): same live
    * corpus, same oracle, but the probe reads physically rewritten
    * components — including the fmt-5 `sizes` deltas COLLAPSED back to
    * live counts, so the compaction's size-collapse leg is itself
    * oracle-gated (a drifted collapsed count would flip a bucket across
    * the cap and change the pair set).
    */
  def incrementalLshCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textCompacted(spark, sfDir),
        threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalSimHashRetired]]'s compacted twin — the `simsizes`
    * collapse gate, mirroring [[incrementalLshCompacted]].
    */
  def incrementalSimHashCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textCompacted(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalExactIndexed]] against an index that absorbed a CDC
    * UPDATE batch ([[QueryIndexes.textRefreshed]]): the even `% 10`
    * slice re-indexed with changed text, the `% 6` slice replayed with
    * unchanged text — and the ORACLE recomputes over the POST-UPDATE
    * corpus, so the generational refresh (displaced-generation
    * tombstones, content-aware no-op, live-view filtering) is gated end
    * to end: a stale hash surviving, a refreshed hash missing, or a
    * no-op row duplicating would all flip verdicts.
    */
  def incrementalExactRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRefreshed(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  def incrementalExactRefreshedSql: String =
    incrementalExactSqlFor("doc_id % 2 = 0", "doc_id % 2 = 1",
      src = QueryIndexes.refreshedDocsSql)

  /** [[incrementalLshIndexed]]'s refresh twin: the updated docs'
    * band keys, signatures, shingles and counts must all be the
    * RE-DERIVED ones (and only those) for candidate generation and
    * Jaccard verify to match the post-update recompute.
    */
  def incrementalLshRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalMinHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRefreshed(spark, sfDir),
        threshold = 0.5)
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalLshRefreshedSql: String =
    incrementalLshSqlFor(c => s"$c % 2 = 0", c => s"$c % 2 = 1",
      src = QueryIndexes.refreshedDocsSql)

  /** Incremental SimHash near-dup probe as a declared op — the modality
    * that closes the parity gap: exact and MinHash-LSH each had batch +
    * incremental + indexed + generational forms, SimHash had batch
    * only. Same even/odd corpus/batch split as [[incrementalLsh]];
    * candidates only from NEW×EXISTING banded signature collisions,
    * Hamming-verified ≤ 3 over 32-bit signatures (4 bands — pigeonhole
    * recall, existing-side bucket cap 1000 as in the batch form).
    */
  def incrementalSimHash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReport(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalSimHashSql: String =
    incrementalSimHashSqlFor(c => s"$c % 2 = 0", c => s"$c % 2 = 1")

  /** [[incrementalSimHash]] probing the PERSISTED signature/banded-key
    * components ([[graft.operators.DedupIndex]] fmt 4) — same split,
    * same oracle, bit-identical pairs; corpus text is never re-hashed.
    */
  def incrementalSimHashIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.text(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalSimHashIndexed]]'s absorb twin
    * ([[QueryIndexes.textAbsorbed]]: corpus = even docs plus the
    * `doc_id % 4 == 1` batch absorbed through
    * [[graft.operators.DedupIndex.appendText]]'s staged commit, probe
    * batch = `doc_id % 4 == 3`): the absorbed docs' SimHash signatures
    * and banded keys were derived inside the absorb and must collide
    * and Hamming-verify exactly as a recompute over the union would.
    */
  def incrementalSimHashAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 4 === 3),
        "doc_id", "text", QueryIndexes.textAbsorbed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalSimHashAbsorbedSql: String =
    incrementalSimHashSqlFor(c => s"($c % 2 = 0 OR $c % 4 = 1)",
      c => s"$c % 4 = 3")

  /** [[incrementalSimHashIndexed]]'s retirement twin
    * ([[QueryIndexes.textRetired]]: the even `% 10` slice CDC-deleted):
    * retired docs' stored signatures and banded keys are invisible to
    * candidate generation and the Hamming verify, gated against the
    * live-corpus recompute oracle — completing the generational
    * treatment for the third dedup modality.
    */
  def incrementalSimHashRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRetired(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalSimHashRetiredSql: String =
    incrementalSimHashSqlFor(c => s"($c % 2 = 0 AND $c % 10 <> 0)",
      c => s"$c % 2 = 1")

  /** [[incrementalSimHashIndexed]]'s refresh twin
    * ([[QueryIndexes.textRefreshed]]: the even `% 10` slice updated,
    * `% 6` replayed unchanged): the updated docs' signatures and banded
    * keys must be the RE-DERIVED ones (and only those) — the oracle
    * recomputes over the post-update corpus.
    */
  def incrementalSimHashRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalSimHashNearDupsReportIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textRefreshed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalSimHashRefreshedSql: String =
    incrementalSimHashSqlFor(c => s"$c % 2 = 0", c => s"$c % 2 = 1",
      src = QueryIndexes.refreshedDocsSql)

  /** The incremental-SimHash oracle with configurable corpus/batch
    * membership — shared by the recompute probe and every maintained-
    * index gate (signatures depend only on a doc's own tokens, so
    * computing over the union and slicing equals per-side computation).
    */
  private def incrementalSimHashSqlFor(existingPred: String => String,
      newPred: String => String, src: String = "documents"): String = {
    val bandSelects = (pred: String) => (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, substr(simhash, ${b * 8 + 1}, 8) AS band_key FROM sh WHERE $pred")
      .mkString("\n  UNION ALL\n  ")
    val ham = (1 to 32).map(i =>
      s"CASE WHEN substr(x.simhash, $i, 1) <> substr(y.simhash, $i, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${simhashSigCtes(src)},
      |bke AS (
      |  ${bandSelects(existingPred("doc_id"))}),
      |bkn AS (
      |  ${bandSelects(newPred("doc_id"))}),
      |ok AS (
      |  SELECT band, band_key FROM bke
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkec AS (SELECT bke.* FROM bke JOIN ok USING (band, band_key)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkec a JOIN bkn b ON a.band = b.band
      |    AND a.band_key = b.band_key AND a.doc_id <> b.doc_id)
      |SELECT p.a_id, p.b_id, $ham AS hamming
      |FROM pairs p
      |JOIN sh x ON x.doc_id = p.a_id
      |JOIN sh y ON y.doc_id = p.b_id
      |WHERE $ham <= 3
      |ORDER BY p.a_id, p.b_id""".stripMargin
  }

  /** Incremental perceptual-hash (aHash) near-dup probe as a declared
    * op — the MEDIA modality joining the parity square text already
    * has: both sides are BINARY image payloads
    * ([[TextQueries.ahashPayloads]] — real BMP bytes through the real
    * decode registry), candidates come from NEW×EXISTING collisions on
    * 4 contiguous 16-bit code slices, survivors Hamming-verify ≤ 3 over
    * the full 64 bits, with the text incrementals' existing-side
    * bucket cap (1000); the oracle derives the codes analytically from
    * the md5 pixel chains and replays bands, cap, and verify exactly.
    *
    * The corpus/batch split is `(doc_id div 20) % 2`, NOT the text
    * family's doc_id parity — deliberately: perceptual codes are
    * TEMPLATE-dominated (near pairs only form within a (lang, source)
    * group), and the synthetic corpus assigns sources by `doc_id % 20`,
    * so a plain-parity split puts every template group entirely on one
    * side and the gate passes vacuously at 0 pairs (measured: 0
    * cross-parity pairs at Hamming ≤ 4 vs 845 cross-side pairs under
    * this split at sf0.01). A fixture split for a blocking-keyed
    * modality must mix within the blocking key's groups.
    */
  def incrementalAhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReport(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 0)),
        "doc_id", "payload")
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAhashSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1")

  /** The AUDIO modality's incremental near-dup probe as a declared op:
    * same `(doc_id div 20) % 2` corpus/batch split as the image family
    * (near-dups form within (lang, source) template groups, which the
    * synthetic corpus assigns by `doc_id % 20`), but the payloads are
    * 128-sample PCM16 WAVs and the 64-bit code is the ENERGY hash over
    * the real RIFF decode — the oracle replays the energy windows, the
    * mean-threshold bits, the banded candidates and the Hamming verify
    * analytically from the md5 sample chains.
    */
  def incrementalAudioHash(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAudioHashNearDupsReport(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 0)),
        "doc_id", "payload")
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAudioHashSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1",
      codeCtes = TextQueries.energyHashCodeCtes)

  /** [[incrementalAudioHash]] probing a PERSISTED media index built
    * with the `audio_energy` coder ([[QueryIndexes.mediaAudio]]) — the
    * whole maintained-media-index machinery (bucketed codes + band
    * keys, delta-served bucket cap, generational lifecycle) serves the
    * audio modality unchanged, because the coder is pinned in the index
    * params and only the code DERIVATION differs. Same oracle as the
    * recompute form; corpus WAVs are never re-parsed at probe time.
    */
  def incrementalAudioHashIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaAudio(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalAudioHashIndexed]]'s absorb twin
    * ([[QueryIndexes.mediaAudioAbsorbed]]): the absorbed WAV batch's
    * energy codes were derived INSIDE the absorb via the index's pinned
    * coder — the oracle recomputes over the unioned corpus, gating the
    * coder-dispatched absorb path end to end.
    */
  def incrementalAudioHashAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 4") === 3)),
        "doc_id", "payload", QueryIndexes.mediaAudioAbsorbed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAudioHashAbsorbedSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 OR $k % 4 = 1)",
      k => s"$k % 4 = 3", codeCtes = TextQueries.energyHashCodeCtes)

  /** [[incrementalAudioHashIndexed]]'s retirement twin
    * ([[QueryIndexes.mediaAudioRetired]]): retired clips' stored energy
    * codes and band keys are invisible to candidates and verify, gated
    * against the live-corpus recompute oracle.
    */
  def incrementalAudioHashRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaAudioRetired(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAudioHashRetiredSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 AND $k % 10 <> 0)",
      k => s"$k % 2 = 1", codeCtes = TextQueries.energyHashCodeCtes)

  /** [[incrementalAudioHashRetired]] over the COMPACTED audio-coder
    * index ([[QueryIndexes.mediaAudioCompacted]]): same live-corpus
    * oracle; the physical rewrite must keep exactly the live energy
    * codes and band keys on the tombstone-free load path.
    */
  def incrementalAudioHashCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaAudioCompacted(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalAudioHashRetired]] after the `k % 20 == 0` half of
    * the deleted slice re-absorbs with its ORIGINAL WAV bytes
    * ([[QueryIndexes.mediaAudioResurrected]]): generation-scoped
    * tombstones must let the resurrected clips pair again while the
    * still-dead half stays invisible.
    */
  def incrementalAudioHashResurrected(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaAudioResurrected(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAudioHashResurrectedSql: String =
    incrementalAhashSqlFor(
      k => s"($k % 2 = 0 AND ($k % 10 <> 0 OR $k % 20 = 0))",
      k => s"$k % 2 = 1", codeCtes = TextQueries.energyHashCodeCtes)

  /** [[incrementalAudioHashIndexed]]'s refresh twin
    * ([[QueryIndexes.mediaAudioRefreshed]]: the `k % 10 == 0` slice
    * re-absorbed with WAVs rendered from UPDATED text — new noise
    * samples, new bytes, new energy code — the `k % 6 == 0` slice
    * replayed byte-identical): the refreshed clips' codes must be the
    * RE-DERIVED ones (and only those); the oracle recomputes over the
    * post-update corpus.
    */
  def incrementalAudioHashRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.audioPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaAudioRefreshed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAudioHashRefreshedSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1",
      src = QueryIndexes.refreshedMediaDocsSql,
      codeCtes = TextQueries.energyHashCodeCtes)

  /** The VIDEO modality's incremental near-dup probe as a declared op:
    * same `(doc_id div 20) % 2` corpus/batch split as the image and
    * audio families, but the payloads are 4-frame GIF clips and the
    * 64-bit code is the FRAME-SAMPLED temporally-pooled hash over the
    * real multi-frame decode — the oracle replays the palette gray,
    * the 8×8 sampling, the temporal pooling, the banded candidates and
    * the Hamming verify analytically from the md5 frame chains.
    */
  def incrementalFrameHash(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalFrameHashNearDupsReport(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 0)),
        "doc_id", "payload")
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1",
      codeCtes = TextQueries.frameHashCodeCtes)

  /** [[incrementalFrameHash]] probing a PERSISTED media index built
    * with the `video_framehash` coder ([[QueryIndexes.mediaVideo]]) —
    * the third modality served by the SAME maintained-media-index
    * machinery via its pinned coder; corpus clips are decoded once at
    * index time and never re-parsed at probe time.
    */
  def incrementalFrameHashIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaVideo(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** The video modality's full lifecycle square — the audio family's
    * five maintained forms with GIF clips and frame-hash codes (verbs
    * coder-agnostic, splits identical; oracles recompute analytically
    * over the unioned / live / post-update corpus via
    * [[TextQueries.frameHashCodeCtes]]).
    */
  def incrementalFrameHashAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 4") === 3)),
        "doc_id", "payload",
        QueryIndexes.mediaVideoAbsorbed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashAbsorbedSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 OR $k % 4 = 1)",
      k => s"$k % 4 = 3", codeCtes = TextQueries.frameHashCodeCtes)

  def incrementalFrameHashRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaVideoRetired(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashRetiredSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 AND $k % 10 <> 0)",
      k => s"$k % 2 = 1", codeCtes = TextQueries.frameHashCodeCtes)

  def incrementalFrameHashCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaVideoCompacted(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashResurrected(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaVideoResurrected(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashResurrectedSql: String =
    incrementalAhashSqlFor(
      k => s"($k % 2 = 0 AND ($k % 10 <> 0 OR $k % 20 = 0))",
      k => s"$k % 2 = 1", codeCtes = TextQueries.frameHashCodeCtes)

  def incrementalFrameHashRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.videoPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload",
        QueryIndexes.mediaVideoRefreshed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalFrameHashRefreshedSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1",
      src = QueryIndexes.refreshedMediaDocsSql,
      codeCtes = TextQueries.frameHashCodeCtes)

  /** [[incrementalAhash]] probing the PERSISTED media index
    * ([[graft.operators.DedupIndex.MediaIndex]]) — same split, same
    * oracle, bit-identical pairs; corpus payloads are never re-fetched
    * or re-DECODED (at 100 TB the image decode dominates the corpus
    * side, so this is the modality where the maintained index pays off
    * hardest).
    */
  def incrementalAhashIndexed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.media(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalAhashIndexed]]'s absorb twin
    * ([[QueryIndexes.mediaAbsorbed]]: corpus = the k-even payloads plus
    * the `k % 4 == 1` batch absorbed through
    * [[graft.operators.DedupIndex.appendMedia]]'s staged commit, probe
    * batch = `k % 4 == 3`, k = doc_id div 20): absorbed payloads' codes
    * and banded keys were derived inside the absorb (decode-once) and
    * must collide and Hamming-verify exactly as a recompute over the
    * union would.
    */
  def incrementalAhashAbsorbed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 4") === 3)),
        "doc_id", "payload", QueryIndexes.mediaAbsorbed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAhashAbsorbedSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 OR $k % 4 = 1)",
      k => s"$k % 4 = 3")

  /** [[incrementalAhashIndexed]]'s retirement twin
    * ([[QueryIndexes.mediaRetired]]: the `k % 10 == 0` slice
    * CDC-deleted): retired images' stored codes and banded keys are
    * invisible to candidate generation and the Hamming verify, gated
    * against the live-corpus recompute oracle.
    */
  def incrementalAhashRetired(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaRetired(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAhashRetiredSql: String =
    incrementalAhashSqlFor(k => s"($k % 2 = 0 AND $k % 10 <> 0)",
      k => s"$k % 2 = 1")

  /** [[incrementalAhashRetired]] over the COMPACTED media index
    * ([[QueryIndexes.mediaCompacted]]): same live-corpus oracle; the
    * compaction rewrite underneath must keep exactly the live codes and
    * band keys on the fast tombstone-free load path.
    */
  def incrementalAhashCompacted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaCompacted(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  /** [[incrementalAhashRetired]] after the `k % 20 == 0` half of the
    * deleted slice re-absorbs with its ORIGINAL bytes
    * ([[QueryIndexes.mediaResurrected]]): generation-scoped tombstones
    * must let the resurrected images pair again while the still-dead
    * half stays invisible.
    */
  def incrementalAhashResurrected(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaResurrected(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAhashResurrectedSql: String =
    incrementalAhashSqlFor(
      k => s"($k % 2 = 0 AND ($k % 10 <> 0 OR $k % 20 = 0))",
      k => s"$k % 2 = 1")

  /** [[incrementalAhashIndexed]]'s refresh twin
    * ([[QueryIndexes.mediaRefreshed]]: the `k % 10 == 0` slice
    * re-absorbed with payloads synthesized from UPDATED text — new
    * noise bits, new bytes, new code — the `k % 6 == 0` slice replayed
    * byte-identical): the refreshed images' codes must be the
    * RE-DERIVED ones (and only those); the oracle recomputes over the
    * post-update corpus.
    */
  def incrementalAhashRefreshed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalAhashNearDupsReportIndexed(
        TextQueries.ahashPayloads(docs.filter(expr("(doc_id div 20) % 2") === 1)),
        "doc_id", "payload", QueryIndexes.mediaRefreshed(spark, sfDir))
      .pairs.orderBy(col("a_id"), col("b_id"))
  }

  def incrementalAhashRefreshedSql: String =
    incrementalAhashSqlFor(k => s"$k % 2 = 0", k => s"$k % 2 = 1",
      src = QueryIndexes.refreshedMediaDocsSql)

  /** The incremental-aHash oracle with configurable corpus/batch
    * membership — shared by the recompute probe and every
    * maintained-index gate (a code depends only on its own document's
    * pixel chains, so computing over the union and slicing equals
    * per-side computation). Replays [[graft.operators.Dedup
    * .ahashBands]]'s shift/mask slices, the existing-side bucket cap,
    * the NEW×EXISTING distinct candidate join, and the 64-bit Hamming
    * verify (≤ 3, exact-dup pairs included — cross-side exact matches
    * ARE near-dups here, unlike the batch rep-collapsed form). The
    * membership predicates receive the split ordinal `doc_id // 20`
    * (see [[incrementalAhash]] for why the media split must mix within
    * template groups).
    */
  private def incrementalAhashSqlFor(existingPred: String => String,
      newPred: String => String, src: String = "documents",
      codeCtes: String => String = TextQueries.ahashCodeCtes): String = {
    val bandSelect = (pred: String) =>
      s"""SELECT doc_id, CAST(t.b AS INTEGER) AS band,
         |    CASE WHEN t.b < 2 THEN (ahash_lo >> CAST(16 * t.b AS INTEGER)) & 65535
         |         ELSE (ahash_hi >> CAST(16 * (t.b - 2) AS INTEGER)) & 65535 END AS band_key
         |  FROM code, UNNEST(range(0, 4)) AS t(b)
         |  WHERE $pred""".stripMargin
    val ham = "bit_count(xor(x.ahash_hi, y.ahash_hi)) " +
      "+ bit_count(xor(x.ahash_lo, y.ahash_lo))"
    s"""WITH ${codeCtes(src)},
      |bke AS (
      |  ${bandSelect(existingPred("(doc_id // 20)"))}),
      |bkn AS (
      |  ${bandSelect(newPred("(doc_id // 20)"))}),
      |ok AS (
      |  SELECT band, band_key FROM bke
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkec AS (SELECT bke.* FROM bke JOIN ok USING (band, band_key)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkec a JOIN bkn b ON a.band = b.band
      |    AND a.band_key = b.band_key AND a.doc_id <> b.doc_id)
      |SELECT p.a_id, p.b_id, CAST($ham AS INTEGER) AS hamming
      |FROM pairs p
      |JOIN code x ON x.doc_id = p.a_id
      |JOIN code y ON y.doc_id = p.b_id
      |WHERE $ham <= 3
      |ORDER BY p.a_id, p.b_id""".stripMargin
  }

  /** [[incrementalExactIndexed]] against an index taken through a full
    * delete→re-insert cycle ([[QueryIndexes.textResurrected]]): the
    * even `% 10` slice retired, its `% 20` half re-absorbed with
    * original content — the oracle's corpus keeps exactly the
    * resurrected half, gating generational resurrection end to end
    * (under id-keyed tombstones the re-absorb would have stayed dead
    * and the `% 20` hashes would not match).
    */
  def incrementalExactResurrected(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.incrementalExactIndexed(
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", QueryIndexes.textResurrected(spark, sfDir))
      .orderBy(col("doc_id"))
  }

  def incrementalExactResurrectedSql: String =
    incrementalExactSqlFor(
      "(doc_id % 2 = 0 AND (doc_id % 10 <> 0 OR doc_id % 20 = 0))",
      "doc_id % 2 = 1")

  /** Oracle: the batch minHashLshSql machinery with the pair condition
    * swapped from `a < b` to `a existing (even), b new (odd)`, and the
    * Scala op's existing-side bucket cap (default maxBucket = 1000)
    * mirrored via `HAVING count(*) <= 1000` on existing band keys — so
    * the oracle stays semantically equivalent at any scale factor, not
    * just ones where no bucket exceeds the cap.
    */
  def incrementalLshSql: String =
    incrementalLshSqlFor(c => s"$c % 2 = 0", c => s"$c % 2 = 1")

  /** The LSH-probe oracle with configurable corpus/batch membership
    * (predicates receive the qualified doc_id column) — shared by the
    * even/odd probe and the evolved-index (absorb) probe.
    */
  private def incrementalLshSqlFor(existingPred: String => String,
      newPred: String => String,
      src: String = "documents"): String = {
    val mins = (0 until 12).map(i =>
      s"min(('0x' || substr(md5(concat_ws('|', $i, shingle)), 1, 15))::BIGINT) AS h$i")
      .mkString(",\n    ")
    val bandKeys = (0 until 4).map { b =>
      val slice = (0 until 3).map(r => s"h${b * 3 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $slice)) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${shingleCte(3, "sh3_raw", src)},
      |sh3 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh3_raw),
      |sig AS (
      |  SELECT doc_id,
      |    $mins
      |  FROM sh3 GROUP BY doc_id),
      |bk AS (
      |  $bandKeys),
      |ok_keys AS (
      |  SELECT band, band_key FROM bk WHERE ${existingPred("doc_id")}
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bk a
      |  JOIN ok_keys k ON a.band = k.band AND a.band_key = k.band_key
      |  JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
      |    AND ${newPred("b.doc_id")}
      |  WHERE ${existingPred("a.doc_id")}),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
      |common AS (
      |  SELECT p.a_id, p.b_id, count(*) AS common
      |  FROM pairs p
      |  JOIN sh3 x ON x.doc_id = p.a_id
      |  JOIN sh3 y ON y.doc_id = p.b_id AND y.shingle = x.shingle
      |  GROUP BY 1, 2)
      |SELECT c.a_id, c.b_id, c.common, ca.n AS na, cb.n AS nb,
      |  CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) AS jaccard
      |FROM common c
      |JOIN cnt ca ON ca.doc_id = c.a_id
      |JOIN cnt cb ON cb.doc_id = c.b_id
      |WHERE CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin
  }

  def minHashLshSql: String = {
    // signatures are 60-bit longs (first 15 md5 hex chars), matching
    // PortableHash.seededLong — long min-buffers stay in HashAggregate
    val mins = (0 until 12).map(i =>
      s"min(('0x' || substr(md5(concat_ws('|', $i, shingle)), 1, 15))::BIGINT) AS h$i")
      .mkString(",\n    ")
    val bandKeys = (0 until 4).map { b =>
      val slice = (0 until 3).map(r => s"h${b * 3 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $slice)) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${shingleCte(3, "sh3_raw")},
      |sh3 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh3_raw),
      |sig AS (
      |  SELECT doc_id,
      |    $mins
      |  FROM sh3 GROUP BY doc_id),
      |bk AS (
      |  $bandKeys),
      |ok AS (
      |  SELECT band, band_key FROM bk
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkc AS (SELECT bk.* FROM bk JOIN ok USING (band, band_key)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkc a JOIN bkc b ON a.band = b.band AND a.band_key = b.band_key
      |    AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
      |common AS (
      |  SELECT p.a_id, p.b_id, count(*) AS common
      |  FROM pairs p
      |  JOIN sh3 x ON x.doc_id = p.a_id
      |  JOIN sh3 y ON y.doc_id = p.b_id AND y.shingle = x.shingle
      |  GROUP BY 1, 2)
      |SELECT c.a_id, c.b_id, c.common, ca.n AS na, cb.n AS nb,
      |  CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) AS jaccard
      |FROM common c
      |JOIN cnt ca ON ca.doc_id = c.a_id
      |JOIN cnt cb ON cb.doc_id = c.b_id
      |WHERE CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin
  }

  /** [[graft.operators.Dedup.editDistanceNearDups]] over documents:
    * LSH-banded candidates verified by character-level Levenshtein,
    * kept when the distance is ≤ 5% of the longer text — the
    * minor-edit near-identical detector. Both engines compute full
    * Levenshtein (identical DP semantics over these ASCII texts), and
    * the ratio cut `dist ≤ floor(0.05·max_len)` is one exact IEEE
    * multiply + floor in each.
    */
  def editDistance(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.editDistanceNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, maxDistRatio = 0.05)
      .pairs.orderBy(col("a_id"), col("b_id"))

  def editDistanceSql: String = {
    val mins = (0 until 12).map(i =>
      s"min(('0x' || substr(md5(concat_ws('|', $i, shingle)), 1, 15))::BIGINT) AS h$i")
      .mkString(",\n    ")
    val bandKeys = (0 until 4).map { b =>
      val slice = (0 until 3).map(r => s"h${b * 3 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $slice)) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${shingleCte(3, "sh3_raw")},
      |sh3 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh3_raw),
      |sig AS (
      |  SELECT doc_id,
      |    $mins
      |  FROM sh3 GROUP BY doc_id),
      |bk AS (
      |  $bandKeys),
      |ok AS (
      |  SELECT band, band_key FROM bk
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkc AS (SELECT bk.* FROM bk JOIN ok USING (band, band_key)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkc a JOIN bkc b ON a.band = b.band AND a.band_key = b.band_key
      |    AND a.doc_id < b.doc_id),
      |verified AS (
      |  SELECT p.a_id, p.b_id,
      |    CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
      |    CAST(greatest(len(da.text), len(db.text)) AS BIGINT) AS max_len
      |  FROM pairs p
      |  JOIN documents da ON da.doc_id = p.a_id
      |  JOIN documents db ON db.doc_id = p.b_id)
      |SELECT a_id, b_id, dist, max_len,
      |  CAST(dist AS DOUBLE) / CAST(max_len AS DOUBLE) AS edit_ratio
      |FROM verified
      |WHERE dist <= floor(0.05 * CAST(max_len AS DOUBLE))
      |ORDER BY a_id, b_id""".stripMargin
  }

  /** Transitive dup clusters over the MinHash near-dup pairs: every doc
    * in a connected cluster labeled with the cluster's min doc_id — the
    * canonicalization step a real dedup pipeline runs after pair
    * detection (keep one representative per component).
    */
  def components(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = graft.operators.Dedup.minHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    graft.operators.Dedup.connectedComponents(pairs, "a_id", "b_id")
      .orderBy(col("id"))
  }

  def componentsSql: String =
    s"""WITH RECURSIVE mh AS (
      |  SELECT a_id, b_id FROM (${minHashLshSql.replace("\n", "\n      |  ")})),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM mh
      |  UNION
      |  SELECT b_id, a_id FROM mh),
      |reach(id, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
      |SELECT id, min(lab) AS component_id
      |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Dedup capstone: per-document canonical id + kept verdict over the
    * FULL corpus (near-dup clusters collapse to their min id; everything
    * else keeps itself). `WHERE kept` IS the deduplicated corpus.
    */
  def canonicalize(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.minHashNearDups(
      docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    graft.operators.Dedup.canonicalize(docs, "doc_id", pairs, "a_id", "b_id")
      .orderBy(col("doc_id"))
  }

  def canonicalizeSql: String =
    s"""WITH RECURSIVE mh AS (
      |  SELECT a_id, b_id FROM (${minHashLshSql.replace("\n", "\n      |  ")})),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM mh
      |  UNION
      |  SELECT b_id, a_id FROM mh),
      |reach(id, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id)
      |SELECT d.doc_id,
      |  coalesce(c.component_id, d.doc_id) AS canonical_id,
      |  d.doc_id = coalesce(c.component_id, d.doc_id) AS kept
      |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Policy-driven canonicalization: per cluster, keep the LONGEST
    * member (ties to the smallest id) — "keep the best copy", not "keep
    * the first".
    */
  def canonicalizeBest(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.minHashNearDups(
      docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    graft.operators.Dedup.canonicalizeBy(docs, "doc_id", "n_chars",
        pairs, "a_id", "b_id")
      .orderBy(col("doc_id"))
  }

  def canonicalizeBestSql: String =
    s"""WITH RECURSIVE mh AS (
      |  SELECT a_id, b_id FROM (${minHashLshSql.replace("\n", "\n      |  ")})),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM mh
      |  UNION
      |  SELECT b_id, a_id FROM mh),
      |reach(id, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id),
      |reps AS (
      |  SELECT component_id, id AS rep FROM (
      |    SELECT c.component_id, c.id,
      |      row_number() OVER (PARTITION BY c.component_id
      |        ORDER BY d.n_chars DESC, c.id) AS rk
      |    FROM comp c JOIN documents d ON d.doc_id = c.id) t
      |  WHERE rk = 1)
      |SELECT d.doc_id,
      |  coalesce(r.rep, d.doc_id) AS canonical_id,
      |  d.doc_id = coalesce(r.rep, d.doc_id) AS kept
      |FROM documents d
      |LEFT JOIN comp c ON c.id = d.doc_id
      |LEFT JOIN reps r ON r.component_id = c.component_id
      |ORDER BY d.doc_id""".stripMargin

  /** Dup-cluster size histogram: how many near-dup clusters exist at
    * each size — the curator's one-glance view of corpus duplication
    * structure (a long tail of pairs vs a few megaclusters demand
    * different remediation).
    */
  def clusterStats(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = graft.operators.Dedup.minHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    graft.operators.Dedup.connectedComponents(pairs, "a_id", "b_id")
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  def clusterStatsSql: String =
    s"""WITH RECURSIVE mh AS (
      |  SELECT a_id, b_id FROM (${minHashLshSql.replace("\n", "\n      |  ")})),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM mh
      |  UNION
      |  SELECT b_id, a_id FROM mh),
      |reach(id, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id),
      |sizes AS (
      |  SELECT component_id, count(*) AS cluster_size
      |  FROM comp GROUP BY component_id)
      |SELECT cluster_size, count(*) AS n_clusters
      |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Intra-corpus span duplication: per doc, the count and ratio of its
    * word 5-gram spans that appear in at least one other document.
    */
  def spanOverlap(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.spanOverlap(
      tbl(spark, sfDir, "documents"), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))

  def spanOverlapSql: String =
    s"""WITH ${shingleCte(5, "sho_raw")},
      |sho AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sho_raw),
      |span_docs AS (SELECT shingle, count(*) AS n_docs FROM sho GROUP BY shingle)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS dup_ratio
      |FROM sho JOIN span_docs USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Production (xxhash64) flavor of minHashLsh — bench-only: xxhash64 is
    * Spark-specific so no cross-engine oracle exists; correctness is
    * covered by DedupSpec asserting it finds the same verified pairs as
    * the portable flavor (the exact-Jaccard verify makes final results
    * hash-independent given equal candidate recall).
    */
  def minHashLshFast(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.minHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5,
      portable = false)
      .orderBy(col("a_id"), col("b_id"))

  /** Decontamination report: docs (doc_id % 7 ≠ 0, the "training"
    * corpus) sharing any word 5-gram with the probe set (doc_id % 7 =
    * 0, the stand-in "eval" set), with the count of shared 5-grams.
    */
  def decontaminateReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.contaminationReport(
      docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  def decontaminateReportSql: String =
    s"""WITH ${shingleCte(5, "sh5_raw")},
      |sh5 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh5_raw),
      |corpus_sh AS (SELECT * FROM sh5 WHERE doc_id % 7 <> 0),
      |probe_sh AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 7 = 0)
      |SELECT doc_id, count(*) AS n_hits
      |FROM corpus_sh JOIN probe_sh USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The decontamination REMOVAL half ([[decontaminateReport]] finds the
    * leaks, this emits the cleaned training corpus): corpus docs minus
    * every doc sharing any word 5-gram with the eval probe set, each
    * surviving doc witnessed by its content hash.
    */
  def decontaminateClean(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Dedup.decontaminate(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", n = 5)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .orderBy(col("doc_id"))
  }

  def decontaminateCleanSql: String =
    s"""WITH ${shingleCte(5, "sh5c_raw")},
      |sh5c AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh5c_raw),
      |probe_sh AS (SELECT DISTINCT shingle FROM sh5c WHERE doc_id % 7 = 0),
      |contaminated AS (
      |  SELECT DISTINCT doc_id FROM sh5c
      |  WHERE doc_id % 7 <> 0 AND shingle IN (SELECT shingle FROM probe_sh))
      |SELECT d.doc_id, md5(d.text) AS content_hash
      |FROM documents d
      |WHERE d.doc_id % 7 <> 0
      |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      |ORDER BY doc_id""".stripMargin

  /** Per-doc 32-bit SimHash + identical-signature dup groups. */
  def simHash(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.simHashGroups(
      graft.operators.Dedup.simHash(
        tbl(spark, sfDir, "documents"), "doc_id", "text"), "doc_id")
      .orderBy(col("doc_id"))

  /** DuckDB CTE chain ending in `sh(doc_id, simhash)` — must mirror
    * operators.Dedup.simHash exactly. `src` swaps in a post-CDC corpus
    * view for the maintained-index gates.
    */
  private def simhashSigCtes(src: String = "documents"): String = {
    val sums = (1 to 32).map(j =>
      s"sum(CASE WHEN substr(th, $j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS s$j")
      .mkString(",\n    ")
    val bits = (1 to 32).map(j =>
      s"CASE WHEN s$j * 2 > n_tok THEN '1' ELSE '0' END").mkString(" || ")
    s"""toks AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS tok
      |  FROM $src AS __docs),
      |hashed AS (SELECT doc_id, md5(tok) AS th FROM toks),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_tok,
      |    $sums
      |  FROM hashed GROUP BY doc_id),
      |sh AS (SELECT doc_id, $bits AS simhash FROM agg)""".stripMargin
  }

  def simHashSql: String =
    s"""WITH ${simhashSigCtes()}
      |SELECT doc_id, simhash,
      |  min(doc_id) OVER (PARTITION BY simhash) AS canonical_id,
      |  count(*) OVER (PARTITION BY simhash) AS group_size,
      |  doc_id <> min(doc_id) OVER (PARTITION BY simhash) AS is_dup
      |FROM sh ORDER BY doc_id""".stripMargin

  /** Banded SimHash near-dups: Hamming ≤ 3 over 32-bit signatures,
    * 4 bands of 8 bits — exact recall by pigeonhole (bands > maxHamming).
    */
  def simHashNearDups(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.simHashNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text")
      .orderBy(col("a_id"), col("b_id"))

  /** Oversized-bucket REPORT for the banded-simhash detector at a low
    * cap (maxBucket = 100): which band buckets were excluded from pair
    * generation and how big they were. This is the recall-loss audit a
    * 100 TB run reads before trusting the pair set — real corpora skew
    * hard (at sf0.01 one band bucket holds 421 of 500 docs), so the
    * report is non-empty on the shipped test data by construction.
    */
  def simHashOversized(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.simHashNearDupsReport(
      tbl(spark, sfDir, "documents"), "doc_id", "text", maxBucket = 100)
      .oversizedBuckets
      .orderBy(col("band"), col("band_key"))

  def simHashOversizedSql: String = {
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, substr(simhash, ${b * 8 + 1}, 8) AS band_key FROM sh")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${simhashSigCtes()},
      |bk AS (
      |  $bandSelects)
      |SELECT band, band_key, count(*) AS bucket_size
      |FROM bk GROUP BY band, band_key
      |HAVING count(*) > 100
      |ORDER BY band, band_key""".stripMargin
  }

  def simHashNearDupsSql: String = {
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, substr(simhash, ${b * 8 + 1}, 8) AS band_key FROM sh")
      .mkString("\n  UNION ALL\n  ")
    val ham = (1 to 32).map(i =>
      s"CASE WHEN substr(x.simhash, $i, 1) <> substr(y.simhash, $i, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${simhashSigCtes()},
      |bk AS (
      |  $bandSelects),
      |ok AS (
      |  SELECT band, band_key FROM bk
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkc AS (SELECT bk.* FROM bk JOIN ok USING (band, band_key)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkc a JOIN bkc b ON a.band = b.band AND a.band_key = b.band_key
      |    AND a.doc_id < b.doc_id)
      |SELECT p.a_id, p.b_id, $ham AS hamming
      |FROM pairs p
      |JOIN sh x ON x.doc_id = p.a_id
      |JOIN sh y ON y.doc_id = p.b_id
      |WHERE $ham <= 3
      |ORDER BY p.a_id, p.b_id""".stripMargin
  }

  /** N-gram Jaccard near-dups: exact word-5-gram blocking, Jaccard ≥ 0.5
    * over word 3-grams.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.ngramJaccardNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      blockN = 5, shingleN = 3, threshold = 0.5)
      .orderBy(col("a_id"), col("b_id"))

  /** Production (xxhash64-blocked) flavor of ngramJaccard — bench-only,
    * same rationale as minHashLshFast.
    */
  def ngramJaccardFast(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.ngramJaccardNearDups(
      tbl(spark, sfDir, "documents"), "doc_id", "text",
      blockN = 5, shingleN = 3, threshold = 0.5, portable = false)
      .orderBy(col("a_id"), col("b_id"))

  def ngramJaccardSql: String =
    s"""WITH ${shingleCte(5, "sh5_raw")},
      |${shingleCte(3, "sh3_raw")},
      |sh5 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh5_raw),
      |sh3 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh3_raw),
      |ok5 AS (
      |  SELECT shingle FROM sh5
      |  GROUP BY shingle HAVING count(*) <= 1000),
      |sh5c AS (SELECT sh5.* FROM sh5 JOIN ok5 USING (shingle)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh5c a JOIN sh5c b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
      |common AS (
      |  SELECT p.a_id, p.b_id, count(*) AS common
      |  FROM pairs p
      |  JOIN sh3 x ON x.doc_id = p.a_id
      |  JOIN sh3 y ON y.doc_id = p.b_id AND y.shingle = x.shingle
      |  GROUP BY 1, 2)
      |SELECT c.a_id, c.b_id, c.common, ca.n AS na, cb.n AS nb,
      |  CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) AS jaccard
      |FROM common c
      |JOIN cnt ca ON ca.doc_id = c.a_id
      |JOIN cnt cb ON cb.doc_id = c.b_id
      |WHERE CAST(c.common AS DOUBLE) / CAST(ca.n + cb.n - c.common AS DOUBLE) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** Duplicated-span removal as a declared op (word 5-grams, the
    * [[spanOverlap]] width): positions covered by any cross-document
    * 5-gram are cut and the survivors re-joined — the ExactSubstr
    * removal move at word granularity, with the cleaned text itself
    * oracle-checked (not just the counts).
    */
  def spanDedupClean(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup.spanDedupClean(
      tbl(spark, sfDir, "documents"), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))

  def spanDedupCleanSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id, i AS q,
      |    ('0x' || substr(md5(CASE WHEN len(t) < 5
      |      THEN array_to_string(t, ' ')
      |      ELSE array_to_string(t[i:i+4], ' ') END), 1, 15))::BIGINT AS shingle
      |  FROM (SELECT doc_id, t,
      |          unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS i
      |        FROM toks)),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM occ),
      |dup AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
      |cov AS (
      |  SELECT DISTINCT o.doc_id, o.q + d.o AS p
      |  FROM occ o JOIN dup USING (shingle)
      |  CROSS JOIN (SELECT CAST(t.o AS BIGINT) AS o
      |    FROM UNNEST(range(0, 5)) t(o)) d),
      |words AS (
      |  SELECT doc_id, i AS p, t[i] AS w
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
      |        FROM toks)),
      |kept AS (
      |  SELECT w.doc_id, w.p, w.w FROM words w
      |  ANTI JOIN cov c ON c.doc_id = w.doc_id AND c.p = w.p),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(w, ' ' ORDER BY p) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_words,
      |  CAST(len(tk.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(a.clean_text, '') AS clean_text
      |FROM toks tk LEFT JOIN agg a USING (doc_id)
      |ORDER BY tk.doc_id""".stripMargin

  private val BloomK = 4
  private val BloomM = 16384

  /** Bloom-filter incremental exact-dedup probe: the even-doc_id corpus
    * is distilled to a ≤[[BloomM]]-bit membership sketch
    * ([[graft.operators.Sketches.bloomBits]]) and the odd batch probes
    * ONLY the sketch — the corpus never re-scans at probe time, and the
    * bit table broadcasts at any corpus size (the pre-filter a 100 TB
    * pipeline runs before the exact [[incrementalExact]] join). Each
    * batch doc gets a three-way verdict: `new` (bloom miss — PROVABLY
    * absent, Bloom filters have no false negatives), `dup_of_existing`
    * (hit and truly present), or `false_positive` (hit but absent —
    * the priced-in error the m/k sizing controls; the truth join here
    * exists to gate that taxonomy, production would skip it or pass
    * hits to the exact probe). Deterministic md5 bit positions, so the
    * whole sketch — including which docs false-positive — is
    * oracle-exact.
    */
  def incrementalBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val eh = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("content_hash")).distinct()
    val bits = graft.operators.Sketches.bloomBits(
      eh, "content_hash", k = BloomK, m = BloomM)
    val nh = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
    val probed = graft.operators.Sketches.bloomProbe(
      nh, "doc_id", "content_hash", bits, k = BloomK, m = BloomM)
    probed
      .join(eh.withColumn("_seen", lit(true)), Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        when(!col("bloom_hit"), lit("new"))
          .when(col("_seen"), lit("dup_of_existing"))
          .otherwise(lit("false_positive")).as("verdict"))
      .orderBy(col("doc_id"))
  }

  def incrementalBloomSql: String =
    s"""WITH eh AS (
      |  SELECT DISTINCT md5(text) AS content_hash
      |  FROM documents WHERE doc_id % 2 = 0),
      |rs AS (SELECT CAST(t.r AS BIGINT) AS r
      |  FROM UNNEST(range(0, $BloomK)) t(r)),
      |bits AS (
      |  SELECT DISTINCT
      |    ('0x' || substr(md5(concat_ws('|', r, content_hash)), 1, 15))::BIGINT
      |      % $BloomM AS bit
      |  FROM eh CROSS JOIN rs),
      |nh AS (
      |  SELECT doc_id, md5(text) AS content_hash
      |  FROM documents WHERE doc_id % 2 = 1),
      |probe AS (
      |  SELECT nh.doc_id, nh.content_hash, count(b.bit) AS hits
      |  FROM nh CROSS JOIN rs
      |  LEFT JOIN bits b ON b.bit =
      |    ('0x' || substr(md5(concat_ws('|', rs.r, nh.content_hash)), 1, 15))::BIGINT
      |      % $BloomM
      |  GROUP BY 1, 2)
      |SELECT p.doc_id, p.content_hash,
      |  CASE WHEN p.hits < $BloomK THEN 'new'
      |       WHEN e.content_hash IS NOT NULL THEN 'dup_of_existing'
      |       ELSE 'false_positive' END AS verdict
      |FROM probe p LEFT JOIN eh e USING (content_hash)
      |ORDER BY p.doc_id""".stripMargin

  /** Measured LSH candidate recall vs exact n-gram Jaccard, per 0.1-wide
    * Jaccard bucket (see [[graft.operators.Dedup.lshRecallReport]]) —
    * the batch-side quantified-approximation gate of the dedup family.
    *
    * The synthetic corpus only carries J >= 0.9 near-dups, which would
    * make the report a vacuous all-recall row — so (the `cdc_diff_*`
    * fixture-perturbation move) every 3rd document gets a deterministic
    * TRUNCATED TWIN keeping k/10 of its tokens (k = 3 + (id/3) mod 7):
    * prefix shingle sets give J ~= k/10, populating the whole 0.3-0.9
    * ramp where the banded-LSH s-curve actually bends. Recall numbers
    * over those buckets are the measured answer to "what does
    * 12-hash/4-band LSH dedup actually catch at J = x".
    */
  def lshRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val twins = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .filter(col("doc_id") % 3 === 0)
      .withColumn("n_keep", greatest(lit(1),
        expr("(size(t) * (3 + (doc_id div 3) % 7)) div 10")).cast("int"))
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat_ws(" ", slice(col("t"), lit(1), col("n_keep"))).as("text"))
    graft.operators.Dedup.lshRecallReport(
        docs.select(col("doc_id"), col("text")).unionByName(twins),
        "doc_id", "text")
      .orderBy(col("j_bucket"))
  }

  def lshRecallSql: String = {
    val mins = (0 until 12).map(i =>
      s"min(('0x' || substr(md5(concat_ws('|', $i, shingle)), 1, 15))::BIGINT) AS h$i")
      .mkString(",\n    ")
    val bandKeys = (0 until 4).map { b =>
      val slice = (0 until 3).map(r => s"h${b * 3 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $slice)) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH twin_src AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      |  FROM documents WHERE doc_id % 3 = 0),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id,
      |    array_to_string(t[1:greatest(1,
      |      (len(t) * (3 + (doc_id // 3) % 7)) // 10)], ' ') AS text
      |  FROM twin_src),
      |${shingleCte(5, "sh5_raw", "corpus")},
      |${shingleCte(3, "sh3_raw", "corpus")},
      |sh5 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh5_raw),
      |sh3 AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh3_raw),
      |ok5 AS (
      |  SELECT shingle FROM sh5
      |  GROUP BY shingle HAVING count(*) <= 1000),
      |sh5c AS (SELECT sh5.* FROM sh5 JOIN ok5 USING (shingle)),
      |tpairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh5c a JOIN sh5c b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
      |common AS (
      |  SELECT p.a_id, p.b_id, count(*) AS common
      |  FROM tpairs p
      |  JOIN sh3 x ON x.doc_id = p.a_id
      |  JOIN sh3 y ON y.doc_id = p.b_id AND y.shingle = x.shingle
      |  GROUP BY 1, 2),
      |truth AS (
      |  SELECT c.a_id, c.b_id,
      |    (c.common * 10) // (ca.n + cb.n - c.common) AS j_bucket
      |  FROM common c
      |  JOIN cnt ca ON ca.doc_id = c.a_id
      |  JOIN cnt cb ON cb.doc_id = c.b_id
      |  WHERE (c.common * 10) // (ca.n + cb.n - c.common) >= 3),
      |sig AS (
      |  SELECT doc_id,
      |    $mins
      |  FROM sh3 GROUP BY doc_id),
      |bk AS (
      |  $bandKeys),
      |okb AS (
      |  SELECT band, band_key FROM bk
      |  GROUP BY band, band_key HAVING count(*) <= 1000),
      |bkc AS (SELECT bk.* FROM bk JOIN okb USING (band, band_key)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bkc a JOIN bkc b ON a.band = b.band AND a.band_key = b.band_key
      |    AND a.doc_id < b.doc_id),
      |hit AS (
      |  SELECT t.j_bucket, CASE WHEN c.a_id IS NULL THEN 0 ELSE 1 END AS h
      |  FROM truth t LEFT JOIN cand c ON c.a_id = t.a_id AND c.b_id = t.b_id)
      |SELECT j_bucket, CAST(count(*) AS BIGINT) AS n_true,
      |  CAST(sum(h) AS BIGINT) AS n_hit,
      |  CAST(sum(h) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
      |FROM hit GROUP BY j_bucket
      |ORDER BY j_bucket""".stripMargin
  }
}
