package graft.queries

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Training-data pipeline operators beyond dedup/text-scoring: sequence
  * packing, deterministic stratified sampling, PII redaction and corpus
  * vocabulary — each oracle-checkable against DuckDB on the `documents`
  * table.
  */
object PipelineQueries {

  val PackBudget = 2048L

  /** Token-budget sequence packing: documents in doc_id order assigned
    * to ~2048-token bins (see operators.Packing for the scale story).
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Packing
      .packByTokenBudget(docs, "doc_id", "n_tokens", PackBudget)
      .orderBy(col("doc_id"))
  }

  def packSequencesSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM t)
      |SELECT doc_id, n_tokens, cum_before,
      |  cum_before // $PackBudget AS bin_id,
      |  cum_before % $PackBudget AS bin_offset
      |FROM c ORDER BY doc_id""".stripMargin

  val ExportShards = 8L

  /** Deterministic training-shard export manifest: every document lands
    * in a shard by content-free id hash (md5 → 60-bit long, mod shards)
    * and gets its position within the shard by hash order — a
    * reproducible global pseudo-random permutation, the final step
    * before a training run reads the corpus.
    *
    * Scale shape: shard count scales WITH the corpus (thousands at
    * 100 TB, 8 here), so the per-shard ranking window is really
    * "repartition by shard, sort within partition, write" — one shuffle
    * whose reducers are the shard files themselves; no global sort
    * anywhere.
    */
  def shardExport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h"), col("doc_id"))
    docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        PortableHash.md5Long(col("doc_id").cast("string")).as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(ExportShards)))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"), col("n_tokens"))
      .orderBy(col("shard"), col("pos"))
  }

  def shardExportSql: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
      |      AS n_tokens,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hh
      |  FROM documents)
      |SELECT hh % $ExportShards AS shard,
      |  row_number() OVER (PARTITION BY hh % $ExportShards
      |    ORDER BY hh, doc_id) AS pos,
      |  doc_id, n_tokens
      |FROM h ORDER BY shard, pos""".stripMargin

  val SamplePerStratum = 40

  /** Deterministic stratified sample: exactly N docs per language,
    * chosen by hash order (reproducible across runs and engines — the
    * ranking key is the portable 60-bit md5 of the doc id). One keyed
    * window, no global sort; the per-stratum top-N is the standard
    * rank-filter shape that scales with stratum count.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val w = Window.partitionBy(col("lang"))
      .orderBy(PortableHash.md5Long(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= SamplePerStratum)
      .orderBy(col("lang"), col("sample_rank"))
  }

  val MixBudgetRatio = 0.5

  /** Temperature-based language rebalancing — the multilingual
    * data-mixing step: per-language budgets ∝ n^α (α = 0.5, i.e.
    * sqrt — chosen over a general pow because sqrt is CORRECTLY
    * ROUNDED in IEEE 754, so budget boundaries are bit-identical in
    * any engine), capped at the language's population, with selection
    * by the same portable hash-rank as `sample_stratified`. Low-
    * resource languages keep a larger share than their raw frequency;
    * the total target is `floor(total · MixBudgetRatio)`.
    *
    * The weight normalizer is an ordered left fold over the
    * language-count-sized stats (not an unordered SUM): double
    * addition is non-associative, and the fold order is part of the
    * cross-engine contract. Scale shape: one corpus groupBy (bounded
    * output), one keyed rank window, one broadcast join — no global
    * sort, no driver materialization beyond the language stats fold.
    */
  def corpusMixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val stats = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tot = stats.agg(
      aggregate(
        transform(
          array_sort(collect_list(struct(col("lang"),
            sqrt(col("n").cast("double")).as("w")))),
          s => s.getField("w")),
        lit(0.0), (acc, v) => acc + v).as("tot_w"),
      sum(col("n")).as("total_n"))
    val targets = stats.crossJoin(tot)
      .select(col("lang"),
        least(col("n"), floor(sqrt(col("n").cast("double")) / col("tot_w")
          * floor(col("total_n").cast("double") * lit(MixBudgetRatio)))
          .cast("long")).as("lang_budget"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(PortableHash.md5Long(col("doc_id").cast("string")),
        col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w))
      .join(broadcast(targets), Seq("lang"))
      .filter(col("rk") <= col("lang_budget"))
      .select(col("doc_id"), col("lang"), col("lang_budget"))
      .orderBy(col("doc_id"))
  }

  def corpusMixTemperatureSql: String =
    s"""WITH stats AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |tot AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)),
      |      (x, y) -> x + y) AS tot_w,
      |    sum(n) AS total_n
      |  FROM stats),
      |t AS (
      |  SELECT lang,
      |    least(n, CAST(floor(sqrt(CAST(n AS DOUBLE)) / tot_w *
      |      floor(CAST(total_n AS DOUBLE) * $MixBudgetRatio)) AS BIGINT))
      |      AS lang_budget
      |  FROM stats CROSS JOIN tot),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
      |      doc_id) AS rk
      |  FROM documents)
      |SELECT r.doc_id, r.lang, t.lang_budget
      |FROM r JOIN t USING (lang) WHERE r.rk <= t.lang_budget
      |ORDER BY doc_id""".stripMargin

  def sampleStratifiedSql: String =
    s"""SELECT doc_id, lang, sample_rank FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
      |      doc_id) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= $SamplePerStratum
      |ORDER BY lang, sample_rank""".stripMargin

  // shared by the Spark and DuckDB sides: Java regex and RE2 agree on
  // these subsets (plain classes, greedy quantifiers, no alternation)
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhoneRe = "\\+[0-9][0-9\\-]{6,}[0-9]"

  /** PII redaction: scrub emails / IPv4s / phone-like tokens, reporting
    * per-document counts and the digest of the scrubbed text. The corpus
    * is synthetic (no real PII), so each doc gets a deterministic PII
    * suffix injected first — the scrub itself is the operator under
    * test, a single codegen'd regexp_replace chain at scan speed.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com via 10.0."),
      pmod(col("doc_id"), lit(256)), lit(".7 tel +1-555-010-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(aug, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(aug, lit(EmailRe), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(aug, lit(Ipv4Re), lit(0))).cast("long")
        .as("n_ips"),
      size(regexp_extract_all(aug, lit(PhoneRe), lit(0))).cast("long")
        .as("n_phones"),
      md5(redacted).as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  def piiRedactSql: String =
    s"""WITH base AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |    '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |    '.7 tel +1-555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      AS aug
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(aug, '$Ipv4Re')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
      |    '$EmailRe', '<EMAIL>', 'g'),
      |    '$Ipv4Re', '<IP>', 'g'),
      |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_hash
      |FROM base ORDER BY doc_id""".stripMargin

  val ChunkTokens = 64
  val ChunkOverlap = 16

  /** Tokenizer-window document chunking: split each document into
    * ~`ChunkTokens`-token chunks with `ChunkOverlap`-token overlap (the
    * standard RAG/packing pre-step). Pure per-row explode — no shuffle
    * at all until the output sort; at 100 TB this is scan-speed.
    *
    * Chunk starts stride by (chunk - overlap); the last chunk is the
    * final full-or-partial window and short docs yield exactly one.
    */
  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val stride = ChunkTokens - ChunkOverlap
    val docs = tbl(spark, sfDir, "documents")
    // number of chunks = 1 + ceil(max(n - chunk, 0) / stride), in pure
    // integer arithmetic (DIV, matching the oracle's `//`)
    val nChunks = lit(1) + expr(
      s"(greatest(size(_toks) - $ChunkTokens, 0) + ${stride - 1}) DIV $stride")
      .cast("int")
    docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0), nChunks - lit(1))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("_toks"), col("chunk_id") * stride + lit(1),
          lit(ChunkTokens))).as("chunk_text"),
        least(size(col("_toks")) - col("chunk_id") * stride, lit(ChunkTokens))
          .cast("long").as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val CdcChunkDivisor = 8

  /** Content-defined chunking (the FastCDC idea at word granularity):
    * a chunk boundary falls AFTER every word whose portable 60-bit hash
    * is ≡ 0 mod [[CdcChunkDivisor]] — so boundaries are a function of
    * CONTENT, not position, and an insertion reshuffles only the chunks
    * it touches (fixed windows shift every later chunk). That makes the
    * emitted `chunk_hash` directly joinable for chunk-level exact dedup
    * across edited near-duplicate documents. Mean chunk length is the
    * divisor. One narrow explode + ONE shuffle (the per-document
    * running-sum window, keyed and bounded by doc length) + the rebuild
    * groupBy on the same key — no global window anywhere.
    */
  /** CDC chunk table (doc_id, chunk_id, n_tokens, chunk_hash) for any
    * (doc_id, text) frame — extracted from the declared query so specs
    * can pin the content-defined property (a suffix edit leaves every
    * earlier chunk's hash unchanged) on synthetic edits.
    */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text")))
        .as(Seq("pos", "word")))
    val flagged = words.withColumn("b",
      when(pmod(PortableHash.md5Long(col("word")),
        lit(CdcChunkDivisor)) === 0, 1).otherwise(0))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("chunk_id",
        coalesce(sum(col("b")).over(w), lit(0)).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")), " ")).as("chunk_hash"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_hash"))
  }

  def chunkDocumentsCdc(spark: SparkSession, sfDir: String): DataFrame =
    cdcChunks(tbl(spark, sfDir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id"))

  def chunkDocumentsCdcSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i] AS word
      |  FROM t, UNNEST(range(1, len(toks) + 1)) u(i)),
      |f AS (
      |  SELECT doc_id, pos, word,
      |    CASE WHEN ('0x' || substr(md5(word), 1, 15))::BIGINT
      |      % $CdcChunkDivisor = 0 THEN 1 ELSE 0 END AS b
      |  FROM w),
      |c AS (
      |  SELECT doc_id, pos, word,
      |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS chunk_id
      |  FROM f)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(list(word ORDER BY pos), ' ')) AS chunk_hash
      |FROM c GROUP BY doc_id, chunk_id
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Cross-document EXACT chunk dedup over the content-defined chunks
    * (the RefinedWeb/CCNet move: near-dup docs share exact paragraphs
    * long before whole-doc hashes collide, and CDC boundaries make the
    * shared spans hash-identical regardless of surrounding edits). Per
    * chunk occurrence: is it the canonical (first by (doc_id,
    * chunk_id)) holder of its hash, who is, and how many occurrences
    * the hash has corpus-wide. Canonical selection packs (doc_id,
    * chunk_id) into ONE BIGINT (`doc_id·2^20 + chunk_id` — exact while
    * chunks-per-doc < 2^20; a wider pack is the 100 TB follow-up) so
    * the argmin stays a primitive-key `min` in whole-stage codegen in
    * both engines, the same trick as the IVF assignment argmax. Scale
    * shape: ONE shuffle on chunk_hash (partial-agg'd), one hash join
    * back — no corpus-sized window, no driver state.
    */
  def dedupChunks(spark: SparkSession, sfDir: String): DataFrame = {
    // a chunk_id at/after 2^20 would silently cross-wire the canonical
    // pack — fail the row instead (codegen'd, no extra pass)
    val keyed = chunkDocumentsCdc(spark, sfDir)
      .withColumn("_ok", assert_true(col("chunk_id") < lit(1048576L),
        lit("chunk_id overflows the canonical (doc, chunk) pack")))
      .withColumn("ck", col("doc_id") * lit(1048576L) + col("chunk_id"))
      .drop("_ok")
    val canon = keyed.groupBy(col("chunk_hash"))
      .agg(min(col("ck")).as("canon_ck"),
        count(lit(1)).as("n_occurrences"))
    keyed.join(canon, Seq("chunk_hash"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        (col("ck") =!= col("canon_ck")).as("dup"),
        expr("canon_ck div 1048576").as("canon_doc_id"),
        pmod(col("canon_ck"), lit(1048576L)).as("canon_chunk_id"),
        col("n_occurrences"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def dedupChunksSql: String =
    s"""WITH ch AS (SELECT * FROM (
      |${chunkDocumentsCdcSql}
      |) chq),
      |k AS (
      |  SELECT *, doc_id * 1048576 + chunk_id AS ck FROM ch),
      |g AS (
      |  SELECT chunk_hash, min(ck) AS canon_ck,
      |    count(*) AS n_occurrences
      |  FROM k GROUP BY chunk_hash)
      |SELECT k.doc_id, k.chunk_id, k.n_tokens,
      |  k.ck <> g.canon_ck AS dup,
      |  CAST(g.canon_ck // 1048576 AS BIGINT) AS canon_doc_id,
      |  CAST(g.canon_ck % 1048576 AS BIGINT) AS canon_chunk_id,
      |  CAST(g.n_occurrences AS BIGINT) AS n_occurrences
      |FROM k JOIN g USING (chunk_hash)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** [[dedupChunks]]' incremental half — the daily-batch pattern at
    * chunk granularity: the even-doc_id half plays the existing corpus,
    * the odd half the arriving batch, and every batch chunk gets a
    * verdict — `dup_vs_corpus` when its hash already exists in the
    * corpus chunk set, else `dup_in_batch` when a lower (doc, chunk)
    * batch occurrence holds it, else new. Same economics as the
    * full-corpus form (one hash shuffle, no corpus text rescan when the
    * corpus side is a stored chunk-hash table) with the verdict split
    * the text incremental family uses.
    */
  def dedupChunksIncremental(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val corpusHashes = cdcChunks(docs.filter(col("doc_id") % 2 === 0))
      .select(col("chunk_hash")).distinct()
    val batch = cdcChunks(docs.filter(col("doc_id") % 2 === 1))
      .withColumn("ck", col("doc_id") * lit(1048576L) + col("chunk_id"))
    val firstInBatch = batch.groupBy(col("chunk_hash"))
      .agg(min(col("ck")).as("first_ck"))
    batch.join(corpusHashes.withColumn("in_corpus", lit(true)),
        Seq("chunk_hash"), "left")
      .join(firstInBatch, Seq("chunk_hash"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        when(col("in_corpus"), lit("dup_vs_corpus"))
          .when(col("ck") =!= col("first_ck"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("verdict"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def dedupChunksIncrementalSql: String = {
    def chunkSqlFor(pred: String): String = {
      val base = chunkDocumentsCdcSql
      require(base.contains("FROM documents)"),
        "chunk oracle lost its source clause")
      // scope BOTH the tokenizer scan and the final regroup to the half
      base.replace("FROM documents)", s"FROM documents WHERE $pred)")
    }
    s"""WITH corpus AS (
      |  SELECT DISTINCT chunk_hash FROM (
      |${chunkSqlFor("doc_id % 2 = 0")}
      |  ) cq),
      |batch AS (
      |  SELECT *, doc_id * 1048576 + chunk_id AS ck FROM (
      |${chunkSqlFor("doc_id % 2 = 1")}
      |  ) bq),
      |fb AS (
      |  SELECT chunk_hash, min(ck) AS first_ck
      |  FROM batch GROUP BY chunk_hash)
      |SELECT b.doc_id, b.chunk_id, b.n_tokens,
      |  CASE WHEN c.chunk_hash IS NOT NULL THEN 'dup_vs_corpus'
      |    WHEN b.ck <> fb.first_ck THEN 'dup_in_batch'
      |    ELSE 'new' END AS verdict
      |FROM batch b
      |LEFT JOIN corpus c USING (chunk_hash)
      |JOIN fb USING (chunk_hash)
      |ORDER BY doc_id, chunk_id""".stripMargin
  }

  def chunkDocumentsSql: String = {
    val stride = ChunkTokens - ChunkOverlap
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    1 + (greatest(len(toks) - $ChunkTokens, 0) + ${stride - 1}) // $stride
      |      AS n_chunks
      |  FROM t)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |  array_to_string(toks[i*$stride + 1 : i*$stride + $ChunkTokens],
      |    ' ') AS chunk_text,
      |  CAST(least(n - i*$stride, $ChunkTokens) AS BIGINT) AS chunk_tokens
      |FROM n, UNNEST(range(0, n_chunks)) AS u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin
  }

  val TfIdfK = 5

  /** Top-K terms per document by TF-IDF — the classic relevance scoring
    * over the corpus: one token-count aggregation (partial-agg
    * friendly), document frequencies from the same table, a broadcast
    * idf join (vocab is naturally bounded — tens of MB even at corpus
    * scale), and a keyed window for the per-doc top-K.
    *
    * Rational idf (`N / df`, no log damping): `score = (tf * N) / df` as
    * ONE IEEE double division of exactly-representable integers —
    * division is correctly rounded, so Spark and any oracle get the
    * same bits. (`ln`-based idf is a 1-ulp libm lottery across engines;
    * see the oracle-parity rules.) Ranking per document is the same
    * monotone order in tf/df.
    */
  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    // one tiny job, memoized per (plan, snapshot) — it still ran once
    // per CONSTRUCTION (every bench rep) before r21
    val nDocs: Long = graft.plans.CachedPlans.memoValue(
      "n_docs", docs)(java.lang.Long.valueOf(docs.count())).longValue
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df")) // tf rows are distinct (doc, tok)
    val scored = tf.join(broadcast(df_), Seq("tok"))
      .withColumn("score",
        (col("tf") * lit(nDocs)).cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfIdfK)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  def tfidfTopKSql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(list_filter(string_split_regex(lower(text), '\\s+'),
      |            x -> x <> '')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      |  FROM tf JOIN df USING (tok), n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, tok) AS rnk
      |  FROM scored)
      |SELECT doc_id, tok, tf, df, score, rnk
      |FROM ranked WHERE rnk <= $TfIdfK
      |ORDER BY doc_id, rnk""".stripMargin

  val VocabK = 100

  /** Corpus vocabulary: top-K tokens by frequency (ties broken by token
    * text). Explode + partial-agg groupBy + global top-K — the final
    * LIMIT sees one row per distinct token ABOVE the cut, not the corpus.
    */
  def vocabTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    docs.select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(VocabK)
  }

  def vocabTopKSql: String =
    s"""WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
      |    x -> x <> '')) AS tok
      |  FROM documents)
      |SELECT tok, CAST(count(*) AS BIGINT) AS n
      |FROM toks GROUP BY tok
      |ORDER BY n DESC, tok LIMIT $VocabK""".stripMargin

  /** Corpus data card: the one-stop per-language report a training run
    * documents its mixture with — document/char/word totals, exact
    * distinct-content count (md5 — the exact-dedup rate), and corpus
    * share. One scan + one keyed aggregate + a broadcast total; every
    * column is an exact integer except the one `share` division.
    */
  def corpusDatacard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val t = docs.select(col("lang"), col("n_chars"), md5(col("text")).as("h"),
      size(TextFunctions.tokens(lower(col("text")))).as("n_words"))
    val per = t.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("sum_chars"),
      sum(col("n_words")).as("sum_words"),
      countDistinct(col("h")).as("n_distinct"))
    val tot = broadcast(per.agg(sum(col("n_docs")).as("total_docs")))
    per.crossJoin(tot)
      .select(col("lang"), col("n_docs"), col("sum_chars"), col("sum_words"),
        col("n_distinct"), (col("n_docs") - col("n_distinct")).as("dup_docs"),
        (col("n_docs").cast(DoubleType) / col("total_docs").cast(DoubleType))
          .as("share"))
      .orderBy(col("lang"))
  }

  def corpusDatacardSql: String =
    """WITH t AS (
      |  SELECT lang, n_chars, md5(text) AS h,
      |    len(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> x <> '')) AS n_words
      |  FROM documents),
      |per AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST(sum(n_words) AS BIGINT) AS sum_words,
      |    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
      |  FROM t GROUP BY lang),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM per)
      |SELECT lang, n_docs, sum_chars, sum_words, n_distinct,
      |  n_docs - n_distinct AS dup_docs,
      |  CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE) AS share
      |FROM per CROSS JOIN tot ORDER BY lang""".stripMargin

  private val IwBuckets = 64
  private val IwScale = 10000.0
  private val IwTargetLang = "en"

  /** DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169):
    * score every document by how much its hashed-unigram distribution
    * resembles a target slice (here lang='en') relative to the whole
    * corpus, then bucket the ranking into terciles — the reweighting
    * step that precedes importance resampling.
    *
    * Hashed n-gram features: each word maps to one of 64 buckets via the
    * portable md5-derived hash, so the feature space is fixed-size at any
    * corpus scale. Per-word contribution is the add-one-smoothed
    * likelihood ratio (cnt_t+1)(R+64) / ((cnt_r+1)(T+64)), quantized to
    * an integer (floor ×10⁴) so per-doc sums are order-independent — the
    * published log-space weight is swapped for this rational form because
    * ln() is not bit-reproducible across engines while IEEE ×,÷,floor
    * are. Shape: one explode, one 64-row bucket aggregate (broadcast
    * back), one per-doc sum — no shuffle grows with the corpus beyond
    * the word groupBys.
    */
  def importanceWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    // ONE corpus explode, immediately collapsed to per-(doc, bucket)
    // counts (map-side combinable, ≤64 rows per doc) — both the 64-row
    // bucket stats and the per-doc sums derive from this compact
    // intermediate, so the corpus text is scanned and tokenized once
    val docBuckets = graft.plans.CachedPlans.cached(
      docs.select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(lower(col("text")))).as("w"))
        .withColumn("bucket",
          pmod(PortableHash.md5Long(col("w")), lit(IwBuckets.toLong)))
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n")))
    val stats = docBuckets.groupBy(col("bucket")).agg(
      sum(when(col("lang") === IwTargetLang, col("n")).otherwise(0L))
        .as("cnt_t"),
      sum(col("n")).as("cnt_r"))
    val totals = broadcast(stats.agg(
      sum(col("cnt_t")).as("tt"), sum(col("cnt_r")).as("rr")))
    // bucket-level quantized likelihood ratio: 64 rows, broadcast back
    val bucketQ = broadcast(stats.crossJoin(totals).select(col("bucket"),
      floor((col("cnt_t") + 1).cast(DoubleType) *
          (col("rr") + IwBuckets).cast(DoubleType) /
          ((col("cnt_r") + 1).cast(DoubleType) *
            (col("tt") + IwBuckets).cast(DoubleType)) * IwScale)
        .cast("long").as("q")))
    val perDoc = docBuckets.join(bucketQ, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"), sum(col("q") * col("n")).as("iw_q"))
      .withColumn("iw_score",
        col("iw_q").cast(DoubleType) / col("n_words").cast(DoubleType) /
          IwScale)
    val nRow = broadcast(perDoc.select(count(lit(1)).as("nn")))
    graft.operators.Packing
      .globalRank(perDoc, "rn", col("iw_score").desc, col("doc_id"))
      .crossJoin(nRow)
      .withColumn("tercile", expr("CAST(1 + ((rn - 1) * 3) DIV nn AS INT)"))
      .select(col("doc_id"), col("n_words"), col("iw_q"), col("iw_score"),
        col("tercile"))
      .orderBy(col("doc_id"))
  }

  def importanceWeightsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |words AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $IwBuckets AS bucket
      |  FROM (SELECT doc_id, lang, unnest(t) AS w FROM toks)),
      |stats AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN lang = '$IwTargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
      |    CAST(count(*) AS BIGINT) AS cnt_r
      |  FROM words GROUP BY bucket),
      |totals AS (
      |  SELECT CAST(sum(cnt_t) AS BIGINT) AS tt,
      |    CAST(sum(cnt_r) AS BIGINT) AS rr
      |  FROM stats),
      |bucket_q AS (
      |  SELECT bucket,
      |    CAST(floor(CAST(cnt_t + 1 AS DOUBLE) * CAST(rr + $IwBuckets AS DOUBLE)
      |      / (CAST(cnt_r + 1 AS DOUBLE) * CAST(tt + $IwBuckets AS DOUBLE))
      |      * $IwScale) AS BIGINT) AS q
      |  FROM stats CROSS JOIN totals),
      |per_doc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(q) AS BIGINT) AS iw_q
      |  FROM words JOIN bucket_q USING (bucket)
      |  GROUP BY doc_id),
      |final AS (
      |  SELECT doc_id, n_words, iw_q,
      |    CAST(iw_q AS DOUBLE) / CAST(n_words AS DOUBLE) / $IwScale AS iw_score
      |  FROM per_doc),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY iw_score DESC, doc_id) AS rn,
      |    count(*) OVER () AS nn
      |  FROM final)
      |SELECT doc_id, n_words, iw_q, iw_score,
      |  CAST(1 + ((rn - 1) * 3) // nn AS INTEGER) AS tercile
      |FROM ranked ORDER BY doc_id""".stripMargin

  /** End-to-end curation capstone — the whole pipeline as ONE declared
    * plan, staged the way a production corpus build runs it:
    *
    *   1. C4 quality filter (the `text_quality_filter` rules) — verdicts
    *      for every document, survivors continue;
    *   2. MinHash near-dup canonicalization OVER THE SURVIVORS ONLY
    *      (the `dedup_canonicalize` machinery; pair detection never
    *      touches quality-rejected docs — stage order is part of the
    *      semantics and of the cost at 100 TB);
    *   3. token counts + deterministic shard assignment for the final
    *      keepers (the `shard_export` hash).
    *
    * One row per ORIGINAL document: the quality verdict, the canonical
    * id within the surviving slice (NULL when quality-rejected), the
    * final keep verdict, and the keeper-only token/shard columns. The
    * oracle replays all three stages in one WITH-chain, so stage
    * INTERACTION (filter-then-dedup, dedup-then-shard) is hash-gated,
    * not just each stage alone. Plan shape: each stage is the same plan
    * its standalone query runs, over a smaller input; nothing here adds
    * a shuffle the stages don't already have.
    */
  def pipelineE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    // the quality verdicts and the survivor slice each feed multiple
    // downstream stages; without sharing, every consumer re-expands the
    // whole tokenize-and-judge subplan (7 documents scans at round 10).
    // CachedPlans persists each ONCE — the same materialize-the-stage
    // choice a production corpus build makes before fanning out, and
    // PlanShapeSpec pins the resulting scan count so a regression back
    // to per-consumer recompute fails CI.
    val quality = graft.plans.CachedPlans.cached(
      TextQueries.qualityFilter(spark, sfDir)
        .select(col("doc_id"), col("verdict").as("q_verdict")))
    val surv = graft.plans.CachedPlans.cached(docs.join(
      quality.filter(col("q_verdict") === "kept").select(col("doc_id")),
      Seq("doc_id")))
    val pairs = graft.operators.Dedup.minHashNearDups(
      surv, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    val canon = graft.operators.Dedup.canonicalize(
      surv, "doc_id", pairs, "a_id", "b_id")
      .select(col("doc_id"), col("canonical_id"),
        col("kept").as("dedup_kept"))
    val keepers = canon.filter(col("dedup_kept"))
      .join(surv.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(PortableHash.md5Long(col("doc_id").cast("string")),
          lit(ExportShards)).as("shard"))
    quality
      .join(canon.drop("dedup_kept"), Seq("doc_id"), "left")
      .join(keepers, Seq("doc_id"), "left")
      .withColumn("final_kept",
        col("q_verdict") === "kept" && col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("q_verdict"), col("canonical_id"),
        col("final_kept"), col("n_tokens"), col("shard"))
      .orderBy(col("doc_id"))
  }

  def pipelineE2eSql: String = {
    // stage 2 runs over the quality survivors: re-point the embedded
    // minhash pipeline's one corpus reference at the surv CTE
    val mh = {
      val sql = graft.queries.DedupQueries.minHashLshSql
      require(sql.contains("FROM documents"),
        "minhash SQL lost its corpus reference; surv rewrite would no-op")
      sql.replace("FROM documents", "FROM surv")
    }
    s"""WITH RECURSIVE q AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |qual AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) < 25 THEN 'too_short'
      |         WHEN len(toks) > 90 THEN 'too_long'
      |         WHEN CAST(len(list_distinct(toks)) AS DOUBLE)
      |              / CAST(len(toks) AS DOUBLE) < 0.45 THEN 'low_diversity'
      |         ELSE 'kept' END AS q_verdict
      |  FROM q),
      |surv AS (
      |  SELECT d.* FROM documents d
      |  JOIN qual ON qual.doc_id = d.doc_id AND qual.q_verdict = 'kept'),
      |mh AS (
      |  SELECT a_id, b_id FROM (${mh.replace("\n", "\n      |  ")})),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM mh
      |  UNION
      |  SELECT b_id, a_id FROM mh),
      |reach(id, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id),
      |canon AS (
      |  SELECT s.doc_id,
      |    coalesce(c.component_id, s.doc_id) AS canonical_id
      |  FROM surv s LEFT JOIN comp c ON c.id = s.doc_id),
      |keepers AS (
      |  SELECT s.doc_id,
      |    CAST(len(list_filter(string_split_regex(s.text, '\\s+'), x -> x <> '')) AS BIGINT)
      |      AS n_tokens,
      |    ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT % $ExportShards
      |      AS shard
      |  FROM surv s JOIN canon ON canon.doc_id = s.doc_id
      |    AND canon.canonical_id = s.doc_id)
      |SELECT qual.doc_id, qual.q_verdict, canon.canonical_id,
      |  qual.q_verdict = 'kept' AND qual.doc_id = canon.canonical_id
      |    AS final_kept,
      |  keepers.n_tokens, keepers.shard
      |FROM qual
      |LEFT JOIN canon ON canon.doc_id = qual.doc_id
      |LEFT JOIN keepers ON keepers.doc_id = qual.doc_id
      |ORDER BY qual.doc_id""".stripMargin
  }
}
