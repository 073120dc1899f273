package graft.queries

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Text-analysis queries over `documents`: token counting, quality
  * scoring, language ID, fingerprinting. Pure codegen'd column
  * expressions — every score derivable (and derived, in the oracle) by
  * an external engine.
  */
object TextQueries {

  private val Stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-document profile: counts, ratios, composite quality, language. */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    // token arrays materialized ONCE per row in a child projection:
    // the metric expressions reference their token input up to three
    // times each, and a Column-level inline re-tokenizes per reference
    // (~10 interpreted split+filter passes per row before this) — same
    // values by construction, only the expression sharing changes
    docs.select(col("doc_id"), col("text"), col("n_chars"),
        TextFunctions.tokens(col("text")).as("_toks"),
        TextFunctions.tokens(lower(col("text"))).as("_ltoks"))
      .select(
        col("doc_id"),
        size(col("_toks")).as("n_tokens"),
        TextFunctions.lexTokenCount(col("text")).as("n_lex_tokens"),
        TextFunctions.punctRatio(col("text")).as("punct_ratio"),
        TextFunctions.stopwordRatioOfToks(col("_ltoks"), Stopwords)
          .as("stopword_ratio"),
        TextFunctions.meanTokenLenOfToks(col("_toks"))
          .as("mean_token_len"),
        TextFunctions.qualityScoreOfToks(col("text"), col("n_chars"),
          col("_ltoks")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  def profileSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val toksLower = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    val stopList = Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    val punct =
      s"(CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END)"
    val stop =
      s"(CASE WHEN len($toksLower) = 0 THEN 0.0 ELSE CAST(len(list_filter($toksLower, t -> list_contains($stopList, t))) AS DOUBLE) / CAST(len($toksLower) AS DOUBLE) END)"
    // langId: fold over (en, de, fr, es) profiles, strict > to win,
    // count of needle occurrences via the length-difference idiom
    def cnt(w: String) =
      s"CAST((len(p) - len(replace(p, '$w', ''))) / ${w.length} AS INTEGER)"
    def score(ws: Seq[String]) = ws.map(cnt).mkString("(", " + ", ")")
    val profiles = TextFunctions.DefaultProfiles
    val s0 = score(profiles.head._2)
    val folds = profiles.tail.zipWithIndex.map { case ((lang, ws), i) =>
      val prev = if (i == 0) s"'${profiles.head._1}'" else s"l$i"
      val prevS = if (i == 0) "s0" else s"sc$i"
      s"CASE WHEN ${score(ws)} > $prevS THEN '$lang' ELSE $prev END AS l${i + 1}, " +
        s"CASE WHEN ${score(ws)} > $prevS THEN ${score(ws)} ELSE $prevS END AS sc${i + 1}"
    }
    s"""WITH base AS (
      |  SELECT doc_id, text, n_chars,
      |    concat(' ', lower(text), ' ') AS p
      |  FROM documents),
      |l0 AS (SELECT *, $s0 AS s0 FROM base),
      |l1 AS (SELECT *, ${folds(0)} FROM l0),
      |l2 AS (SELECT *, ${folds(1)} FROM l1),
      |l3 AS (SELECT *, ${folds(2)} FROM l2)
      |SELECT doc_id,
      |  len($toks) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_lex_tokens,
      |  $punct AS punct_ratio,
      |  $stop AS stopword_ratio,
      |  CASE WHEN len($toks) = 0 THEN 0.0
      |    ELSE CAST(list_reduce(list_transform($toks, t -> CAST(len(t) AS BIGINT)), (a, b) -> a + b) AS DOUBLE) / CAST(len($toks) AS DOUBLE) END AS mean_token_len,
      |  0.4 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
      |    + 0.3 * (1.0 - least($punct * 10.0, 1.0))
      |    + 0.3 * least($stop * 4.0, 1.0) AS quality,
      |  CASE WHEN sc3 > 0 THEN l3 ELSE 'und' END AS lang_pred
      |FROM l3
      |ORDER BY doc_id""".stripMargin
  }

  /** C4-style corpus filter: per-document keep/reject verdict with the
    * FIRST failing rule as the reason (too_short → too_long →
    * low_diversity → kept) — the actionable form of quality scoring: a
    * pipeline partitions the corpus by `verdict` and a curator reads the
    * per-reason counts. Pure scan-shape column expressions; integer
    * counts and an exact two-int division, so every engine agrees on
    * each branch decision bit-for-bit.
    */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    // tokenize once per row (the metrics reference the array 4 times;
    // inlined Columns would re-tokenize per reference — see profile)
    val toks = col("_toks")
    docs.select(col("doc_id"),
        TextFunctions.tokens(lower(col("text"))).as("_toks"))
      .select(col("doc_id"), size(toks).as("n_words"),
        // zero-token guard mirrored in the oracle: Spark's 0/0 is NULL
        // while DuckDB's is NaN — both sides pin empty docs to 0.0
        when(size(toks) === 0, lit(0.0))
          .otherwise(size(array_distinct(toks)).cast(DoubleType) /
            size(toks).cast(DoubleType)).as("distinct_ratio"))
      .withColumn("verdict",
        when(col("n_words") < 25, "too_short")
          .when(col("n_words") > 90, "too_long")
          .when(col("distinct_ratio") < 0.45, "low_diversity")
          .otherwise("kept"))
      .orderBy(col("doc_id"))
  }

  def qualityFilterSql: String = {
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
      |SELECT doc_id, len(toks) AS n_words,
      |  CASE WHEN len(toks) = 0 THEN 0.0
      |    ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
      |    END AS distinct_ratio,
      |  CASE WHEN len(toks) < 25 THEN 'too_short'
      |       WHEN len(toks) > 90 THEN 'too_long'
      |       WHEN CAST(len(list_distinct(toks)) AS DOUBLE)
      |            / CAST(len(toks) AS DOUBLE) < 0.45 THEN 'low_diversity'
      |       ELSE 'kept' END AS verdict
      |FROM t ORDER BY doc_id""".stripMargin
  }

  /** Words shared by the Gopher-rule thresholds: function/domain words
    * present in ~77% of synthetic docs, so the containment rule splits
    * the corpus instead of passing or failing everything.
    */
  private val GopherStopwords = Seq("the", "a", "data", "value")

  /** Gopher-style rule-based document filter (Rae et al. 2021,
    * arXiv:2112.11446 Table A1 — thresholds re-tuned to the synthetic
    * corpus): word-count bounds, mean-word-length band, most-common-word
    * dominance, and stop-word containment, reported per rule with the
    * first failing rule as the verdict. One explode + two keyed
    * aggregations (word counts, then per-doc stats) — scan-shaped, no
    * global window; every metric is integer counts or one exact double
    * division, so each branch decision is engine-exact.
    */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    val wc = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val stats = wc.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_words"),
      sum(col("cnt") * length(col("w"))).as("sum_len"),
      max(col("cnt")).as("top_cnt"),
      sum(when(col("w").isin(GopherStopwords: _*), 1L).otherwise(0L))
        .as("stop_hits"))
    stats
      .withColumn("mean_wlen",
        col("sum_len").cast(DoubleType) / col("n_words").cast(DoubleType))
      .withColumn("top_frac",
        col("top_cnt").cast(DoubleType) / col("n_words").cast(DoubleType))
      .withColumn("verdict",
        when(col("n_words") < 25, "too_short")
          .when(col("n_words") > 90, "too_long")
          .when(col("mean_wlen") < 4.3 || col("mean_wlen") > 4.7,
            "word_length")
          .when(col("top_frac") > 0.10, "repetition")
          .when(col("stop_hits") < 2, "no_stopwords")
          .otherwise("kept"))
      .select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("top_frac"), col("stop_hits"), col("verdict"))
      .orderBy(col("doc_id"))
  }

  def gopherRulesSql: String = {
    val stopList = GopherStopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH $ToksCte,
      |wc AS (
      |  SELECT doc_id, w, count(*) AS cnt
      |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
      |  GROUP BY doc_id, w),
      |stats AS (
      |  SELECT doc_id,
      |    CAST(sum(cnt) AS BIGINT) AS n_words,
      |    CAST(sum(cnt * len(w)) AS BIGINT) AS sum_len,
      |    CAST(max(cnt) AS BIGINT) AS top_cnt,
      |    CAST(sum(CASE WHEN list_contains($stopList, w) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS stop_hits
      |  FROM wc GROUP BY doc_id),
      |m AS (
      |  SELECT *,
      |    CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_wlen,
      |    CAST(top_cnt AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_frac
      |  FROM stats)
      |SELECT doc_id, n_words, mean_wlen, top_frac, stop_hits,
      |  CASE WHEN n_words < 25 THEN 'too_short'
      |       WHEN n_words > 90 THEN 'too_long'
      |       WHEN mean_wlen < 4.3 OR mean_wlen > 4.7 THEN 'word_length'
      |       WHEN top_frac > 0.10 THEN 'repetition'
      |       WHEN stop_hits < 2 THEN 'no_stopwords'
      |       ELSE 'kept' END AS verdict
      |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Corpus curation: top-20 highest-quality docs per declared language
    * — the per-group quota sampling step of a training-data pipeline.
    * One shuffle on lang (keyed window, never global).
    */
  def qualityTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val scored = docs
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
        TextFunctions.tokens(lower(col("text"))).as("_ltoks"))
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScoreOfToks(col("text"), col("n_chars"),
          col("_ltoks")).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .orderBy(col("lang"), col("rk"))
  }

  def qualityTopKSql: String = {
    val toksLower = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    val stopList = Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    val punct =
      s"(CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END)"
    val stop =
      s"(CASE WHEN len($toksLower) = 0 THEN 0.0 ELSE CAST(len(list_filter($toksLower, t -> list_contains($stopList, t))) AS DOUBLE) / CAST(len($toksLower) AS DOUBLE) END)"
    s"""WITH q AS (
      |  SELECT doc_id, lang,
      |    0.4 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
      |      + 0.3 * (1.0 - least($punct * 10.0, 1.0))
      |      + 0.3 * least($stop * 4.0, 1.0) AS quality
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang, quality,
      |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rk
      |  FROM q)
      |SELECT doc_id, lang, quality, rk FROM r WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin
  }

  /** Deterministic train/validation/test split by salted content hash —
    * reproducible in any engine, stable under corpus growth (a doc's
    * split never depends on other docs), the standard hash-mod split of
    * training pipelines.
    */
  def corpusSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val bucket = graft.functions.PortableHash.md5Long(
      concat_ws("|", col("doc_id"), lit("split-v1"))) % 1000
    docs.select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 800, lit("train"))
          .when(col("bucket") < 900, lit("validation"))
          .otherwise(lit("test")))
      .orderBy(col("doc_id"))
  }

  def corpusSplitSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(concat_ws('|', doc_id, 'split-v1')), 1, 15))::BIGINT % 1000 AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 800 THEN 'train'
      |       WHEN bucket < 900 THEN 'validation'
      |       ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin

  /** Corpus mixture report: per (source, lang) document counts, total
    * characters and mean quality — the composition dashboard a training
    * mix is tuned against. One partial-aggregating shuffle.
    */
  def sourceMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    docs
      .select(col("source"), col("lang"), col("text"), col("n_chars"),
        TextFunctions.tokens(lower(col("text"))).as("_ltoks"))
      .select(col("source"), col("lang"), col("n_chars"),
        TextFunctions.qualityScoreOfToks(col("text"), col("n_chars"),
          col("_ltoks")).as("q"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        // decimal-exact mean (shuffle-order-independent), final as double
        (sum(col("q").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("mean_quality"))
      .orderBy(col("source"), col("lang"))
  }

  def sourceMixSql: String = {
    val toksLower = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    val stopList = Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    val punct =
      s"(CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END)"
    val stop =
      s"(CASE WHEN len($toksLower) = 0 THEN 0.0 ELSE CAST(len(list_filter($toksLower, t -> list_contains($stopList, t))) AS DOUBLE) / CAST(len($toksLower) AS DOUBLE) END)"
    s"""WITH q AS (
      |  SELECT source, lang, n_chars,
      |    0.4 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
      |      + 0.3 * (1.0 - least($punct * 10.0, 1.0))
      |      + 0.3 * least($stop * 4.0, 1.0) AS q
      |  FROM documents)
      |SELECT source, lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_quality
      |FROM q GROUP BY source, lang ORDER BY source, lang""".stripMargin
  }

  /** Within-document repetition: 1 - distinct/total word 3-grams — the
    * self-repetition quality signal (boilerplate and looped text score
    * high). Pure per-row expressions, no shuffle at all.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val toks = TextFunctions.tokens(lower(col("text")))
    val total = greatest(size(toks) - lit(2), lit(1))
    val distinctN = size(TextFunctions.wordShingles(col("text"), 3))
    docs.select(col("doc_id"),
        total.as("n_shingles"),
        distinctN.as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct").cast(DoubleType) /
          col("n_shingles").cast(DoubleType))
      .orderBy(col("doc_id"))
  }

  def repetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    greatest(len(toks) - 2, 1) AS n_shingles,
      |    CASE WHEN len(toks) < 3 THEN 1
      |      ELSE len(list_distinct(list_transform(
      |        range(1, greatest(len(toks) - 2, 1) + 1),
      |        i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' '))))
      |    END AS n_distinct
      |  FROM t)
      |SELECT doc_id, CAST(n_shingles AS INTEGER) AS n_shingles,
      |  CAST(n_distinct AS INTEGER) AS n_distinct,
      |  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS rep_ratio
      |FROM c ORDER BY doc_id""".stripMargin

  /** Winnowing-style fingerprints: selected md5 shingle hashes (suffix
    * '0'/'1'), sorted, joined — compact near-dup sketch per doc.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val fp = TextFunctions.fingerprint(col("text"), shingleLen = 5)
    docs.select(col("doc_id"), size(fp).as("n_fp"),
        array_join(fp, ",").as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  def fingerprintSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN len(t) < 5 THEN array_to_string(t, ' ')
      |      ELSE array_to_string(t[i:i+4], ' ') END AS shingle
      |    FROM (SELECT doc_id, t,
      |            unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS i
      |          FROM toks))),
      |hashes AS (
      |  SELECT doc_id, md5(shingle) AS h FROM sh),
      |sel AS (
      |  SELECT doc_id, h FROM hashes
      |  WHERE h LIKE '%0' OR h LIKE '%1'),
      |fp AS (
      |  SELECT doc_id, count(*) AS n_fp,
      |    string_agg(h, ',' ORDER BY h) AS fingerprint
      |  FROM sel GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(fp.n_fp, 0) AS n_fp,
      |  coalesce(fp.fingerprint, '') AS fingerprint
      |FROM toks t LEFT JOIN fp ON fp.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Multimodal plumbing as a declared op: synthesize binary payloads
    * from text (the env has no codecs), run the per-partition batch
    * feature extractor, emit id + byte count + an exact feature moment.
    * The decode STUB is deterministic byte-histogram moments, which ARE
    * SQL-expressible — so the whole mapPartitions pipeline is oracle
    * hash-checked (multimodalFeaturesSql); a real codec swap would drop
    * back to rows-only.
    */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val withPayload = graft.operators.Multimodal.withFakePayload(docs, "text")
    graft.operators.Multimodal
      .extractFeatures(withPayload, "doc_id", "payload")
      .withColumn("feat_l1",
        aggregate(col("features"), lit(0.0d),
          (acc, v) => acc + abs(v.cast("double"))))
      .select(col("doc_id"), col("n_bytes"), col("feat_l1"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replica of the stub decode: per-byte 8-bin histogram over the
    * UTF-8 payload (via hex(encode(text)) two-char slices), bin
    * frequencies in FLOAT like the Scala stub, L1-folded in bin order as
    * doubles — bit-identical to Multimodal.fakeDecode + the Spark
    * aggregate fold.
    */
  def multimodalFeaturesSql: String =
    """WITH base AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents),
      |bytes AS (
      |  SELECT doc_id, n,
      |    ('0x' || substr(hx, CAST(2*i - 1 AS INTEGER), 2))::INTEGER % 8 AS bin
      |  FROM base, UNNEST(range(1, n + 1)) AS t(i)),
      |hist AS (
      |  SELECT doc_id, n, bin, count(*) AS cnt FROM bytes GROUP BY 1, 2, 3),
      |feats AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(CAST(CAST(cnt AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE) ORDER BY bin)),
      |      (x, y) -> x + y) AS feat_l1
      |  FROM hist GROUP BY doc_id)
      |SELECT b.doc_id, b.n AS n_bytes, coalesce(f.feat_l1, 0.0) AS feat_l1
      |FROM base b LEFT JOIN feats f ON f.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  /** Frame sampling as a declared op: every 16th 32-byte window of the
    * payload becomes a frame row (the video-pipeline one-row-in →
    * many-frames-out shape), digested so the oracle can check content,
    * not just counts. The corpus is ASCII, so the DuckDB mirror frames
    * the text directly (byte offsets == char offsets — the same
    * ASCII-payload contract multimodalFeaturesSql already leans on).
    */
  def multimodalFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val withPayload = graft.operators.Multimodal.withFakePayload(docs, "text")
    graft.operators.Multimodal
      .sampleFrames(withPayload, "doc_id", "payload",
        frameSize = 32, stride = 16)
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  def multimodalFramesSql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents),
      |offs AS (
      |  SELECT doc_id, text, n, CAST(t.o AS BIGINT) AS off
      |  FROM base, UNNEST(range(0, greatest(n - 31, 1), 16)) AS t(o))
      |SELECT doc_id, CAST(off // 16 AS INTEGER) AS frame_no,
      |  CAST(least(32, n - off) AS INTEGER) AS frame_len,
      |  md5(substr(text, CAST(off + 1 AS INTEGER), 32)) AS frame_md5
      |FROM offs ORDER BY doc_id, frame_no""".stripMargin

  private def hexToBytes(h: String): Array[Byte] =
    Array.tabulate(h.length / 2)(k =>
      Integer.parseInt(h.substring(2 * k, 2 * k + 2), 16).toByte)

  /** Merge count for the declared BPE query — compile-time constant
    * because the oracle unrolls one SQL stage per merge.
    */
  private val BpeMerges = 16

  /** Corpus-trained BPE token counts as a declared op (see
    * [[graft.operators.Bpe]]): 16 frequency-ranked merges trained from
    * the documents table itself, then every document's word occurrences
    * counted in merged subword tokens. The whole construction —
    * character split, pair statistics, (count DESC, a, b) tie-break,
    * boundary-separator replace — is deterministic, so the oracle
    * REPLAYS TRAINING stage by stage (16 unrolled CTE rounds) and must
    * land on identical counts. Training runs the driver-local merge
    * loop ([[graft.operators.Bpe.trainLocal]], bit-identical to the
    * distributed form, cross-checked in BpeSpec): one corpus groupBy,
    * then vocabulary-sized in-memory rounds instead of two Spark jobs
    * per merge. Vocab is memoized per corpus snapshot: benchmark reps
    * pay training once.
    */
  def tokensBpe(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val vocab = graft.plans.CachedPlans.memo(s"bpe_vocab_$BpeMerges", docs) {
      graft.operators.Bpe.trainLocal(docs, "text", BpeMerges)._1
    }
    graft.operators.Bpe.tokenCounts(docs, "doc_id", "text", vocab)
      .orderBy(col("doc_id"))
  }

  /** The BPE-training WITH clauses (word counts `w`, char-level `v0`,
    * unrolled merge stages up to `v$BpeMerges`) over the documents
    * matching `trainWhere` — shared by the full-corpus oracle and the
    * OOV (train-on-half) oracle.
    */
  private def bpeTrainSql(trainWhere: String): String = {
    val S = "chr(31)"
    // one replace pass per Bpe.Passes, identity when a stage has no pair
    // left (LEFT JOIN of an empty argmax row: chr(1) never matches)
    def rep(expr: String): String =
      (1 to graft.operators.Bpe.Passes).foldLeft(expr)((e, _) =>
        s"replace($e, coalesce(m.pat, chr(1)), coalesce(m.rep, chr(1)))")
    // every stage CTE is MATERIALIZED: each round reads the previous
    // vocabulary twice (pair stats + rewrite), and CTE inlining would
    // expand that to 2^rounds scans of the source table
    val stages = (1 to BpeMerges).map { s =>
      s"""p$s AS MATERIALIZED (
         |  SELECT pr.a, pr.b, sum(pr.cnt) AS n FROM (
         |    SELECT q.cnt, q.l[CAST(u.i AS INTEGER)] AS a,
         |      q.l[CAST(u.i + 1 AS INTEGER)] AS b
         |    FROM (SELECT cnt,
         |        list_filter(string_split(sym, $S), x -> x <> '') AS l
         |      FROM v${s - 1}) q,
         |      UNNEST(range(1, greatest(len(q.l), 1))) u(i)) pr
         |  GROUP BY pr.a, pr.b),
         |m$s AS MATERIALIZED (
         |  SELECT $S || a || $S || b || $S AS pat, $S || a || b || $S AS rep
         |  FROM (SELECT a, b FROM p$s ORDER BY n DESC, a, b LIMIT 1)),
         |v$s AS MATERIALIZED (
         |  SELECT word, cnt, ${rep("v.sym")} AS sym
         |  FROM v${s - 1} v LEFT JOIN m$s m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""w AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
      |    x -> x <> '')) AS word
      |  FROM documents$trainWhere),
      |v0 AS MATERIALIZED (
      |  SELECT word, count(*) AS cnt,
      |    $S || array_to_string(regexp_extract_all(word, '.'), $S) || $S AS sym
      |  FROM w GROUP BY word),
      |$stages""".stripMargin
  }

  def tokensBpeSql: String = {
    val S = "chr(31)"
    s"""WITH ${bpeTrainSql("")},
      |wd AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
      |  FROM documents),
      |wt AS (
      |  SELECT word, CAST(len(list_filter(string_split(sym, $S),
      |    x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM v$BpeMerges),
      |pd AS (
      |  SELECT wd.doc_id, count(*) AS n_words, sum(wt.n_tok) AS n_tokens_bpe
      |  FROM wd JOIN wt USING (word) GROUP BY wd.doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(pd.n_words, 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(pd.n_tokens_bpe, 0) AS BIGINT) AS n_tokens_bpe
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  /** [[tokensBpe]]'s incremental half: a FOREIGN corpus (part names) is
    * counted under the vocabulary trained on documents — the real
    * production pattern of counting a new batch under a stored
    * vocabulary. Part names mix in-vocab words with words the training
    * corpus never saw (15 of 16 distinct words are OOV at sf0.001 —
    * the synthetic documents table's own vocabulary is closed, so an
    * intra-table split would never exercise the fallback); unseen words
    * take [[graft.operators.Bpe.tokenCounts]]' character-level fallback
    * (codepoint count — pinned cross-engine by `text_utf8_profile`)
    * instead of silently dropping out of both totals. The oracle
    * replays exactly that: train on documents in SQL, LEFT-join the
    * part-name words, `coalesce(n_tok, length(word))`. The vocabulary
    * memo is shared with [[tokensBpe]], so the pair trains once.
    */
  /** Token-ID export: the step that turns a curated corpus into model
    * input — every document's subword occurrences under the
    * corpus-trained BPE vocabulary, with a DENSE integer token id
    * (rank by global frequency desc, token asc — the conventional
    * id assignment) and global/per-doc counts. The id table is
    * vocabulary-sized; its global rank runs through the lifted
    * range-partition form, never a single-partition window; the corpus
    * side is scan-shaped (explode → broadcast vocab join → explode).
    */
  def tokenIds(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val vocab = graft.plans.CachedPlans.memo(s"bpe_vocab_$BpeMerges", docs) {
      graft.operators.Bpe.trainLocal(docs, "text", BpeMerges)._1
    }
    val stream = graft.plans.CachedPlans.cached(
      graft.operators.Bpe.tokenRows(docs, "doc_id", "text", vocab))
    val freq = stream.groupBy(col("token"))
      .agg(count(lit(1)).as("n_global"))
    val ids = graft.operators.Packing.globalRank(freq, "token_id",
      col("n_global").desc, col("token"))
    val perDoc = stream.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"))
    perDoc
      .join(ids.select(col("token"), col("token_id"), col("n_global")),
        Seq("token"))
      .select(col("doc_id"), col("token"), col("token_id"),
        col("n_global"), col("n"))
      .orderBy(col("doc_id"), col("token"))
  }

  def tokenIdsSql: String = {
    val S = "chr(31)"
    s"""WITH ${bpeTrainSql("")},
      |wd AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
      |  FROM documents),
      |wt AS (
      |  SELECT wd.doc_id, u.tok
      |  FROM wd LEFT JOIN v$BpeMerges v ON wd.word = v.word,
      |    UNNEST(CASE WHEN v.word IS NULL
      |      THEN regexp_extract_all(wd.word, '.')
      |      ELSE list_filter(string_split(v.sym, $S), x -> x <> '')
      |      END) u(tok)),
      |freq AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n_global
      |  FROM wt GROUP BY tok),
      |ids AS (
      |  SELECT tok, n_global,
      |    CAST(row_number() OVER (ORDER BY n_global DESC, tok) AS BIGINT)
      |      AS token_id
      |  FROM freq),
      |per AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
      |  FROM wt GROUP BY doc_id, tok)
      |SELECT per.doc_id, per.tok AS token, ids.token_id, ids.n_global,
      |  per.n
      |FROM per JOIN ids ON per.tok = ids.tok
      |ORDER BY per.doc_id, token""".stripMargin
  }

  def tokensBpeOov(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val vocab = graft.plans.CachedPlans.memo(s"bpe_vocab_$BpeMerges", docs) {
      graft.operators.Bpe.trainLocal(docs, "text", BpeMerges)._1
    }
    val part = tbl(spark, sfDir, "part")
    graft.operators.Bpe.tokenCounts(part, "p_partkey", "p_name", vocab)
      .orderBy(col("p_partkey"))
  }

  def tokensBpeOovSql: String = {
    val S = "chr(31)"
    s"""WITH ${bpeTrainSql("")},
      |wd AS (
      |  SELECT p_partkey, unnest(list_filter(
      |    string_split_regex(lower(p_name), '\\s+'), x -> x <> '')) AS word
      |  FROM part),
      |wt AS (
      |  SELECT word, CAST(len(list_filter(string_split(sym, $S),
      |    x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM v$BpeMerges),
      |pd AS (
      |  SELECT wd.p_partkey, count(*) AS n_words,
      |    sum(coalesce(wt.n_tok, length(wd.word))) AS n_tokens_bpe
      |  FROM wd LEFT JOIN wt USING (word) GROUP BY wd.p_partkey)
      |SELECT p.p_partkey,
      |  CAST(coalesce(pd.n_words, 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(pd.n_tokens_bpe, 0) AS BIGINT) AS n_tokens_bpe
      |FROM part p LEFT JOIN pd USING (p_partkey)
      |ORDER BY p_partkey""".stripMargin
  }

  /** REAL multi-frame decode as a declared op: a 2-frame 4x2 animated
    * GIF89a per document (frame f's 8 palette indices = md5(text) bytes
    * f·8..f·8+7), decoded frame-by-frame through the JDK multi-image
    * reader via [[graft.operators.Multimodal.gifFrames]] — one row in,
    * one row OUT PER FRAME with raster dims and exact channel sums. The
    * encoder's palette is analytic (index v → (v, 255-v, 7v mod 256)),
    * so the oracle recomputes every sum straight from the md5 hex: a bug
    * anywhere in the GIF container walk, the LZW stream, frame ordering
    * or palette application breaks the hash match.
    */
  def multimodalFramesGif(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.{MediaCodecs, Multimodal}
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encP = org.apache.spark.sql.Encoders.row(payloadSchema)
    val withGif = base.mapPartitions { rows =>
      rows.map { r =>
        val md5b = hexToBytes(r.getString(1))
        val gif = MediaCodecs.encodeGif(4, 2, Seq(
          java.util.Arrays.copyOfRange(md5b, 0, 8),
          java.util.Arrays.copyOfRange(md5b, 8, 16)))
        org.apache.spark.sql.Row(r.getLong(0), gif)
      }
    }(encP)
    val frames = Multimodal.gifFrames(withGif, "doc_id", "payload")
    // channel c of pixel p lives at byte p*3+c of the packed raster;
    // sums stay in codegen via hex + conv over a generated sequence
    def chanSum(c: Int) = aggregate(
      transform(sequence(lit(0), lit(7)), p =>
        conv(hex(col("frame_rgb")).substr(
          (p * lit(3) + lit(c)) * lit(2) + lit(1), lit(2)), 16, 10)
          .cast(LongType)),
      lit(0L), (acc, v) => acc + v)
    frames.select(col("doc_id"), col("frame_no"), col("width"),
        col("height"), chanSum(0).as("sum_r"), chanSum(1).as("sum_g"),
        chanSum(2).as("sum_b"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  def multimodalFramesGifSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |fr AS (
      |  SELECT doc_id, h, CAST(f.f AS INTEGER) AS frame_no
      |  FROM b, UNNEST(range(0, 2)) f(f)),
      |bytes AS (
      |  SELECT doc_id, frame_no,
      |    ('0x' || substr(h, CAST(2*(frame_no*8 + t.i) + 1 AS INTEGER), 2))::INTEGER AS v
      |  FROM fr, UNNEST(range(0, 8)) t(i))
      |SELECT doc_id, frame_no,
      |  CAST(4 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  CAST(sum(v) AS BIGINT) AS sum_r,
      |  CAST(sum(255 - v) AS BIGINT) AS sum_g,
      |  CAST(sum((7*v) % 256) AS BIGINT) AS sum_b
      |FROM bytes GROUP BY doc_id, frame_no
      |ORDER BY doc_id, frame_no""".stripMargin

  /** REAL-codec decode as a declared op: build a 5x2 24bpp BMP whose 30
    * RGB bytes cycle the 16 md5(text) bytes, push it through the
    * pure-JVM [[graft.operators.MediaCodecs.BmpDecoder]] on executors,
    * and emit the decoded metadata plus exact integer channel sums. The
    * oracle recomputes the sums straight from the md5 hex (Spark and
    * DuckDB md5 agree byte-for-byte), so a parse bug anywhere — header
    * fields, the 5-wide rows' 1-byte padding, BGR order, bottom-up row
    * flip — breaks the hash match. Unlike mm_features this is no stub:
    * the bytes on the wire are a spec-compliant BMP container
    * (MultimodalSpec cross-checks the same codec against JDK ImageIO).
    */
  def multimodalDecodeBmp(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val md5b = hexToBytes(r.getString(1))
        val rgb = Array.tabulate(30)(i => md5b(i % 16))
        val bmp = MediaCodecs.encodeBmp(5, 2, rgb)
        // one parse: kind/format are pinned by the decoder class itself
        val (w, hgt, px) = MediaCodecs.BmpDecoder.decodePixels(bmp)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
          i += 3
        }
        org.apache.spark.sql.Row(
          r.getLong(0), "image", "bmp", w, hgt, sr, sg, sb)
      }
    }(enc).orderBy("doc_id")
  }

  /** REAL PNG decode as a declared op: build a 6x3 truecolor PNG per
    * document (54 RGB bytes cycling the 16 md5(text) bytes) with the
    * spec-level encoder — fixed None filter, stored-block zlib, so
    * every byte is deterministic — and decode it through the REAL JDK
    * ImageIO PNG codec on executors (chunk walk + CRC verify, zlib
    * inflate, filter reconstruction). The oracle recomputes dims and
    * exact integer channel sums straight from the md5 hex, so a bug
    * anywhere in the container, the inflate, or the raster walk breaks
    * the hash match — the oracle-exactness GIF already had
    * ([[multimodalFramesGif]]), extended to the PNG path that was
    * previously spec-only.
    */
  def multimodalDecodePng(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val md5b = hexToBytes(r.getString(1))
        val rgb = Array.tabulate(54)(i => md5b(i % 16))
        val png = MediaCodecs.encodePng(6, 3, rgb)
        val (w, hgt, px) = MediaCodecs.imageIoRgb(png, "png")
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
          i += 3
        }
        org.apache.spark.sql.Row(
          r.getLong(0), "image", "png", w, hgt, sr, sg, sb)
      }
    }(enc).orderBy("doc_id")
  }

  def multimodalDecodePngSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |bytes AS (
      |  SELECT doc_id, CAST(t.i AS INTEGER) AS i,
      |    ('0x' || substr(h, CAST(2*(t.i % 16) + 1 AS INTEGER), 2))::INTEGER AS v
      |  FROM b, UNNEST(range(0, 54)) AS t(i))
      |SELECT doc_id, 'image' AS kind, 'png' AS format,
      |  CAST(6 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
      |  CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
      |  CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
      |  CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS sum_b
      |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** REAL JPEG decode as a declared op — the one codec where a general
    * pixel-exact oracle is impossible (IDCT rounding is implementation-
    * defined for nonzero AC terms), made exact by construction: a 4x2
    * grid of FLAT 8x8 blocks (block values = the first 8 md5(text)
    * bytes) encoded as baseline YCbCr with DC-only coefficients, an
    * all-8s quant table (dequantized DC = 8·(v-128), IDCT flat value =
    * exactly v-128 — integer multiples, zero rounding freedom) and
    * flat 128 chroma (color convert collapses to R=G=B=Y exactly). The
    * executors run the REAL JDK JPEG path — marker parse, Huffman
    * decode under the standard Annex K tables, dequantize, IDCT, level
    * shift, color convert — and the oracle recomputes dims and channel
    * sums from the md5 hex: each block contributes 64·v to every
    * channel. JpegProbe sweeps all 256 block values pixel-exactly.
    */
  def multimodalDecodeJpeg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val md5b = hexToBytes(r.getString(1))
        val jpg = MediaCodecs.encodeJpegFlatBlocks(4, 2,
          Array.tabulate(8)(i => md5b(i) & 0xff))
        val (w, hgt, px) = MediaCodecs.imageIoRgb(jpg, "jpeg")
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
          i += 3
        }
        org.apache.spark.sql.Row(
          r.getLong(0), "image", "jpeg", w, hgt, sr, sg, sb)
      }
    }(enc).orderBy("doc_id")
  }

  def multimodalDecodeJpegSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |bytes AS (
      |  SELECT doc_id,
      |    ('0x' || substr(h, CAST(2*t.i + 1 AS INTEGER), 2))::INTEGER AS v
      |  FROM b, UNNEST(range(0, 8)) AS t(i))
      |SELECT doc_id, 'image' AS kind, 'jpeg' AS format,
      |  CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
      |  CAST(sum(64 * v) AS BIGINT) AS sum_r,
      |  CAST(sum(64 * v) AS BIGINT) AS sum_g,
      |  CAST(sum(64 * v) AS BIGINT) AS sum_b
      |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def multimodalDecodeBmpSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |bytes AS (
      |  SELECT doc_id, CAST(t.i AS INTEGER) AS i,
      |    ('0x' || substr(h, CAST(2*(t.i % 16) + 1 AS INTEGER), 2))::INTEGER AS v
      |  FROM b, UNNEST(range(0, 30)) AS t(i))
      |SELECT doc_id, 'image' AS kind, 'bmp' AS format,
      |  CAST(5 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |  CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
      |  CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
      |  CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS sum_b
      |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** REAL resize on REAL containers: the md5-derived 5x2 BMP from
    * [[multimodalDecodeBmp]] is parsed and nearest-neighbor-resized to
    * 3x2; exact channel sums of the resized image are oracle-checked.
    * Nearest-neighbor source indices are deterministic
    * (`sx = floor(x·w/outW)` → columns 0,1,3 of both rows), so DuckDB
    * recomputes the same sums straight from the md5 hex — pinning the
    * parse AND the resize arithmetic cross-engine.
    */
  def multimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val md5b = hexToBytes(r.getString(1))
        val rgb = Array.tabulate(30)(i => md5b(i % 16))
        val bmp = MediaCodecs.encodeBmp(5, 2, rgb)
        val (w, hgt, px) = MediaCodecs.BmpDecoder.decodePixels(bmp)
        val small = MediaCodecs.resizeNearest(w, hgt, px, 3, 2)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < small.length) {
          sr += small(i) & 0xff; sg += small(i + 1) & 0xff
          sb += small(i + 2) & 0xff
          i += 3
        }
        org.apache.spark.sql.Row(r.getLong(0), 3, 2, sr, sg, sb)
      }
    }(enc).orderBy("doc_id")
  }

  /** Oracle: nearest-neighbor 5x2→3x2 keeps pixels (y, x·5/3) =
    * columns {0,1,3} of rows {0,1} — top-down RGB offsets
    * {0,3,9,15,18,24}; channel byte c of offset o is md5 byte (o+c)%16.
    */
  def multimodalResizeSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, h, CAST(t.o AS INTEGER) AS o
      |  FROM b, UNNEST([0, 3, 9, 15, 18, 24]) t(o)),
      |bytes AS (
      |  SELECT doc_id,
      |    ('0x' || substr(h, CAST(2*((o + 0) % 16) + 1 AS INTEGER), 2))::INTEGER AS r,
      |    ('0x' || substr(h, CAST(2*((o + 1) % 16) + 1 AS INTEGER), 2))::INTEGER AS g,
      |    ('0x' || substr(h, CAST(2*((o + 2) % 16) + 1 AS INTEGER), 2))::INTEGER AS bl
      |  FROM px)
      |SELECT doc_id, CAST(3 AS INTEGER) AS out_w, CAST(2 AS INTEGER) AS out_h,
      |  CAST(sum(r) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(bl) AS BIGINT) AS sum_b
      |FROM bytes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** REAL-codec WAV twin of [[multimodalDecodeBmp]]: 8 signed 16-bit LE
    * samples from the md5(text) bytes, wrapped in a RIFF/WAVE container
    * by `encodeWavPcm16`, parsed back by the pure-JVM WavDecoder chunk
    * walk; exact integer sample sums oracle-checked from the hex.
    */
  def multimodalDecodeWav(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_s", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val b = hexToBytes(r.getString(1))
        val samples = Array.tabulate(8)(j =>
          ((b(2 * j) & 0xff) | (b(2 * j + 1) << 8)).toShort)
        val wav = MediaCodecs.encodeWavPcm16(16000, 1, samples)
        // one parse: kind/format are pinned by the decoder class itself
        val (rate, channels, parsed) = MediaCodecs.WavDecoder.decodeSamples(wav)
        var s = 0L; var sa = 0L
        parsed.foreach { v => s += v; sa += math.abs(v.toInt) }
        org.apache.spark.sql.Row(
          r.getLong(0), "audio", "wav", rate, channels,
          parsed.length.toLong / channels, s, sa)
      }
    }(enc).orderBy("doc_id")
  }

  def multimodalDecodeWavSql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |smp AS (
      |  SELECT doc_id,
      |    ('0x' || substr(h, CAST(4*t.j + 1 AS INTEGER), 2))::INTEGER
      |    + 256 * ('0x' || substr(h, CAST(4*t.j + 3 AS INTEGER), 2))::INTEGER AS raw
      |  FROM b, UNNEST(range(0, 8)) AS t(j)),
      |s AS (SELECT doc_id,
      |  CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v FROM smp)
      |SELECT doc_id, 'audio' AS kind, 'wav' AS format,
      |  CAST(16000 AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
      |  CAST(8 AS BIGINT) AS n_samples,
      |  CAST(sum(v) AS BIGINT) AS sum_s,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Windowed audio energy over a REAL WAV decode — the building block
    * of voice-activity/silence analysis a multimodal pipeline runs
    * before trimming or captioning audio: 64 16-bit PCM samples per
    * document (bytes of md5(text) index-mixed so windows differ),
    * round-tripped through the RIFF container ([[graft.operators
    * .MediaCodecs.encodeWavPcm16]] → `WavDecoder.decodeSamples`), then
    * per 16-sample window the absolute-energy sum and peak — one row
    * per window, all integer arithmetic, so the oracle recomputes every
    * value straight from the md5 hex.
    */
  def multimodalAudioEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.MediaCodecs
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("window_no", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy_abs", LongType, nullable = false),
      StructField("peak", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = hexToBytes(r.getString(1))
        val samples = Array.tabulate(64)(j =>
          ((b((5 * j) % 16) & 0xff) | (b((5 * j + 3) % 16) << 8)).toShort)
        val wav = MediaCodecs.encodeWavPcm16(16000, 1, samples)
        val (_, _, parsed) = MediaCodecs.WavDecoder.decodeSamples(wav)
        parsed.grouped(16).zipWithIndex.map { case (w, i) =>
          var ea = 0L; var pk = 0L
          w.foreach { v =>
            val a = math.abs(v.toInt).toLong
            ea += a; if (a > pk) pk = a
          }
          org.apache.spark.sql.Row(r.getLong(0), i, w.length.toLong, ea, pk)
        }
      }
    }(enc).orderBy("doc_id", "window_no")
  }

  def multimodalAudioEnergySql: String =
    """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
      |smp AS (
      |  SELECT doc_id, CAST(t.j AS INTEGER) AS j,
      |    ('0x' || substr(h, CAST(2*((5*t.j) % 16) + 1 AS INTEGER), 2))::INTEGER
      |    + 256 * ('0x' || substr(h, CAST(2*((5*t.j + 3) % 16) + 1 AS INTEGER), 2))::INTEGER AS raw
      |  FROM b, UNNEST(range(0, 64)) AS t(j)),
      |s AS (SELECT doc_id, j,
      |  CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v FROM smp)
      |SELECT doc_id, CAST(j // 16 AS INTEGER) AS window_no,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(sum(abs(v)) AS BIGINT) AS energy_abs,
      |  CAST(max(abs(v)) AS BIGINT) AS peak
      |FROM s GROUP BY doc_id, j // 16
      |ORDER BY doc_id, window_no""".stripMargin

  /** 8 chained md5 digests of `s` (suffixes "", "x1".."x7") as 128
    * bytes — the deterministic pixel source for the perceptual-hash
    * queries. Matches `md5(s) || md5(s||'x1') || …` in any engine.
    */
  private val AhashChainSql =
    (0 until 8).map(j => if (j == 0) "md5(%s)" else s"md5(%s || 'x$j')")
      .mkString(" || ")

  /** The DuckDB CTE chain deriving each document's 64-bit aHash code
    * analytically from the md5 pixel chains — `code AS (doc_id,
    * ahash_hi, ahash_lo)` plus its feeder CTEs. Shared by the batch
    * aHash oracles here and the incremental-media oracles in
    * [[DedupQueries]]; `src` must provide (doc_id, lang, source, text)
    * — parameterized so the refreshed-index oracle can replay the CDC
    * update batch.
    */
  private[queries] def ahashCodeCtes(src: String = "documents"): String = {
    val th = AhashChainSql.replaceAll("%s", "g")
    val dh = AhashChainSql.replaceAll("%s", "text")
    s"""b AS (
      |  SELECT doc_id, lang || '|' || source AS g, text FROM $src),
      |hx AS (SELECT doc_id, $th AS thex, $dh AS dhex FROM b),
      |px AS (
      |  SELECT doc_id, CAST(t.i AS INTEGER) AS i,
      |    (('0x' || substr(thex, CAST(2*((t.i // 8) * 16 + 2*(t.i % 8)) + 1 AS INTEGER), 2))::BIGINT & 248) |
      |    (('0x' || substr(dhex, CAST(2*((t.i // 8) * 16 + 2*(t.i % 8)) + 1 AS INTEGER), 2))::BIGINT & 7) AS v
      |  FROM hx, UNNEST(range(0, 64)) AS t(i)),
      |s AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
      |bits AS (
      |  SELECT px.doc_id, i, CASE WHEN v * 64 > sv THEN 1 ELSE 0 END AS bit
      |  FROM px JOIN s USING (doc_id)),
      |code AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN i >= 32 THEN CAST(bit AS BIGINT) << (i - 32) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |    CAST(sum(CASE WHEN i < 32 THEN CAST(bit AS BIGINT) << i ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** The synthesized BINARY image corpus backing the media-index query
    * family (`mm_ahash_incremental*`): one 16×8 grayscale BMP per
    * document — 5 high bits of each pixel from the (lang, source)
    * template md5 chain, 3 low bits of per-document noise (the same
    * pixel math [[ahashCodes]] hashes inline) — but emitted as PAYLOAD
    * BYTES, so the incremental/indexed probes exercise the real
    * decode-then-hash path ([[graft.operators.Multimodal
    * .averageHashCodes]]) while the oracle derives the identical codes
    * analytically via [[ahashCodeCtes]]. `docs` must carry (doc_id,
    * lang, source, text) — parameterized so the refreshed-index fixture
    * can synthesize payloads from CDC-updated text.
    */
  private[queries] def ahashPayloads(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.bmp(r.getString(1),
            r.getString(2)))
      }
    }(enc)
  }

  /** [[ahashPayloads]]' AUDIO twin: one 128-sample PCM16 WAV per
    * document from the same (lang, source) template / per-doc noise md5
    * chains ([[graft.operators.SyntheticMedia.wav]]) — emitted as
    * payload BYTES so the audio near-dup probes exercise the real
    * RIFF-parse-then-energy-hash path while the oracle derives the
    * identical codes analytically ([[energyHashCodeCtes]]).
    */
  private[queries] def audioPayloads(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.wav(r.getString(1),
            r.getString(2)))
      }
    }(enc)
  }

  /** [[ahashCodeCtes]]' audio twin: the CTE chain deriving each
    * document's 64-bit ENERGY hash analytically from the md5 sample
    * chains — sample j = ((t(j)&248)|(d(j)&7))·16 (always
    * non-negative, so |s| = s), window i = samples 2i..2i+1 of the
    * 128-sample clip, bit i = E_i·64 > ΣE, packed exactly like the
    * image code (`code AS (doc_id, ahash_hi, ahash_lo)` so the banded
    * candidate/verify SQL is shared verbatim).
    */
  private[queries] def energyHashCodeCtes(
      src: String = "documents"): String = {
    val th = AhashChainSql.replaceAll("%s", "g")
    val dh = AhashChainSql.replaceAll("%s", "text")
    s"""b AS (
      |  SELECT doc_id, lang || '|' || source AS g, text FROM $src),
      |hx AS (SELECT doc_id, $th AS thex, $dh AS dhex FROM b),
      |sm AS (
      |  SELECT doc_id, CAST(t.j AS INTEGER) AS j,
      |    ((('0x' || substr(thex, CAST(2*(t.j) + 1 AS INTEGER), 2))::BIGINT & 248) |
      |     (('0x' || substr(dhex, CAST(2*(t.j) + 1 AS INTEGER), 2))::BIGINT & 7)) * 16 AS v
      |  FROM hx, UNNEST(range(0, 128)) AS t(j)),
      |e AS (
      |  SELECT doc_id, CAST(j // 2 AS INTEGER) AS w, sum(v) AS ev
      |  FROM sm GROUP BY doc_id, j // 2),
      |s AS (SELECT doc_id, sum(ev) AS te FROM e GROUP BY doc_id),
      |bits AS (
      |  SELECT e.doc_id, w, CASE WHEN ev * 64 > te THEN 1 ELSE 0 END AS bit
      |  FROM e JOIN s USING (doc_id)),
      |code AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN w >= 32 THEN CAST(bit AS BIGINT) << (w - 32) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |    CAST(sum(CASE WHEN w < 32 THEN CAST(bit AS BIGINT) << w ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** Per-doc 64-bit average hash through the REAL image path: a 16×8
    * grayscale BMP is synthesized per document — 5 high bits of each
    * pixel from the (lang, source) template hash, 3 low bits of
    * per-document noise, so documents from one source yield
    * perceptually-near images the way re-encodes/crops of one photo do
    * in a real corpus — then encoded by the spec-level BMP writer,
    * parsed back by the pure-JVM BMP decoder, nearest-neighbor
    * downscaled 16×8→8×8 and average-hashed
    * ([[graft.operators.Multimodal.averageHash]]). Integer arithmetic
    * end to end, so the oracle derives the identical codes analytically
    * from the md5 chains.
    */
  private def ahashCodes(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.{MediaCodecs, Multimodal}
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // cached: every consumer joins this table against its own aggregate
    // (groups, band sides), and mapPartitions is opaque to Catalyst —
    // without the persist the synthesize+decode pipeline (the expensive
    // part) re-runs once per join branch. Same discipline as the
    // operator-level media probes' CachedPlans.cached code tables.
    graft.plans.CachedPlans.cached(base.mapPartitions { rows =>
      rows.map { r =>
        val bmp = graft.operators.SyntheticMedia.bmp(r.getString(1),
          r.getString(2))
        val (w, h, px) = MediaCodecs.BmpDecoder.decodePixels(bmp)
        val (hi, lo) = Multimodal.averageHash(w, h, px)
        org.apache.spark.sql.Row(r.getLong(0), hi, lo)
      }
    }(enc))
  }

  /** Perceptual-hash image dedup verdicts: every document's aHash code
    * with its exact-code group — canonical holder (lowest doc_id),
    * group size, keep flag. One shuffle on the 64-bit code; output is
    * linear in the corpus (the quadratic near-pair question lives in
    * [[multimodalAhashNear]] over distinct codes only).
    */
  def multimodalAhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = ahashCodes(spark, sfDir)
    val grp = codes.groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
    codes.join(grp, Seq("ahash_hi", "ahash_lo"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("canonical_id"), col("group_size"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: replays pixel synthesis (template/noise md5 chains),
    * the 16×8→8×8 nearest-neighbor sampling (source column 2x of row
    * y — the resize keeps even columns), the strict gray·64 > Σgray
    * threshold (gray = 3v cancels exactly), and the bit packing.
    */
  def multimodalAhashDedupSql: String = {
    s"""WITH ${ahashCodeCtes()},
      |grp AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS canonical_id,
      |    CAST(count(*) AS BIGINT) AS group_size
      |  FROM code GROUP BY 1, 2)
      |SELECT doc_id, ahash_hi, ahash_lo, canonical_id, group_size,
      |  doc_id = canonical_id AS is_canonical
      |FROM code JOIN grp USING (ahash_hi, ahash_lo)
      |ORDER BY doc_id""".stripMargin
  }

  /** Near-duplicate image pairs: Hamming 1..3 between DISTINCT aHash
    * codes (exact dups already collapsed by [[multimodalAhashDedup]] —
    * the pair question runs over canonical representatives only, so
    * identical-code cliques never explode the output). Candidates come
    * from a 4×16-bit band join — by pigeonhole a pair within Hamming 3
    * agrees on at least one band, so banding loses nothing and the
    * oracle may verify with the plain quadratic filter over reps.
    */
  def multimodalAhashNear(spark: SparkSession, sfDir: String): DataFrame = {
    val reps = ahashCodes(spark, sfDir)
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("rep_id"))
    val bandCols = (0 until 4).map { b =>
      val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
      struct(lit(b).as("band"),
        shiftright(half, 16 * (b % 2)).bitwiseAND(lit(0xffffL)).as("bkey"))
    }
    val bands = reps.select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = bands.select(col("band"), col("bkey"), col("rep_id").as("a_id"),
      col("ahash_hi").as("a_hi"), col("ahash_lo").as("a_lo"))
    val bb = bands.select(col("band"), col("bkey"), col("rep_id").as("b_id"),
      col("ahash_hi").as("b_hi"), col("ahash_lo").as("b_lo"))
    a.join(bb, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming").between(1, 3))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  def multimodalAhashNearSql: String = {
    s"""WITH ${ahashCodeCtes()},
      |reps AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS rep_id
      |  FROM code GROUP BY 1, 2)
      |SELECT a.rep_id AS a_id, r.rep_id AS b_id,
      |  CAST(bit_count(xor(a.ahash_hi, r.ahash_hi))
      |    + bit_count(xor(a.ahash_lo, r.ahash_lo)) AS INTEGER) AS hamming
      |FROM reps a JOIN reps r ON a.rep_id < r.rep_id
      |WHERE bit_count(xor(a.ahash_hi, r.ahash_hi))
      |  + bit_count(xor(a.ahash_lo, r.ahash_lo)) BETWEEN 1 AND 3
      |ORDER BY a_id, b_id""".stripMargin
  }

  /** [[ahashCodes]]' audio twin through the REAL pipeline: WAV
    * synthesized per document ([[graft.operators.SyntheticMedia.wav]]),
    * parsed back by the pure-JVM RIFF decoder, energy-hashed
    * ([[graft.operators.Multimodal.energyHash]]). Integer arithmetic
    * end to end — the oracle derives identical codes analytically
    * ([[energyHashCodeCtes]]).
    */
  private def energyCodes(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.{MediaCodecs, Multimodal, SyntheticMedia}
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // cached for the same branch-sharing reason as ahashCodes
    graft.plans.CachedPlans.cached(base.mapPartitions { rows =>
      rows.map { r =>
        val wav = SyntheticMedia.wav(r.getString(1), r.getString(2))
        val (_, _, samples) = MediaCodecs.WavDecoder.decodeSamples(wav)
        val (hi, lo) = Multimodal.energyHash(samples)
        org.apache.spark.sql.Row(r.getLong(0), hi, lo)
      }
    }(enc))
  }

  /** [[multimodalAhashDedup]]'s audio twin: exact energy-code dup
    * groups over the WAV corpus — canonical holder, group size, keep
    * flag; one shuffle on the 64-bit code.
    */
  def multimodalAudioHashDedup(spark: SparkSession,
      sfDir: String): DataFrame = {
    val codes = energyCodes(spark, sfDir)
    val grp = codes.groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
    codes.join(grp, Seq("ahash_hi", "ahash_lo"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("canonical_id"), col("group_size"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  def multimodalAudioHashDedupSql: String =
    s"""WITH ${energyHashCodeCtes()},
      |grp AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS canonical_id,
      |    CAST(count(*) AS BIGINT) AS group_size
      |  FROM code GROUP BY 1, 2)
      |SELECT doc_id, ahash_hi, ahash_lo, canonical_id, group_size,
      |  doc_id = canonical_id AS is_canonical
      |FROM code JOIN grp USING (ahash_hi, ahash_lo)
      |ORDER BY doc_id""".stripMargin

  /** [[multimodalAhashNear]]'s audio twin: Hamming 1..3 pairs between
    * DISTINCT energy codes, banded candidates (pigeonhole-lossless at
    * ≤ 3 flips over 4 bands), quadratic verify in the oracle over
    * representatives only.
    */
  def multimodalAudioHashNear(spark: SparkSession,
      sfDir: String): DataFrame = {
    val reps = energyCodes(spark, sfDir)
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("rep_id"))
    val bandCols = (0 until 4).map { b =>
      val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
      struct(lit(b).as("band"),
        shiftright(half, 16 * (b % 2)).bitwiseAND(lit(0xffffL)).as("bkey"))
    }
    val bands = reps.select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = bands.select(col("band"), col("bkey"), col("rep_id").as("a_id"),
      col("ahash_hi").as("a_hi"), col("ahash_lo").as("a_lo"))
    val bb = bands.select(col("band"), col("bkey"), col("rep_id").as("b_id"),
      col("ahash_hi").as("b_hi"), col("ahash_lo").as("b_lo"))
    a.join(bb, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming").between(1, 3))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  def multimodalAudioHashNearSql: String =
    s"""WITH ${energyHashCodeCtes()},
      |reps AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS rep_id
      |  FROM code GROUP BY 1, 2)
      |SELECT a.rep_id AS a_id, r.rep_id AS b_id,
      |  CAST(bit_count(xor(a.ahash_hi, r.ahash_hi))
      |    + bit_count(xor(a.ahash_lo, r.ahash_lo)) AS INTEGER) AS hamming
      |FROM reps a JOIN reps r ON a.rep_id < r.rep_id
      |WHERE bit_count(xor(a.ahash_hi, r.ahash_hi))
      |  + bit_count(xor(a.ahash_lo, r.ahash_lo)) BETWEEN 1 AND 3
      |ORDER BY a_id, b_id""".stripMargin

  /** [[ahashPayloads]]' VIDEO twin: one 4-frame 16×8 GIF clip per
    * document ([[graft.operators.SyntheticMedia.gif]] — template
    * structure shared across frames, per-frame noise chains) — emitted
    * as payload BYTES so the clip near-dup probes exercise the real
    * GIF-decode-then-pool-then-hash path while the oracle derives the
    * identical codes analytically ([[frameHashCodeCtes]]).
    */
  private[queries] def videoPayloads(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      rows.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          graft.operators.SyntheticMedia.gif(r.getString(1),
            r.getString(2)))
      }
    }(enc)
  }

  /** [[ahashCodeCtes]]' video twin: the CTE chain deriving each clip's
    * 64-bit FRAME-SAMPLED hash analytically — frame f pixel i is
    * palette index v = (t(i)&248)|(n_f(i)&7) (n_f the chain of
    * `text || 'f' || f`), the analytic GIF palette maps v to gray
    * r+g+b = 255 + (7v mod 256), the 8×8 grid samples source pixel
    * (i//8)·16 + 2·(i%8), the 4 sampled frames POOL by summing cell
    * gray, and bit i = cell·64 > Σcells — packed exactly like the
    * image code (`code AS (doc_id, ahash_hi, ahash_lo)` so the banded
    * candidate/verify SQL is shared verbatim).
    */
  private[queries] def frameHashCodeCtes(
      src: String = "documents"): String = {
    val th = AhashChainSql.replaceAll("%s", "g")
    val dhs = (0 until 4).map(f =>
      AhashChainSql.replaceAll("%s", s"(text || 'f$f')"))
    def vExpr(dcol: String) =
      s"((('0x' || substr(thex, CAST(2*((t.i // 8) * 16 + 2*(t.i % 8)) + 1 AS INTEGER), 2))::BIGINT & 248) | " +
        s"(('0x' || substr($dcol, CAST(2*((t.i // 8) * 16 + 2*(t.i % 8)) + 1 AS INTEGER), 2))::BIGINT & 7))"
    val cellExpr = (0 until 4)
      .map(f => s"(255 + ((7 * ${vExpr(s"d${f}hex")}) % 256))")
      .mkString(" + ")
    s"""b AS (
      |  SELECT doc_id, lang || '|' || source AS g, text FROM $src),
      |hx AS (SELECT doc_id, $th AS thex,
      |  ${dhs.zipWithIndex.map { case (d, f) => s"$d AS d${f}hex" }
           .mkString(",\n  ")} FROM b),
      |px AS (
      |  SELECT doc_id, CAST(t.i AS INTEGER) AS i, $cellExpr AS v
      |  FROM hx, UNNEST(range(0, 64)) AS t(i)),
      |s AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
      |bits AS (
      |  SELECT px.doc_id, i, CASE WHEN v * 64 > sv THEN 1 ELSE 0 END AS bit
      |  FROM px JOIN s USING (doc_id)),
      |code AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN i >= 32 THEN CAST(bit AS BIGINT) << (i - 32) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |    CAST(sum(CASE WHEN i < 32 THEN CAST(bit AS BIGINT) << i ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** [[ahashCodes]]' video twin through the REAL pipeline: GIF clip
    * synthesized per document, every frame decoded back by the
    * multi-image reader, frame-sampled and temporally pooled
    * ([[graft.operators.Multimodal.frameSampleHash]]). Integer
    * arithmetic end to end — the oracle derives identical codes
    * analytically ([[frameHashCodeCtes]]).
    */
  private def frameCodes(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.operators.{MediaCodecs, Multimodal, SyntheticMedia}
    val docs = tbl(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
      concat_ws("|", col("lang"), col("source")).as("g"), col("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // cached for the same branch-sharing reason as ahashCodes — the
    // multi-frame GIF decode is the costliest of the three modalities
    graft.plans.CachedPlans.cached(base.mapPartitions { rows =>
      rows.map { r =>
        val gif = SyntheticMedia.gif(r.getString(1), r.getString(2))
        val (hi, lo) = Multimodal.frameSampleHash(
          MediaCodecs.decodeGifFrames(gif))
        org.apache.spark.sql.Row(r.getLong(0), hi, lo)
      }
    }(enc))
  }

  /** [[multimodalAhashDedup]]'s video twin: exact frame-hash dup
    * groups over the GIF clip corpus — canonical holder, group size,
    * keep flag; one shuffle on the 64-bit code.
    */
  def multimodalFrameHashDedup(spark: SparkSession,
      sfDir: String): DataFrame = {
    val codes = frameCodes(spark, sfDir)
    val grp = codes.groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
    codes.join(grp, Seq("ahash_hi", "ahash_lo"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("canonical_id"), col("group_size"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  def multimodalFrameHashDedupSql: String =
    s"""WITH ${frameHashCodeCtes()},
      |grp AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS canonical_id,
      |    CAST(count(*) AS BIGINT) AS group_size
      |  FROM code GROUP BY 1, 2)
      |SELECT doc_id, ahash_hi, ahash_lo, canonical_id, group_size,
      |  doc_id = canonical_id AS is_canonical
      |FROM code JOIN grp USING (ahash_hi, ahash_lo)
      |ORDER BY doc_id""".stripMargin

  /** [[multimodalAhashNear]]'s video twin: Hamming 1..3 pairs between
    * DISTINCT frame-sampled clip codes, banded candidates (pigeonhole-
    * lossless at ≤ 3 flips over 4 bands), quadratic verify in the
    * oracle over representatives only.
    */
  def multimodalFrameHashNear(spark: SparkSession,
      sfDir: String): DataFrame = {
    val reps = frameCodes(spark, sfDir)
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("rep_id"))
    val bandCols = (0 until 4).map { b =>
      val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
      struct(lit(b).as("band"),
        shiftright(half, 16 * (b % 2)).bitwiseAND(lit(0xffffL)).as("bkey"))
    }
    val bands = reps.select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("rep_id"), col("ahash_hi"), col("ahash_lo"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = bands.select(col("band"), col("bkey"), col("rep_id").as("a_id"),
      col("ahash_hi").as("a_hi"), col("ahash_lo").as("a_lo"))
    val bb = bands.select(col("band"), col("bkey"), col("rep_id").as("b_id"),
      col("ahash_hi").as("b_hi"), col("ahash_lo").as("b_lo"))
    a.join(bb, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming").between(1, 3))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  def multimodalFrameHashNearSql: String =
    s"""WITH ${frameHashCodeCtes()},
      |reps AS (
      |  SELECT ahash_hi, ahash_lo, min(doc_id) AS rep_id
      |  FROM code GROUP BY 1, 2)
      |SELECT a.rep_id AS a_id, r.rep_id AS b_id,
      |  CAST(bit_count(xor(a.ahash_hi, r.ahash_hi))
      |    + bit_count(xor(a.ahash_lo, r.ahash_lo)) AS INTEGER) AS hamming
      |FROM reps a JOIN reps r ON a.rep_id < r.rep_id
      |WHERE bit_count(xor(a.ahash_hi, r.ahash_hi))
      |  + bit_count(xor(a.ahash_lo, r.ahash_lo)) BETWEEN 1 AND 3
      |ORDER BY a_id, b_id""".stripMargin

  /** Aggregate language distribution (declared-vs-predicted contingency). */
  def langDist(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    docs.groupBy(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  def langDistSql: String = {
    def cnt(w: String) =
      s"CAST((len(p) - len(replace(p, '$w', ''))) / ${w.length} AS INTEGER)"
    def score(ws: Seq[String]) = ws.map(cnt).mkString("(", " + ", ")")
    val profiles = TextFunctions.DefaultProfiles
    val folds = profiles.tail.zipWithIndex.map { case ((lang, ws), i) =>
      val prev = if (i == 0) s"'${profiles.head._1}'" else s"l$i"
      val prevS = if (i == 0) "s0" else s"sc$i"
      s"CASE WHEN ${score(ws)} > $prevS THEN '$lang' ELSE $prev END AS l${i + 1}, " +
        s"CASE WHEN ${score(ws)} > $prevS THEN ${score(ws)} ELSE $prevS END AS sc${i + 1}"
    }
    s"""WITH base AS (
      |  SELECT lang, n_chars, concat(' ', lower(text), ' ') AS p FROM documents),
      |l0 AS (SELECT *, ${score(profiles.head._2)} AS s0 FROM base),
      |l1 AS (SELECT *, ${folds(0)} FROM l0),
      |l2 AS (SELECT *, ${folds(1)} FROM l1),
      |l3 AS (SELECT *, ${folds(2)} FROM l2)
      |SELECT lang, CASE WHEN sc3 > 0 THEN l3 ELSE 'und' END AS lang_pred,
      |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM l3 GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin
  }

  /** UTF-8 contract witness for the text surface: the same
    * codepoint-level primitives the other text queries ride on
    * (whitespace tokenization, `length`, regexp `.` char split, md5,
    * mean token length), exercised over MULTI-BYTE text — Latin-1
    * accents, a CJK character and a supplementary-plane emoji — derived
    * deterministically from the documents table via replace chains, so
    * both engines transform the identical input and no synthetic data
    * is involved. Pins cross-engine facts: `length()` counts
    * codepoints on both sides, regex `\s+` is ASCII whitespace in Java
    * regex and RE2 alike, regex `.` consumes one codepoint per match
    * (4-byte sequences included), and md5 hashes the UTF-8 bytes.
    */
  def utf8Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val utext = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), "a", "ä"),
        "o", "漢"),
      "e", "🙂")
    docs
      .select(col("doc_id"), utext.as("utext"))
      .select(col("doc_id"), col("utext"),
        graft.functions.TextFunctions.tokens(col("utext")).as("_toks"))
      .select(col("doc_id"),
        length(col("utext")).cast("long").as("n_chars"),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(regexp_extract_all(col("utext"), lit("."), lit(0)))
          .cast("long").as("n_points"),
        graft.functions.TextFunctions.meanTokenLenOfToks(col("_toks"))
          .as("mean_token_len"),
        md5(col("utext")).as("fp"))
      .orderBy(col("doc_id"))
  }

  def utf8ProfileSql: String = {
    val toks = "list_filter(string_split_regex(utext, '\\s+'), x -> x <> '')"
    s"""WITH u AS (
      |  SELECT doc_id,
      |    replace(replace(replace(text, 'a', 'ä'), 'o', '漢'), 'e', '🙂')
      |      AS utext
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(utext) AS BIGINT) AS n_chars,
      |  CAST(len($toks) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(utext, '.')) AS BIGINT) AS n_points,
      |  CASE WHEN len($toks) = 0 THEN 0.0
      |    ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform($toks, t -> CAST(length(t) AS BIGINT))),
      |        (x, y) -> x + y) AS DOUBLE)
      |      / CAST(len($toks) AS DOUBLE) END AS mean_token_len,
      |  md5(utext) AS fp
      |FROM u ORDER BY doc_id""".stripMargin
  }

  /** Count-min-sketch heavy hitters over word 3-grams: occurrences
    * (with multiplicity) feed a 4×1024 counter table — fixed-size
    * however large the corpus — and the top 20 grams by sketch
    * estimate come back with the true count beside the estimate (CMS
    * error is one-sided: est ≥ exact always, pinned by SketchesSpec).
    * The oracle replays every counter cell and the min-over-rows
    * estimate from the same md5 positions.
    */
  def ngramHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sketches.cmsHeavyHitters(
      tbl(spark, sfDir, "documents"), "text", n = 3, depth = 4,
      width = 1024, topK = 20)

  def ngramHeavyHittersSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
      |    ELSE array_to_string(t[i:i+2], ' ') END AS g
      |  FROM (SELECT doc_id, t,
      |          unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
      |        FROM toks)),
      |rs AS (SELECT CAST(t.r AS BIGINT) AS r FROM UNNEST(range(0, 4)) t(r)),
      |cells AS (
      |  SELECT r,
      |    ('0x' || substr(md5(concat_ws('|', r, g)), 1, 15))::BIGINT % 1024 AS c,
      |    count(*) AS cnt
      |  FROM grams CROSS JOIN rs GROUP BY 1, 2),
      |exact AS (SELECT g, count(*) AS exact_cnt FROM grams GROUP BY g),
      |est AS (
      |  SELECT e.g, min(coalesce(cells.cnt, 0)) AS est
      |  FROM exact e CROSS JOIN rs
      |  LEFT JOIN cells ON cells.r = rs.r AND cells.c =
      |    ('0x' || substr(md5(concat_ws('|', rs.r, e.g)), 1, 15))::BIGINT % 1024
      |  GROUP BY e.g)
      |SELECT est.g AS ngram, est.est AS est, exact.exact_cnt
      |FROM est JOIN exact USING (g)
      |ORDER BY est DESC, ngram LIMIT 20""".stripMargin

  // ------------------------------------------- n-gram LM quality scoring

  private val LmQuantScale = 1073741824.0 // 2^30

  /** Per-doc transitions (w1 → w2 for consecutive token pairs) — a pure
    * per-row expression: the token array zipped against itself shifted
    * by one, no shuffle until the counts aggregate.
    */
  private def transitions(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        TextFunctions.tokens(lower(col("text"))).as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
          "(w, i) -> named_struct('w1', w, 'w2', element_at(t, i + 2)))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  private def unigrams(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n1"))

  /** CCNet-style language-model quality scoring: a bigram LM with add-1
    * smoothing is trained on the corpus itself and every document is
    * scored by its MEAN transition probability
    * `p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V)`, then cut into head / middle
    * / tail thirds by global score rank — the perplexity-bucket
    * filtering step of CCNet/CC-Net-style pipelines (Wenzek et al.
    * 2020), with mean-probability standing in for perplexity so the
    * score stays EXACT cross-engine: each p is quantized to
    * `floor(p·2^30)` (the division is one correctly-rounded IEEE op and
    * the 2^30 scaling is exact), summed as longs (order-independent),
    * and the mean is a fixed two-division sequence.
    *
    * Scale shape: two token-keyed aggregates (unigram, bigram counts),
    * one join of the corpus transitions against the bigram table (AQE
    * broadcasts it when the vocabulary is small, shuffles otherwise),
    * `V` rides a 1-row broadcast, and the global rank for the tertile
    * cut is [[graft.operators.Packing.globalRank]]'s range-partition +
    * lifted-offsets form — no single-partition window anywhere.
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val trans = graft.plans.CachedPlans.cached(transitions(docs))
    val uni = unigrams(docs)
    val vRow = broadcast(uni.select(count(lit(1)).as("v")))
    val big = trans.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val scored = trans
      .join(big, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(vRow)
      .select(col("doc_id"),
        floor((col("n12") + 1).cast(DoubleType) /
            (col("n1") + col("v")).cast(DoubleType) * lit(LmQuantScale))
          .cast("long").as("q"))
    val perDoc = docs.select(col("doc_id"))
      .join(scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_trans"), sum(col("q")).as("lm_q")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("lm_q"), lit(0L)).as("lm_q"))
      .withColumn("lm_score",
        when(col("n_trans") === 0, lit(0.0))
          .otherwise(col("lm_q").cast(DoubleType) /
            col("n_trans").cast(DoubleType) / lit(LmQuantScale)))
    val nRow = broadcast(perDoc.select(count(lit(1)).as("nn")))
    graft.operators.Packing
      .globalRank(perDoc, "rn", col("lm_score").desc, col("doc_id"))
      .crossJoin(nRow)
      .withColumn("bucket", expr("CAST(1 + ((rn - 1) * 3) DIV nn AS INT)"))
      .select(col("doc_id"), col("n_trans"), col("lm_q"), col("lm_score"),
        col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val ToksCte =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  private val TransCte =
    """trans AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks))""".stripMargin

  def lmScoreSql: String =
    s"""WITH $ToksCte,
      |uni AS (SELECT w, count(*) AS n1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |v AS (SELECT count(*) AS v FROM uni),
      |$TransCte,
      |big AS (SELECT w1, w2, count(*) AS n12 FROM trans GROUP BY w1, w2),
      |scored AS (
      |  SELECT tr.doc_id,
      |    CAST(floor(CAST(b.n12 + 1 AS DOUBLE) / CAST(u.n1 + v.v AS DOUBLE)
      |      * $LmQuantScale) AS BIGINT) AS q
      |  FROM trans tr
      |  JOIN big b ON b.w1 = tr.w1 AND b.w2 = tr.w2
      |  JOIN uni u ON u.w = tr.w1
      |  CROSS JOIN v),
      |doc AS (
      |  SELECT d.doc_id, CAST(count(s.q) AS BIGINT) AS n_trans,
      |    CAST(coalesce(sum(s.q), 0) AS BIGINT) AS lm_q
      |  FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
      |  GROUP BY d.doc_id),
      |final AS (
      |  SELECT doc_id, n_trans, lm_q,
      |    CASE WHEN n_trans = 0 THEN 0.0
      |      ELSE CAST(lm_q AS DOUBLE) / CAST(n_trans AS DOUBLE) / $LmQuantScale
      |    END AS lm_score
      |  FROM doc),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY lm_score DESC, doc_id) AS rn,
      |    count(*) OVER () AS nn
      |  FROM final)
      |SELECT doc_id, n_trans, lm_q, lm_score,
      |  CAST(1 + ((rn - 1) * 3) // nn AS INTEGER) AS bucket
      |FROM ranked ORDER BY doc_id""".stripMargin

  private val PmiMinCount = 5
  private val PmiK = 50

  /** PMI collocation mining: the top-`$PmiK` bigrams by pointwise mutual
    * information — the phrase-mining step that seeds tokenizer special
    * vocab and n-gram merge lists. PMI = log of the independence ratio
    * `p(w1,w2)/(p(w1)p(w2))`; log is monotone, so the query ranks and
    * reports the RATIO itself, keeping every compared value exact
    * cross-engine: `(n12/n1)·(N/n2)` is a fixed sequence of two
    * correctly-rounded IEEE divisions and one multiplication (this
    * factoring also cannot overflow — the naive `n12·N/(n1·n2)` long
    * products would at corpus scale). Bigrams below $PmiMinCount
    * occurrences are dropped (the standard low-count PMI guard).
    *
    * Scale shape: bigram + unigram count aggregates, two joins of the
    * bounded bigram table against the bounded unigram table, `N` on a
    * 1-row broadcast, global top-K by sort-limit (Spark's
    * TakeOrderedAndProject — no full sort materialization).
    */
  def pmiPhrases(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val trans = transitions(docs)
    val uni = unigrams(docs)
    val nRow = broadcast(
      docs.select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
        .select(count(lit(1)).as("nt")))
    trans.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= PmiMinCount)
      .join(uni.select(col("w").as("w1"), col("n1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n1").as("n2")), Seq("w2"))
      .crossJoin(nRow)
      .withColumn("pmi_ratio",
        col("n12").cast(DoubleType) / col("n1").cast(DoubleType) *
          (col("nt").cast(DoubleType) / col("n2").cast(DoubleType)))
      .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
        col("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(PmiK)
  }

  def pmiPhrasesSql: String =
    s"""WITH $ToksCte,
      |uni AS (SELECT w, count(*) AS n1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |nt AS (SELECT CAST(sum(len(t)) AS BIGINT) AS nt FROM toks),
      |$TransCte,
      |big AS (SELECT w1, w2, count(*) AS n12 FROM trans GROUP BY w1, w2)
      |SELECT b.w1, b.w2, b.n12, u1.n1, u2.n1 AS n2,
      |  CAST(b.n12 AS DOUBLE) / CAST(u1.n1 AS DOUBLE)
      |    * (CAST(nt.nt AS DOUBLE) / CAST(u2.n1 AS DOUBLE)) AS pmi_ratio
      |FROM big b
      |JOIN uni u1 ON u1.w = b.w1
      |JOIN uni u2 ON u2.w = b.w2
      |CROSS JOIN nt
      |WHERE b.n12 >= $PmiMinCount
      |ORDER BY pmi_ratio DESC, b.w1, b.w2 LIMIT $PmiK""".stripMargin
}
