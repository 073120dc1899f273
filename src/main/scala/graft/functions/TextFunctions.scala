package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Text-analysis primitives for LLM-data pipelines, all expressed with
  * built-in (codegen'd) SQL functions so they run inside whole-stage
  * codegen at full scan speed — no UDFs anywhere.
  *
  * Portability note: every function here sticks to regex features shared
  * by Java regex and RE2 (plain character classes, `+`), and to
  * split/replace semantics that match ANSI engines, so results can be
  * re-derived by an external oracle.
  */
object TextFunctions {

  /** Tokens on whitespace runs; leading/trailing empties removed.
    * (`split` keeps boundary empties in Spark and DuckDB alike — filtering
    * non-empty gives identical token lists.)
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish lexical token count: runs of letters, runs of digits, or a
    * single non-alnum non-space char each count as one token.
    */
  def lexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Number of (possibly overlapping) occurrences of `needle` counted via
    * length difference — the engine-portable substring-count idiom.
    */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit(""))))
      / needle.length).cast(IntegerType)

  /** Tiny trigram/stopword language-ID heuristic. Scores each candidate
    * language by occurrences of its most characteristic function words and
    * picks the argmax (ties → earlier language in `profiles`). Returns
    * "und" when nothing matched.
    */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " la ", " y ", " es "))

  def langId(text: Column,
      profiles: Seq[(String, Seq[String])] = DefaultProfiles): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = profiles.map { case (lang, words) =>
      val score = words.map(w => countOccurrences(padded, w))
        .reduce(_ + _)
      (lang, score)
    }
    // argmax with first-wins tie-break, expressed as a chained CASE
    val best = scored.tail.foldLeft(
      (lit(scored.head._1), scored.head._2)) { case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl),
          when(s > bs, s).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Ratio of punctuation chars to total chars (NULL-safe, 0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.!?,;:]", "")).cast(DoubleType)
        / length(text).cast(DoubleType))

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
        "to", "in", "is", "it")): Column =
    stopwordRatioOfToks(tokens(lower(text)), stopwords)

  /** [[stopwordRatio]] from a pre-tokenized LOWERCASED token array —
    * the body references its token input three times (the filter and
    * two size guards), and a Column-level inline duplicates the whole
    * tokenize per reference (interpreted HOFs get no common-
    * subexpression elimination), so multi-metric scans materialize the
    * array once in a child projection and pass the column here.
    */
  def stopwordRatioOfToks(toks: Column,
      stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
        "to", "in", "is", "it")): Column = {
    val stops = size(filter(toks,
      t => stopwords.map(s => t === lit(s)).reduce(_ || _)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(stops.cast(DoubleType) / size(toks).cast(DoubleType))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = meanTokenLenOfToks(tokens(text))

  /** [[meanTokenLen]] from a pre-tokenized array — same sharing
    * rationale as [[stopwordRatioOfToks]] (three references).
    */
  def meanTokenLenOfToks(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast(DoubleType) / size(toks).cast(DoubleType))

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and a healthy stopword rate. Deterministic double
    * arithmetic; weights are part of the contract.
    */
  def qualityScore(text: Column, nChars: Column): Column =
    qualityScoreOfToks(text, nChars, tokens(lower(text)))

  /** [[qualityScore]] with the lowercased token array passed in — the
    * stopword term is the only tokenizing component; the punctuation
    * term stays on the raw text.
    */
  def qualityScoreOfToks(text: Column, nChars: Column,
      lowerToks: Column): Column = {
    val lenScore = least(nChars.cast(DoubleType) / lit(400.0), lit(1.0))
    val punct = punctRatio(text)
    val stop = stopwordRatioOfToks(lowerToks)
    val punctScore = lit(1.0) - least(punct * lit(10.0), lit(1.0))
    val stopScore = least(stop * lit(4.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * punctScore + lit(0.3) * stopScore
  }

  /** Winnowing-style document fingerprint: the sorted set of "selected"
    * word-shingle hashes (those whose md5 ends in `selectHex`). Two
    * near-identical documents share most fingerprint elements; the full
    * fingerprint is compact (≈ 1/16 of shingles per selection hex char).
    */
  def fingerprint(text: Column, shingleLen: Int = 5,
      selectSuffixes: Seq[String] = Seq("0", "1")): Column = {
    val sh = wordShingles(text, shingleLen)
    val hashed = transform(sh, s => md5(s))
    array_sort(array_distinct(filter(hashed,
      h => selectSuffixes.map(s => h.endsWith(s)).reduce(_ || _))))
  }

  /** Distinct word `n`-grams (as space-joined strings) of the lowercased
    * text. The shared shingling primitive for fingerprint / MinHash /
    * Jaccard dedup.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(lower(text)), n)

  /** Same, from a pre-tokenized array column — lets pipelines that need
    * several shingle widths tokenize (and cache) once.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
}
