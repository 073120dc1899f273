package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Byte-pair-encoding tokenizer trained from the corpus itself — the
  * public-knowledge BPE construction (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair, and tokenize by replaying the merges in rank order. It
  * upgrades the whitespace/lexical token counts used by `text_profile`
  * and `pack_sequences` to counts a real training pipeline budgets with.
  *
  * Everything is DETERMINISTIC and engine-replayable, so token counts
  * are oracle-checkable:
  *   - training runs on the WORD-COUNT table (one corpus-sized groupBy;
  *     everything after scales with vocabulary, not corpus — the same
  *     economics real BPE trainers get from pre-counting words);
  *   - pair counting is a vocabulary groupBy with ties broken by
  *     (count DESC, a, b) byte order;
  *   - a word's symbol sequence is one separator-wrapped STRING
  *     (`␟a␟b␟…␟`), and a merge (a, b) is string replacement of
  *     `␟a␟b␟` with `␟ab␟` — the boundary separators make a multi-char
  *     symbol unsplittable mid-symbol. One left-to-right replace pass
  *     misses back-to-back occurrences (the replaced trailing separator
  *     would have to start the next match), so each merge applies
  *     [[Passes]] passes — convergent for symbol runs up to 2^Passes,
  *     far past any real word — making the result the exhaustive
  *     leftmost-first merge, exactly what SQL `replace` chains replay.
  *
  * The text contract is UTF-8 at codepoint granularity (BpeSpec
  * exercises multi-byte and supplementary-plane symbols): per-character
  * splitting uses `regexp_extract_all(word, '.')`, which consumes one
  * codepoint per match — surrogate pairs included — in both Java regex
  * and RE2; tie-breaks compare symbols in codepoint (= UTF-8 binary)
  * order in every engine; `length(word)` counts codepoints on both
  * sides. Excluded from the contract: words containing U+0085/U+2028/
  * U+2029 (Java `.` excludes them where RE2 matches them, and ASCII
  * `\s+` tokenization lets them through intact) and locale-sensitive
  * case mappings in the caller's lowercasing.
  */
object Bpe {

  /** Symbol separator (ASCII unit separator — never appears in text). */
  val Sep = "\u001f"

  /** Replace passes per merge: handles back-to-back merge sites in
    * symbol runs up to 2^Passes long (see class doc).
    */
  val Passes = 8

  final case class Merge(rank: Int, a: String, b: String, weight: Long)

  private def symbols(sym: Column): Column =
    filter(split(sym, Sep), s => s =!= lit(""))

  /** Word-count vocabulary with each word's initial (character-level)
    * symbol string. One corpus scan + one groupBy; everything downstream
    * of this is vocabulary-sized.
    */
  def baseVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym", concat(lit(Sep),
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), Sep),
        lit(Sep)))

  /** Adjacent-pair frequencies of a vocabulary, weighted by word count:
    * `(a, b, n)` for every consecutive symbol pair, occurrences counted
    * with multiplicity (the standard BPE statistic).
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val arr = symbols(col("sym"))
    val pairs = zip_with(
      slice(arr, lit(1), size(arr) - 1),
      slice(arr, lit(2), size(arr) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))
    vocab.select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))
  }

  private def applyMerge(sym: Column, a: String, b: String): Column = {
    val pat = Sep + a + Sep + b + Sep
    val rep = Sep + a + b + Sep
    (1 to Passes).foldLeft(sym)((s, _) =>
      call_function("replace", s, lit(pat), lit(rep)))
  }

  /** Train `numMerges` frequency-ranked merges and return the merged
    * vocabulary (word, cnt, sym) plus the merge table. Each round is one
    * vocabulary-sized groupBy and a ONE-ROW collect (the argmax pair);
    * the refreshed vocabulary is persisted and the previous round's
    * cache released, so the plan depth stays bounded. Stops early if no
    * adjacent pair remains (every word fully merged).
    */
  def train(docs: DataFrame, textCol: String,
      numMerges: Int): (DataFrame, Seq[Merge]) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab = baseVocab(docs, textCol).persist()
    vocab.count()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption match {
        case None => exhausted = true
        case Some(Row(a: String, b: String, n: Long)) =>
          merges += Merge(rank, a, b, n)
          val next = vocab
            .withColumn("sym", applyMerge(col("sym"), a, b))
            .persist()
          next.count()
          vocab.unpersist()
          vocab = next
          rank += 1
        case Some(other) =>
          sys.error(s"unexpected pair row shape: $other")
      }
    }
    (vocab, merges.result())
  }

  /** Codepoint-order string comparison — equals UTF-8 binary order (what
    * Spark's string orderBy and DuckDB both use) on every valid string.
    */
  private def cpCompare(x: String, y: String): Int = {
    val xi = x.codePoints().iterator()
    val yi = y.codePoints().iterator()
    while (xi.hasNext && yi.hasNext) {
      val c = Integer.compare(xi.next(), yi.next())
      if (c != 0) return c
    }
    if (xi.hasNext) 1 else if (yi.hasNext) -1 else 0
  }

  /** Driver-local merge loop over the collected word-count vocabulary —
    * [[train]]'s semantics at real vocabulary scale. The distributed
    * trainer launches two Spark jobs per merge (pair-count argmax +
    * vocabulary refresh); at a production 32k-merge vocabulary that is
    * ~64k sequential jobs of pure scheduling latency for work whose
    * input — the word-count table, vocabulary-sized by construction —
    * fits on any driver. This trainer pays the SAME one corpus-sized
    * groupBy ([[baseVocab]]), collects the vocabulary (guarded by
    * `maxVocabWords`), and runs the merge loop in memory with
    * incremental pair-count maintenance: only words indexed as
    * containing the merged pair are touched per round, the standard
    * learn-BPE bookkeeping of the public construction. Statistics,
    * tie-breaks (count DESC, a, b) and merge application (the same
    * [[Passes]]-fold of leftmost non-overlapping separator-string
    * replacement, via the same algorithm `java.lang.String.replace`
    * shares with Spark's `replace`) are bit-identical to [[train]] —
    * BpeSpec cross-checks the two trainers merge-for-merge.
    */
  def trainLocal(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Long = 50000000L): (DataFrame, Seq[Merge]) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val spark = docs.sparkSession
    val base = baseVocab(docs, textCol).persist()
    val vocabSize = base.count()
    require(vocabSize <= maxVocabWords,
      s"vocabulary has $vocabSize words > maxVocabWords=$maxVocabWords; " +
        "raise the cap or use the distributed train()")
    val collected = base
      .select(col("word"), col("cnt"), col("sym")).collect()
    base.unpersist()
    val wordText = collected.map(_.getString(0))
    val cnts = collected.map(_.getLong(1))
    val syms = collected.map(_.getString(2))

    def pairsOf(sym: String): Array[(String, String)] = {
      val ss = sym.split(Sep).filter(_.nonEmpty)
      Array.tabulate(math.max(ss.length - 1, 0))(i => (ss(i), ss(i + 1)))
    }
    val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
    // pair -> words that have contained it (a superset after merges; a
    // stale member just no-ops when its current sym lacks the pair)
    val index = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def account(wi: Int, sym: String, sign: Long): Unit =
      pairsOf(sym).foreach { p =>
        val n = stats.getOrElse(p, 0L) + sign * cnts(wi)
        if (n <= 0L) stats.remove(p) else stats.update(p, n)
        if (sign > 0L)
          index.getOrElseUpdate(
            p, scala.collection.mutable.HashSet.empty[Int]) += wi
      }
    syms.indices.foreach(wi => account(wi, syms(wi), 1L))

    def mergeWord(sym: String, a: String, b: String): String = {
      val pat = Sep + a + Sep + b + Sep
      val rep = Sep + a + b + Sep
      (1 to Passes).foldLeft(sym)((s, _) => s.replace(pat, rep))
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges && stats.nonEmpty) {
      // argmax by (count DESC, a, b) — the distributed orderBy's total
      // order, so HashMap iteration order cannot leak in. Symbol order
      // must be CODEPOINT order (Spark sorts strings in UTF-8 binary
      // order = codepoint order; Java compareTo is UTF-16 unit order,
      // which ranks supplementary-plane symbols below U+E000..U+FFFF)
      var bestEntry: ((String, String), Long) = null
      stats.foreach { e =>
        if (bestEntry == null) bestEntry = e
        else {
          val c = java.lang.Long.compare(e._2, bestEntry._2)
          val better = c > 0 || (c == 0 && {
            val ca = cpCompare(e._1._1, bestEntry._1._1)
            ca < 0 || (ca == 0 && cpCompare(e._1._2, bestEntry._1._2) < 0)
          })
          if (better) bestEntry = e
        }
      }
      val ((a, b), n) = bestEntry
      merges += Merge(rank, a, b, n)
      index.remove((a, b)).foreach(_.foreach { wi =>
        val old = syms(wi)
        val neu = mergeWord(old, a, b)
        if (neu != old) {
          account(wi, old, -1L)
          syms(wi) = neu
          account(wi, neu, 1L)
        }
      })
      rank += 1
    }
    import spark.implicits._
    val outVocab = wordText.indices
      .map(i => (wordText(i), cnts(i), syms(i))).toSeq
      .toDF("word", "cnt", "sym")
    (outVocab, merges.result())
  }

  /** Per-document BPE token counts under a trained vocabulary: every
    * word occurrence contributes its merged symbol count, and a word
    * the vocabulary has never seen falls back to its character-level
    * (untrained) symbol count instead of silently dropping out of both
    * totals — the natural incremental case is counting a NEW batch
    * under a stored vocabulary. Output one row per input document —
    * `(idCol, n_words, n_tokens_bpe)`, zeros for wordless documents.
    * The join is docs-words × vocabulary (the small side broadcastable
    * at any corpus size where the vocab fits; a shuffle join otherwise)
    * — the corpus never re-tokenizes below the word level.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val perWord = vocab.select(col("word"),
      size(symbols(col("sym"))).cast("long").as("_n_tok"))
    val perDoc = words.join(perWord, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nw"),
        sum(coalesce(col("_n_tok"),
          length(col("word")).cast("long"))).as("_nt"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_nw"), lit(0L)).as("n_words"),
        coalesce(col("_nt"), lit(0L)).as("n_tokens_bpe"))
  }

  /** Per-document subword token stream under a trained vocabulary: one
    * row per token OCCURRENCE (id, token). In-vocabulary words expand
    * to their merged subwords; out-of-vocabulary words fall back to
    * per-CODEPOINT tokens (Java regex `.` consumes one codepoint,
    * matching the engine's UTF-8 contract and [[tokenCounts]]'s
    * char-count fallback), so the stream is total over any probe
    * corpus. Scan-shaped: explode → broadcast-able vocabulary join →
    * explode; nothing shuffles on the corpus.
    */
  def tokenRows(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    words.join(vocab.select(col("word"), symbols(col("sym")).as("_toks")),
        Seq("word"), "left")
      .select(col(idCol),
        explode(coalesce(col("_toks"),
          regexp_extract_all(col("word"), lit("."), lit(0)))).as("token"))
  }
}
