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
  * The corpus contract is ASCII text (the same contract the other
  * oracle-checked text queries lean on); per-character splitting uses
  * `regexp_extract_all(word, '.')`, identical in Spark and DuckDB for
  * single-byte characters.
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

  /** Per-document BPE token counts under a trained vocabulary: every
    * word occurrence contributes its merged symbol count. Output one row
    * per input document — `(idCol, n_words, n_tokens_bpe)`, zeros for
    * wordless documents. The join is docs-words × vocabulary (the small
    * side broadcastable at any corpus size where the vocab fits; a
    * shuffle join otherwise) — the corpus never re-tokenizes below the
    * word level.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val perWord = vocab.select(col("word"),
      size(symbols(col("sym"))).cast("long").as("_n_tok"))
    val perDoc = words.join(perWord, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nw"), sum(col("_n_tok")).as("_nt"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_nw"), lit(0L)).as("n_words"),
        coalesce(col("_nt"), lit(0L)).as("n_tokens_bpe"))
  }
}
