package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import Tables._

/** Lexical retrieval queries: BM25 top-k search of the corpus from a
  * deterministic pseudo-query slice (every 101st document plays a
  * "benchmark query", its 8 rarest distinct terms the query terms) —
  * the relevance-search counterpart of the decontamination probes.
  *
  * Terms are word BIGRAMS, not unigrams: the synthetic corpus draws
  * from a ~31-token vocabulary, so every unigram appears in ~78% of
  * documents and unigram BM25 degenerates to "score the whole corpus
  * for every query" (measured: 1.5M scored rows). Bigram terms (vocab
  * ~931, query-term df 10-304) make retrieval selective — the standard
  * "bigram indexing" move for low-entropy text.
  */
object RetrievalQueries {

  val Bm25K = 10
  val Bm25QTerms = 8
  val QueryMod = 101L

  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Retrieval.bm25TopK(
        docs, docs.filter(col("doc_id") % QueryMod === 0),
        "doc_id", "text", "doc_id", "text", k = Bm25K, qTerms = Bm25QTerms,
        termNgram = 2)
      .orderBy(col("q_id"), col("rank"))
  }

  def bm25TopKSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS tok
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
      |tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM pos GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
      |       FROM pos GROUP BY doc_id),
      |stats AS (
      |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
      |         (SELECT CAST(count(*) AS BIGINT) FROM pos) AS total_len),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      |qt AS (
      |  SELECT q_id, tok FROM (
      |    SELECT q.q_id, q.tok,
      |      row_number() OVER (PARTITION BY q.q_id
      |        ORDER BY df.df, q.tok) AS rn
      |    FROM (SELECT DISTINCT doc_id AS q_id, tok FROM pos
      |          WHERE doc_id % $QueryMod = 0) q
      |    JOIN df USING (tok))
      |  WHERE rn <= $Bm25QTerms),
      |hits AS (
      |  SELECT qt.q_id, tf.doc_id, tf.tf, df.df, dl.dl
      |  FROM qt JOIN tf USING (tok) JOIN df USING (tok)
      |  JOIN dl ON dl.doc_id = tf.doc_id),
      |scoreq AS (
      |  SELECT q_id, doc_id,
      |    CAST((10000::HUGEINT * (2*s.n_docs - 2*df + 1) * 44 * tf * s.total_len)
      |      // ((2*df + 1) * (20::HUGEINT * tf * s.total_len
      |          + 6 * s.total_len + 18 * dl * s.n_docs)) AS BIGINT) AS score_q
      |  FROM hits, stats s),
      |agg AS (
      |  SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |    CAST(sum(score_q) AS BIGINT) AS score
      |  FROM scoreq GROUP BY q_id, doc_id),
      |ranked AS (
      |  SELECT q_id, doc_id, n_terms, score,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY score DESC, doc_id) AS INT) AS rank
      |  FROM agg)
      |SELECT q_id, rank, doc_id, n_terms, score
      |FROM ranked WHERE rank <= $Bm25K
      |ORDER BY q_id, rank""".stripMargin
}
