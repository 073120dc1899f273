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

  /** [[bm25TopK]] probing the persisted inverted index
    * ([[QueryIndexes.lexical]]) — same query slice, same oracle,
    * bit-identical scores; the probe never re-tokenizes corpus text.
    */
  def bm25TopKIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    graft.operators.Retrieval.bm25TopKIndexed(
        QueryIndexes.lexical(spark, sfDir),
        docs.filter(col("doc_id") % QueryMod === 0),
        "doc_id", "text", k = Bm25K, qTerms = Bm25QTerms)
      .orderBy(col("q_id"), col("rank"))
  }

  def bm25TopKSql: String =
    s"""WITH $bm25Ctes
      |SELECT q_id, rank, doc_id, n_terms, score
      |FROM ranked WHERE rank <= $Bm25K
      |ORDER BY q_id, rank""".stripMargin

  /** The BM25 CTE chain up to `ranked` (unfiltered rank over all
    * candidates) — shared by the declared top-k query and the hybrid
    * fusion oracle, which consumes a deeper slice of the same ranking.
    */
  private def bm25Ctes: String =
    s"""toks AS (
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
      |  FROM agg)""".stripMargin

  val HybridK = 10
  val LegK = 20
  val RrfK = 60

  /** Hybrid retrieval: BM25 lexical top-`LegK` fused with dense cosine
    * top-`LegK` (brute force — the exact leg; the ANN families are the
    * declared scale path for the dense side) by reciprocal-rank fusion.
    * The lexical leg drops each query's own document (its trivial #1
    * self-match; the dense leg's operator already excludes self) and
    * re-ranks, so both legs feed honest neighbor lists. Only integer
    * RANKS cross the fusion boundary — the fused score is a sum of
    * floor(10000/(60+rank)) terms, bit-exact cross-engine.
    */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val emb = tbl(spark, sfDir, "embeddings")
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    val lex = graft.operators.Retrieval.bm25TopK(
        docs, docs.filter(col("doc_id") % QueryMod === 0),
        "doc_id", "text", "doc_id", "text", k = LegK, qTerms = Bm25QTerms,
        termNgram = 2)
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(lexW))
      .select(col("q_id"), col("doc_id"), col("rank"))
    val den = graft.operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", LegK)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    graft.operators.Retrieval.rrfFuse(Seq(lex, den), k = HybridK,
        rrfK = RrfK)
      .orderBy(col("q_id"), col("rank"))
  }

  /** [[hybridRrf]] served ENTIRELY from persisted indexes — the lexical
    * leg probes the BM25 inverted index ([[QueryIndexes.lexical]]: no
    * corpus re-tokenization), the dense leg scores the full-corpus
    * vector index's stored floats ([[QueryIndexes.vectorsFull]]: no
    * embeddings re-scan). Same query slice, same fusion, same oracle —
    * bit-identical to the recompute form because stored floats
    * round-trip parquet exactly and the lexical index is gated
    * bit-identical by `text_bm25_indexed`. At 100 TB this is the shape
    * you'd run: both corpus-scale artifacts are build-once bucketed
    * tables, so a query batch pays batch-sized work per leg.
    */
  def hybridRrfIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val emb = tbl(spark, sfDir, "embeddings")
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    val lex = graft.operators.Retrieval.bm25TopKIndexed(
        QueryIndexes.lexical(spark, sfDir),
        docs.filter(col("doc_id") % QueryMod === 0),
        "doc_id", "text", k = LegK, qTerms = Bm25QTerms)
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(lexW))
      .select(col("q_id"), col("doc_id"), col("rank"))
    val idx = QueryIndexes.vectorsFull(spark, sfDir)
    val den = graft.operators.Similarity.bruteForceTopK(
        idx.buckets.select(col("id").as("vec_id"),
          col("vec").as("embedding")),
        emb.filter(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", LegK)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    graft.operators.Retrieval.rrfFuse(Seq(lex, den), k = HybridK,
        rrfK = RrfK)
      .orderBy(col("q_id"), col("rank"))
  }

  val IvfCentroids = 20
  val IvfNprobe = 3

  /** [[hybridRrf]] with the dense leg swapped for IVF ANN — the
    * declared 100 TB dense path (bounded deterministic centroids,
    * 3-list probe) instead of the exact brute-force leg. Still
    * oracle-EXACT: the IVF assignment replays in SQL via the engine's
    * order-preserving packed argmax key (the `ann_ivf_topk` contract),
    * and only integer ranks cross the fusion boundary. The fused
    * results differ from [[hybridRrf]] exactly where IVF's probe misses
    * a true neighbor — the recall gates quantify that, the oracle gates
    * the computation itself.
    */
  def hybridRrfIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = tbl(spark, sfDir, "documents")
    val emb = tbl(spark, sfDir, "embeddings")
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    val lex = graft.operators.Retrieval.bm25TopK(
        docs, docs.filter(col("doc_id") % QueryMod === 0),
        "doc_id", "text", "doc_id", "text", k = LegK, qTerms = Bm25QTerms,
        termNgram = 2)
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(lexW))
      .select(col("q_id"), col("doc_id"), col("rank"))
    val den = graft.operators.Similarity.ivfTopK(
        emb, emb.filter(col("vec_id") % QueryMod === 0),
        "vec_id", "embedding", LegK, numCentroids = IvfCentroids,
        nprobe = IvfNprobe)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"))
    graft.operators.Retrieval.rrfFuse(Seq(lex, den), k = HybridK,
        rrfK = RrfK)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The IVF dense-leg CTE chain (renamed `iv*` to dodge the bm25
    * chain's names) up to `den` — the `ann_ivf_topk` oracle re-derived
    * for the hybrid's query slice and leg depth.
    */
  private def ivfLegCtes: String =
    s"""ivcent0 AS (
      |  SELECT vec_id AS cent_id, embedding AS cent_vec,
      |    ${dotSql("embedding", "embedding")} AS cent_norm
      |  FROM embeddings
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $IvfCentroids),
      |ivcent AS (
      |  SELECT *, row_number() OVER (ORDER BY cent_id) - 1 AS cent_idx
      |  FROM ivcent0),
      |ivc AS (
      |  SELECT vec_id AS n_id, embedding AS n_vec,
      |    ${dotSql("embedding", "embedding")} AS n_norm
      |  FROM embeddings),
      |ivbest AS (
      |  SELECT n_id, max(coalesce(CAST(floor(
      |      ${dotSql("ivc.n_vec", "ivcent.cent_vec")} / nullif(sqrt(ivc.n_norm) * sqrt(ivcent.cent_norm), 0.0)
      |      * 4503599627370496.0) AS BIGINT), -4503599627370497) * 1024
      |      + (1023 - cent_idx)) AS ck
      |  FROM ivc CROSS JOIN ivcent GROUP BY n_id),
      |ivassigned AS (
      |  SELECT b.n_id, ivc.n_vec, ivc.n_norm, ivcent.cent_id
      |  FROM ivbest b
      |  JOIN ivcent ON ivcent.cent_idx = 1023 - (((b.ck % 1024) + 1024) % 1024)
      |  JOIN ivc ON ivc.n_id = b.n_id),
      |ivq AS (
      |  SELECT vec_id AS q_id, embedding AS q_vec,
      |    ${dotSql("embedding", "embedding")} AS q_norm
      |  FROM embeddings WHERE vec_id % $QueryMod = 0),
      |ivprobes AS (
      |  SELECT q_id, q_vec, q_norm, cent_id FROM (
      |    SELECT ivq.q_id, ivq.q_vec, ivq.q_norm, ivcent.cent_id,
      |      row_number() OVER (PARTITION BY ivq.q_id ORDER BY
      |        ${dotSql("ivq.q_vec", "ivcent.cent_vec")} / nullif(sqrt(ivq.q_norm) * sqrt(ivcent.cent_norm), 0.0) DESC,
      |        ivcent.cent_id) AS crk
      |    FROM ivq CROSS JOIN ivcent) t
      |  WHERE crk <= $IvfNprobe),
      |ivscored AS (
      |  SELECT p.q_id, a.n_id,
      |    ${dotSql("a.n_vec", "p.q_vec")} / nullif(sqrt(a.n_norm) * sqrt(p.q_norm), 0.0) AS score
      |  FROM ivassigned a JOIN ivprobes p USING (cent_id)
      |  WHERE a.n_id <> p.q_id),
      |ivranked AS (
      |  SELECT q_id, n_id, score,
      |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank
      |  FROM ivscored),
      |den AS (
      |  SELECT q_id, n_id AS doc_id, CAST(rank AS INT) AS rank
      |  FROM ivranked WHERE rank <= $LegK)""".stripMargin

  def hybridRrfIvfSql: String =
    s"""WITH $bm25Ctes,
      |lex AS (
      |  SELECT q_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY score DESC, doc_id) AS INT) AS rank
      |  FROM (SELECT * FROM ranked
      |        WHERE rank <= $LegK AND doc_id <> q_id)),
      |$ivfLegCtes,
      |contrib AS (
      |  SELECT q_id, doc_id, 10000 // ($RrfK + rank) AS contrib FROM lex
      |  UNION ALL
      |  SELECT q_id, doc_id, 10000 // ($RrfK + rank) AS contrib FROM den),
      |fused AS (
      |  SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_lists,
      |    CAST(sum(contrib) AS BIGINT) AS rrf_score
      |  FROM contrib GROUP BY q_id, doc_id),
      |franked AS (
      |  SELECT q_id, doc_id, n_lists, rrf_score,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
      |  FROM fused)
      |SELECT q_id, rank, doc_id, n_lists, rrf_score
      |FROM franked WHERE rank <= $HybridK
      |ORDER BY q_id, rank""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y)"

  def hybridRrfSql: String =
    s"""WITH $bm25Ctes,
      |lex AS (
      |  SELECT q_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY score DESC, doc_id) AS INT) AS rank
      |  FROM (SELECT * FROM ranked
      |        WHERE rank <= $LegK AND doc_id <> q_id)),
      |dc AS (
      |  SELECT vec_id AS n_id, embedding AS n_vec,
      |    ${dotSql("embedding", "embedding")} AS n_norm
      |  FROM embeddings),
      |dq AS (
      |  SELECT vec_id AS q_id, embedding AS q_vec,
      |    ${dotSql("embedding", "embedding")} AS q_norm
      |  FROM embeddings WHERE vec_id % $QueryMod = 0),
      |dscored AS (
      |  SELECT q_id, n_id,
      |    ${dotSql("n_vec", "q_vec")} / nullif(sqrt(n_norm) * sqrt(q_norm), 0.0) AS score
      |  FROM dc CROSS JOIN dq WHERE n_id <> q_id),
      |den AS (
      |  SELECT q_id, n_id AS doc_id, rank FROM (
      |    SELECT q_id, n_id,
      |      CAST(row_number() OVER (PARTITION BY q_id
      |        ORDER BY score DESC, n_id) AS INT) AS rank
      |    FROM dscored)
      |  WHERE rank <= $LegK),
      |contrib AS (
      |  SELECT q_id, doc_id, 10000 // ($RrfK + rank) AS contrib FROM lex
      |  UNION ALL
      |  SELECT q_id, doc_id, 10000 // ($RrfK + rank) AS contrib FROM den),
      |fused AS (
      |  SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_lists,
      |    CAST(sum(contrib) AS BIGINT) AS rrf_score
      |  FROM contrib GROUP BY q_id, doc_id),
      |franked AS (
      |  SELECT q_id, doc_id, n_lists, rrf_score,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
      |  FROM fused)
      |SELECT q_id, rank, doc_id, n_lists, rrf_score
      |FROM franked WHERE rank <= $HybridK
      |ORDER BY q_id, rank""".stripMargin
}
