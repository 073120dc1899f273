package graft

import org.apache.spark.sql.functions._

/** BM25 retrieval and the LSH recall gate: rank semantics, the exact
  * integer quantization replayed by a driver-side reference
  * implementation, query-term capping, and the recall report's
  * invariants (bucket-10 pairs are ALWAYS candidates; counts bounded).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Bigram terms, mirroring the operator's termNgram = 2 path. */
  private def termsOf(s: String): Seq[String] =
    tokensOf(s).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq

  /** Driver-side replay of the quantized BM25 (BigInt, so no overflow
    * concerns): the reference the Spark plan must match bit-for-bit.
    */
  private def refBm25(docs: Seq[(Long, String)], qId: Long, qText: String,
      qTerms: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> termsOf(t) }.toMap
    val n = BigInt(docs.size)
    val total = BigInt(toks.values.map(_.size).sum)
    val tf = docs.flatMap { case (id, t) =>
      termsOf(t).groupBy(identity).map { case (w, o) => (id, w, o.size) }
    }
    val df = tf.groupBy(_._2).map { case (w, rows) => w -> BigInt(rows.size) }
    // rarest-first term selection, mirroring the operator: terms absent
    // from the corpus are excluded, ties break lexicographically
    val qts = termsOf(qText).distinct
      .flatMap(w => df.get(w).map(d => (d, w)))
      .sortBy { case (d, w) => (d, w) }.take(qTerms).map(_._2).toSet
    tf.filter { case (_, w, _) => qts.contains(w) }
      .groupBy(_._1).map { case (id, rows) =>
        val dl = BigInt(toks(id).size)
        val score = rows.map { case (_, w, tfv) =>
          val t = BigInt(tfv)
          val num = BigInt(10000) * (2 * n - 2 * df(w) + 1) * 44 * t * total
          val den = (2 * df(w) + 1) *
            (BigInt(20) * t * total + 6 * total + 18 * dl * n)
          num / den
        }.sum
        id -> (BigInt(rows.size).toLong, score.toLong)
      }
  }

  private val corpus = Seq(
    0L -> "apple banana cherry",
    1L -> "apple banana cherry dog egg",
    2L -> "apple banana xx yy zz",
    3L -> "apple k1 k2 k3 k4",
    4L -> "qq ww ee rr tt")

  test("bm25 ranks by quantized score and matches the driver-side replay") {
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq(0L -> "apple banana cherry").toDF("doc_id", "text")
    val out = graft.operators.Retrieval
      .bm25TopK(docs, queries, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .orderBy("rank")
      .select("q_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.forall(_._1 === 0L))
    // docs 3/4 share no query bigram ("apple k1" != "apple banana"): absent
    assert(!out.exists(r => r._3 === 3L || r._3 === 4L))
    val ref = refBm25(corpus, 0L, "apple banana cherry", 8)
    assert(out.map(r => r._3 -> (r._4, r._5)).toMap === ref)
    // ranks follow (score desc, doc_id): the full-match short doc wins
    val expected = ref.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.map(_._1)
    assert(out.sortBy(_._2).map(_._3) === expected)
    assert(out.head._3 === 0L, "self-retrieval must rank first")
  }

  test("bm25 breaks score ties by doc_id and caps query terms") {
    val docs = Seq(
      0L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",
      10L -> "unique1 zeta", 11L -> "unique1 zeta",
      9L -> "t9 t10 pad1 pad2").toDF("doc_id", "text")
    // tie: identical docs 10/11 under a query matching both
    val tie = Seq(100L -> "unique1 zeta").toDF("doc_id", "text")
    val tieOut = graft.operators.Retrieval
      .bm25TopK(docs, tie, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .orderBy("rank").select("doc_id", "score")
      .as[(Long, Long)].collect().toSeq
    assert(tieOut.map(_._1) === Seq(10L, 11L))
    assert(tieOut(0)._2 === tieOut(1)._2)
    // qTerms = 8: the query has 9 bigrams; "t9 t10" is the COMMONEST
    // (df 2 — docs 0 and 9 — vs df 1), so it falls off the rarest-8 cut
    // and doc 9 (which shares ONLY that bigram) is never retrieved
    val q10 = Seq(200L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
      .toDF("doc_id", "text")
    val capped = graft.operators.Retrieval
      .bm25TopK(docs, q10, "doc_id", "text", "doc_id", "text",
        termNgram = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(capped === Set(0L))
  }

  test("declared query runs on testdata: contiguous ranks, scores sorted") {
    val out = graft.queries.RetrievalQueries
      .bm25TopK(spark, "/root/testdata/sf0.001")
      .select("q_id", "rank", "doc_id", "n_terms", "score")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to rows.size), s"ranks not contiguous for $q")
      assert(sorted.map(_._5).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"scores not non-increasing for $q")
      assert(rows.forall(r => r._4 >= 1 && r._4 <= 8 && r._5 > 0))
      // when the query doc survives into its own top-k it matches all
      // its terms (n_terms can only tie, never exceed); absence is
      // legitimate — shorter full-matches outscore under length
      // normalization, and a 7-term match with rarer/denser terms can
      // outscore an 8-term one (observed on this corpus)
      rows.find(r => r._3 === q).foreach { self =>
        assert(self._4 === rows.map(_._4).max)
      }
    }
  }

  test("lsh recall report: exact-dup bucket has recall 1.0, counts bounded") {
    // identical pair (J=1.0 -> bucket 10, sigs identical -> always hit),
    // a partial-overlap pair, and unrelated filler
    val shared = (1 to 12).map(i => s"a$i").mkString(" ")
    val partialA = (1 to 12).map(i => s"c$i").mkString(" ")
    val partialB = ((1 to 10).map(i => s"c$i") ++ Seq("d11", "d12")).mkString(" ")
    val docs = (Seq(
      1L -> shared, 2L -> shared,
      3L -> partialA, 4L -> partialB) ++
      (10L to 29L).map(i => i -> (1 to 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = graft.operators.Dedup
      .lshRecallReport(docs, "doc_id", "text")
      .select("j_bucket", "n_true", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byBucket = rep.map(r => r._1 -> r).toMap
    // identical docs: common=10 shingles, union=10 -> bucket 10
    assert(byBucket(10L)._2 >= 1L && byBucket(10L)._4 === 1.0)
    // partial pair: common=8 3-shingles of union 12 -> (8*10) div 12 = 6
    assert(byBucket.contains(6L))
    assert(rep.forall { case (b, nt, nh, r) =>
      b >= 3 && b <= 10 && nh <= nt && r >= 0.0 && r <= 1.0 })
  }

  test("declared lsh recall query is sane on testdata") {
    val rep = graft.queries.DedupQueries
      .lshRecall(spark, "/root/testdata/sf0.001")
      .select("j_bucket", "n_true", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rep.nonEmpty)
    assert(rep.forall { case (b, nt, nh, _) => nh <= nt && b >= 3 })
    rep.find(_._1 === 10L).foreach { case (_, _, _, r) =>
      assert(r === 1.0, "identical shingle sets must always be candidates")
    }
  }
}
