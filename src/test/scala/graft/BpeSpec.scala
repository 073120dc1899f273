package graft

import graft.operators.{Bpe, Packing}
import org.apache.spark.sql.functions._

/** Corpus-trained BPE: merge order, exhaustive within-word application,
  * token counts, and composition with sequence packing.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow pair frequency with deterministic tie-breaks") {
    // words: aaab ×2, ab ×1
    // round 1: (a,a) appears 2×2=4 times, (a,b) 2+1=3 → merge (a,a)
    // round 2: (aa,a) 2, (a,b) 2+1=3 → merge (a,b)
    // round 3: aaab = [aa, ab] ×2 → merge (aa,ab)
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val (vocab, merges) = Bpe.train(docs, "text", 3)
    assert(merges.map(m => (m.a, m.b, m.weight)) ===
      Seq(("a", "a", 4L), ("a", "b", 3L), ("aa", "ab", 2L)))
    val syms = vocab.select("word", "sym").as[(String, String)]
      .collect().toMap
    assert(syms("aaab") === s"${Bpe.Sep}aaab${Bpe.Sep}")
    assert(syms("ab") === s"${Bpe.Sep}ab${Bpe.Sep}")
    vocab.unpersist()
  }

  test("back-to-back merge sites all collapse (multi-pass replace)") {
    // "abababab": merge (a,b) must yield 4 ab tokens, not alternating
    // misses from single-pass left-to-right replacement
    val docs = Seq((1L, "abababab")).toDF("doc_id", "text")
    val (vocab, merges) = Bpe.train(docs, "text", 1)
    assert(merges.head.a === "a" && merges.head.b === "b")
    val sym = vocab.select("sym").as[String].head()
    assert(sym === Seq("ab", "ab", "ab", "ab")
      .mkString(Bpe.Sep, Bpe.Sep, Bpe.Sep))
    vocab.unpersist()
  }

  test("token counts: zero merges = characters, zeros for wordless docs") {
    val docs = Seq((1L, "ab cde"), (2L, "   "), (3L, "xyz"))
      .toDF("doc_id", "text")
    val (vocab, merges) = Bpe.train(docs, "text", 0)
    assert(merges.isEmpty)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 5L), (2L, 0L, 0L), (3L, 1L, 3L)))
    vocab.unpersist()
  }

  private def vocabRows(v: org.apache.spark.sql.DataFrame) =
    v.select("word", "cnt", "sym").as[(String, Long, String)]
      .collect().sortBy(_._1).toSeq

  test("driver-local trainer is merge-for-merge identical to the distributed one") {
    val docs = Seq(
      (1L, "aaab ab low lower lowest"),
      (2L, "aaab newer newest low"),
      (3L, "wider new newer ab ab")).toDF("doc_id", "text")
    val (dv, dm) = Bpe.train(docs, "text", 12)
    val (lv, lm) = Bpe.trainLocal(docs, "text", 12)
    assert(lm === dm)
    assert(vocabRows(lv) === vocabRows(dv))
    dv.unpersist()

    // exhaustion: the whole vocabulary merges before numMerges runs out
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val (tv, tm) = Bpe.train(tiny, "text", 10)
    val (tlv, tlm) = Bpe.trainLocal(tiny, "text", 10)
    assert(tlm === tm && tm.size < 10)
    assert(vocabRows(tlv) === vocabRows(tv))
    tv.unpersist()
  }

  test("trainers agree on the real documents corpus (sf0.001)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (dv, dm) = Bpe.train(docs, "text", 6)
    val (lv, lm) = Bpe.trainLocal(docs, "text", 6)
    assert(lm === dm)
    assert(vocabRows(lv) === vocabRows(dv))
    dv.unpersist()
  }

  test("BPE keeps codepoint granularity on multi-byte and supplementary-plane text") {
    // Latin-1, CJK, and an emoji (U+1F642, a surrogate pair in UTF-16):
    // char split must consume one CODEPOINT per symbol in both trainers
    val docs = Seq(
      (1L, "ä🙂 ä🙂 漢b 漢b 漢b"),
      (2L, "ä🙂ä🙂 x")).toDF("doc_id", "text")
    val (v0, _) = Bpe.trainLocal(docs, "text", 0)
    val syms0 = v0.select("word", "sym").as[(String, String)]
      .collect().toMap
    assert(syms0("ä🙂") === s"${Bpe.Sep}ä${Bpe.Sep}🙂${Bpe.Sep}")
    assert(syms0("ä🙂ä🙂") ===
      Seq("ä", "🙂", "ä", "🙂").mkString(Bpe.Sep, Bpe.Sep, Bpe.Sep))
    val (dv, dm) = Bpe.train(docs, "text", 6)
    val (lv, lm) = Bpe.trainLocal(docs, "text", 6)
    assert(lm === dm)
    assert(vocabRows(lv) === vocabRows(dv))
    dv.unpersist()

    // tie-break where UTF-16 unit order and codepoint order DISAGREE:
    // ￮ (U+FFEE) sorts above 🙂's high surrogate (0xD83D) in UTF-16 but
    // below U+1F642 by codepoint — both trainers must pick ￮ first
    val tie = Seq((1L, "￮z 🙂z")).toDF("doc_id", "text")
    val (tv, tm) = Bpe.train(tie, "text", 1)
    val (tlv, tlm) = Bpe.trainLocal(tie, "text", 1)
    assert(tlm === tm)
    assert(tm.head.a === "￮" && tm.head.b === "z")
    assert(vocabRows(tlv) === vocabRows(tv))
    tv.unpersist()
  }

  test("token counts fall back to character count for out-of-vocabulary words") {
    val corpus = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val (vocab, _) = Bpe.trainLocal(corpus, "text", 2)
    val batch = Seq((9L, "aa zzz b"), (10L, "")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(batch, "doc_id", "text", vocab)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // aa merged to 1 token; zzz and b are OOV → character counts 3 and 1
    assert(got === Seq((9L, 3L, 5L), (10L, 0L, 0L)))
  }

  test("packing keyed on BPE counts respects the token budget") {
    val docs = (1L to 12L).map(i => (i, "aa bb " * i.toInt))
      .toDF("doc_id", "text")
    val (vocab, _) = Bpe.train(docs, "text", 4)
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
    val packed = Packing.packByTokenBudget(
      counts, "doc_id", "n_tokens_bpe", budget = 16L)
    val rows = packed.select("doc_id", "bin_id", "bin_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) === (1L to 12L))
    // bins are non-decreasing in doc order and offsets stay in budget
    assert(rows.map(_._2) === rows.map(_._2).sorted)
    assert(rows.forall { case (_, _, off) => off >= 0 && off < 16L })
    vocab.unpersist()
  }
}
