package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** The content-defined property `dedup_chunks` rests on: chunk identity
  * is a function of content, not position, so an edit only perturbs the
  * chunk containing it (and, for the final chunk, the ragged tail) —
  * every chunk strictly before the edit point hashes identically. A
  * fixed-size chunker shifts every boundary after an insertion; CDC
  * must not.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def wordsOf(seed: Long, n: Int): Seq[String] =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}")

  private def chunksOf(docs: Seq[(Long, String)])
      : Map[(Long, Long), (Long, String)] =
    PipelineQueries.cdcChunks(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_id", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("appending a suffix leaves every non-final chunk hash unchanged") {
    val base = wordsOf(3, 400)
    val edited = base ++ wordsOf(1234, 60)
    val m = chunksOf(Seq(1L -> base.mkString(" "),
      2L -> edited.mkString(" ")))
    val baseChunks = m.keys.filter(_._1 == 1L).map(_._2).max
    assert(baseChunks >= 3, s"fixture must span several chunks, got $baseChunks")
    // every chunk of the original except its ragged last is bit-identical
    // in the suffixed document, same chunk ordinal
    (0L until baseChunks).foreach { cid =>
      assert(m((2L, cid)) === m((1L, cid)), s"chunk $cid moved under a suffix edit")
    }
  }

  test("a mid-document insertion perturbs only the chunk containing it") {
    val base = wordsOf(5, 400)
    val editPos = 211
    val edited = (base.take(editPos) :+ "INSERTED") ++ base.drop(editPos)
    val m = chunksOf(Seq(1L -> base.mkString(" "),
      2L -> edited.mkString(" ")))
    val baseIds = m.keys.filter(_._1 == 1L).map(_._2)
    val editIds = m.keys.filter(_._1 == 2L).map(_._2)
    // the prefix before the edited chunk is untouched; the suffix AFTER
    // the edited chunk re-aligns because boundaries are content-derived
    // (word-hash marks survive the insertion) — so the two chunk SETS
    // differ in at most the one edited chunk (hash-wise)
    val h1 = baseIds.map(cid => m((1L, cid))._2).toSet
    val h2 = editIds.map(cid => m((2L, cid))._2).toSet
    assert((h1 -- h2).size <= 1,
      s"insertion must invalidate at most one original chunk, lost ${(h1 -- h2).size}")
    assert((h2 -- h1).size <= 1,
      s"insertion must introduce at most one new chunk, got ${(h2 -- h1).size}")

    // contrast: the FIXED-size chunker shifts every boundary after the
    // edit (that is why dedup_chunks builds on the CDC form)
    val fixedShift = {
      val stride = 64
      def fixedHashes(ws: Seq[String]) =
        ws.grouped(stride).map(_.mkString(" ")).toSet
      (fixedHashes(base) -- fixedHashes(edited)).size
    }
    assert(fixedShift > 1,
      "fixture too small to distinguish CDC from fixed-size chunking")
  }
}
