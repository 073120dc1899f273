package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")

  test("payload column is real binary with media kind metadata") {
    val df = Multimodal.withFakePayload(docs, "text")
    val schema = df.schema
    assert(schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val kinds = df.select("media_kind").distinct().collect().map(_.getString(0))
    assert(kinds.toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction: deterministic, batch-shaped, right dims") {
    val df = Multimodal.withFakePayload(docs, "text")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload")
    val rows = feats.sort("doc_id").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[Seq[Float]]("features").length ===
      Multimodal.FeatureDim)
    assert(rows(0).getAs[Long]("n_bytes") === 11L)
    // feature vector sums to 1 (normalized byte histogram)
    val sum = rows(0).getAs[Seq[Float]]("features").sum
    assert(math.abs(sum - 1.0f) < 1e-5)
    // empty payload → zero vector, not a crash
    assert(rows(2).getAs[Seq[Float]]("features").forall(_ == 0f))
    // deterministic across runs
    val again = Multimodal.extractFeatures(df, "doc_id", "payload")
      .sort("doc_id").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("frame sampling flatMaps one row into byte windows") {
    val df = Multimodal.withFakePayload(docs.filter($"doc_id" === 1), "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload",
      frameSize = 4, stride = 3)
    val rows = frames.sort("frame_no").collect()
    assert(rows.length === 3) // offsets 0,3,6 over 11 bytes
    assert(new String(rows(0).getAs[Array[Byte]]("frame")) === "hell")
    assert(new String(rows(1).getAs[Array[Byte]]("frame")) === "lo w")
  }
}
