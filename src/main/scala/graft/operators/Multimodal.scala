package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch-shaped decode /
  * feature-extraction over executor partitions.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch iteration, output shape. The DECODE ITSELF IS A STUB: this
  * container has no image/audio codecs, so `fakeDecode` derives a
  * deterministic feature vector from the raw bytes (byte histogram
  * moments). Swap `decodeFn` for a real codec (e.g. JNI/ONNX call) at
  * deploy time; nothing else changes.
  *
  * Scale notes: rows are processed per-partition through one reusable
  * decoder instance (the expensive-init pattern real codecs need);
  * `repartition(n)` upstream controls decode parallelism; binary
  * payloads never pass through a shuffle here (narrow transformation).
  */
object Multimodal {

  val FeatureDim = 8

  final case class MediaMeta(kind: String, width: Int, height: Int)

  /** Attach a synthetic binary payload column derived from a string
    * column (the test-data stand-in for real image/audio bytes).
    */
  def withFakePayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("media_kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col(srcCol)), lit(3)) + 1).cast("int")))

  /** STUB decode: deterministic 8-dim feature vector from byte stats —
    * stands in for `??? : real codec` so the pipeline shape is testable.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    val hist = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % FeatureDim) += 1
      i += 1
    }
    val n = bytes.length.toFloat
    hist.map(_ / n)
  }

  /** Batch feature extraction: mapPartitions so a per-partition decoder
    * is initialized once, rows stream through it, and the output schema
    * is explicit (id, n_bytes, features).
    */
  def extractFeatures(df: DataFrame, idCol: String,
      payloadCol: String,
      decodeFn: Array[Byte] => Array[Float] = fakeDecode): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val idIdx = df.columns.indexOf(idCol)
    val payloadIdx = df.columns.indexOf(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // expensive decoder init would live HERE, once per partition
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val feats = decodeFn(bytes)
        Row(row.get(idIdx),
          if (bytes == null) 0L else bytes.length.toLong,
          feats.toSeq)
      }
    }(enc)
  }

  /** Frame-sample stand-in: pick every `stride`-th byte window as a
    * "frame" (the video-pipeline shape: one row in, many frames out via
    * flatMap).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val idIdx = df.columns.indexOf(idCol)
    val payloadIdx = df.columns.indexOf(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Iterator.empty
        else Iterator.range(0, math.max(bytes.length - frameSize + 1, 1), stride)
          .zipWithIndex.map { case (off, fno) =>
            Row(row.get(idIdx), fno,
              java.util.Arrays.copyOfRange(bytes, off,
                math.min(off + frameSize, bytes.length)))
          }
      }
    }(enc)
  }
}
