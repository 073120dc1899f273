package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch-shaped decode /
  * feature-extraction over executor partitions.
  *
  * Decode is REAL for BMP, WAV, PNG, JPEG and GIF via the pure-JVM
  * codecs in [[MediaCodecs]] ([[realDecode]] / [[decodeMedia]]).
  * `fakeDecode` remains as the deterministic fallback for payload bytes
  * matching no registered format (and as the historical oracle-checked
  * byte-histogram path for the synthetic test payloads, which are UTF-8
  * text, not media containers). Additional formats plug in by extending
  * `MediaCodecs.registry`; nothing else changes.
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

  /** Real decode: sniff the payload against `MediaCodecs.registry`
    * (BMP/WAV/PNG/JPEG/GIF) and return that codec's feature vector;
    * unknown AND corrupt bytes fall back to the byte-histogram stub so
    * mixed corpora stay total — one truncated container must never
    * fail a task. Pass as `decodeFn` to [[extractFeatures]].
    */
  def realDecode(bytes: Array[Byte]): Array[Float] =
    MediaCodecs.tryAuto(bytes) match {
      case MediaCodecs.Decoded(m) => m.features
      case _ => fakeDecode(bytes)
    }

  /** Full typed decode: one output row per input row with the media
    * metadata a downstream pipeline filters/groups on (kind, format,
    * dimensions, sample rate) plus the codec feature vector. Rows whose
    * bytes match no registered codec are kept (`kind = "opaque"`), and
    * rows a codec CLAIMED but could not parse — truncation, hostile
    * headers, unsupported sub-formats — are kept as `kind = "corrupt"`
    * with the sniffed codec in `format`; both carry stub features. A
    * mixed 100 TB corpus never loses rows (or a whole task) to a decode
    * miss, and the two miss reasons stay distinguishable.
    */
  def decodeMedia(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val idIdx = df.columns.indexOf(idCol)
    val payloadIdx = df.columns.indexOf(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val nBytes = if (bytes == null) 0L else bytes.length.toLong
        MediaCodecs.tryAuto(bytes) match {
          case MediaCodecs.Decoded(m) =>
            Row(row.get(idIdx), m.kind, m.format, m.width, m.height,
              m.channels, m.sampleRate, m.nSamples, m.features.toSeq)
          case MediaCodecs.Corrupt(format, _) =>
            Row(row.get(idIdx), "corrupt", format, 0, 0, 0, 0, nBytes,
              fakeDecode(bytes).toSeq)
          case MediaCodecs.UnknownFormat =>
            Row(row.get(idIdx), "opaque", "opaque", 0, 0, 0, 0, nBytes,
              fakeDecode(bytes).toSeq)
        }
      }
    }(enc)
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
    * flatMap). For REAL per-frame container decode see [[gifFrames]].
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

  /** REAL multi-frame decode: one row in → one row per GIF frame out,
    * each with its raster dims and packed top-down RGB triples
    * ([[MediaCodecs.decodeGifFrames]] through the JDK multi-image
    * reader). Rows whose payload is null or undecodable yield a single
    * `frame_no = -1` row with empty pixels instead of killing the job —
    * the same total-over-dirty-corpora contract as `decodeMedia`.
    */
  def gifFrames(df: DataFrame, idCol: String, payloadCol: String)
      : DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frame_rgb", BinaryType, nullable = false)))
    val idIdx = df.columns.indexOf(idCol)
    val payloadIdx = df.columns.indexOf(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val frames =
          if (bytes == null) Nil
          else
            try MediaCodecs.decodeGifFrames(bytes)
            catch { case _: MediaCodecs.MediaDecodeException => Nil }
        if (frames.isEmpty)
          Iterator.single(
            Row(row.get(idIdx), -1, 0, 0, Array.empty[Byte]))
        else frames.iterator.map(f =>
          Row(row.get(idIdx), f.frameNo, f.width, f.height, f.rgb))
      }
    }(enc)
  }

  /** 64-bit average hash (aHash) of a decoded RGB raster — the
    * perceptual-dedup primitive (the pHash family LAION-style pipelines
    * block image near-dups on): nearest-neighbor downscale to 8×8
    * ([[MediaCodecs.resizeNearest]] — pure integer source-index math),
    * per-pixel gray = r+g+b (a channel SUM, not a mean — same ordering,
    * no division), bit i set iff gray(i)·64 > Σgray (strict, exact
    * integers end to end), packed row-major into (hi, lo) 32-bit
    * halves. Two perceptually-identical images (same image re-encoded,
    * resized, or lightly noised) land on equal or Hamming-close codes;
    * comparing corpora costs one xor+popcount per candidate pair.
    * Everything is integer arithmetic, so any engine derives the
    * identical code from the same raster.
    */
  def averageHash(width: Int, height: Int,
      rgb: Array[Byte]): (Long, Long) = {
    val px =
      if (width == 8 && height == 8) rgb
      else MediaCodecs.resizeNearest(width, height, rgb, 8, 8)
    val gray = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      gray(i) = (px(3 * i) & 0xff) + (px(3 * i + 1) & 0xff) +
        (px(3 * i + 2) & 0xff)
      sum += gray(i)
      i += 1
    }
    var lo = 0L; var hi = 0L
    i = 0
    while (i < 64) {
      if (gray(i) * 64L > sum) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Batch perceptual-hash derivation over a binary media column: one
    * row per input row as `(id BIGINT, ahash_hi, ahash_lo, content_hash)`
    * — the 64-bit [[averageHash]] split across two non-negative 32-bit
    * longs (bit j < 32 in `lo`, bits 32..63 in `hi`), plus the md5 of
    * the payload BYTES (the container-level freshness ledger a
    * maintained media index keys its no-op detection on — a re-encode
    * of the same image is a CONTENT change even when the perceptual
    * code survives it). Undecodable payloads keep their ledger row with
    * NULL codes: inert for near-dup probes (no code, no band, no
    * candidate) but replay-idempotent for absorbs — the media twin of
    * the text index's `n_shingles = 0` contract. Decode is a map-side
    * per-row computation (no shuffle); the UDF wraps binary container
    * parsing, for which no built-in expression exists.
    */
  def averageHashCodes(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => averageHashOf(b))
    df.select(col(idCol).cast("long").as("id"),
        hashUdf(col(payloadCol)).as("_ah"),
        md5(col(payloadCol)).as("content_hash"))
      .select(col("id"), col("_ah._1").as("ahash_hi"),
        col("_ah._2").as("ahash_lo"), col("content_hash"))
  }

  /** Total [[averageHash]] of an arbitrary payload: BMP through the
    * pure-JVM parser, any other ImageIO-decodable container through the
    * JDK codecs; null, non-image, or corrupt bytes → None instead of an
    * exception — the per-row contract a streaming operator needs over a
    * dirty corpus.
    */
  def averageHashOf(bytes: Array[Byte]): Option[(Long, Long)] =
    if (bytes == null || bytes.length < 4) None
    else
      try {
        val (w, h, px) =
          if (MediaCodecs.BmpDecoder.detect(bytes))
            MediaCodecs.BmpDecoder.decodePixels(bytes)
          else MediaCodecs.imageIoRgb(bytes)
        Some(averageHash(w, h, px))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit ENERGY hash of a PCM sample array — [[averageHash]]'s audio
    * twin (the near-dup code of the AUDIO modality): the samples split
    * into 64 contiguous windows by the same floor-boundary rule the
    * image hash uses for its 8×8 grid (window i covers sample indices
    * [i·n/64, (i+1)·n/64) — exact partition at any length, possibly
    * empty windows for very short clips), E_i = Σ|s| over the window,
    * and bit i is 1 iff E_i·64 > ΣE (energy strictly above the mean —
    * the aHash decision applied to the energy envelope, so re-encodes
    * and small-amplitude noise keep the code while different material
    * flips it). Packing matches [[averageHash]]: bit i < 32 in `lo`,
    * 32..63 in `hi`, both non-negative. Integer arithmetic end to end —
    * an oracle derives every bit from the raw samples.
    */
  def energyHash(samples: Array[Short]): (Long, Long) = {
    val n = samples.length
    val e = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      // Long boundaries: i*n overflows Int past ~33.5M samples (a valid
      // ~35-minute 16 kHz WAV), which would turn long clips into silent
      // None codes through energyHashOf's NonFatal catch
      var j = (i.toLong * n / 64).toInt
      val end = ((i + 1).toLong * n / 64).toInt
      var s = 0L
      while (j < end) { s += math.abs(samples(j).toInt); j += 1 }
      e(i) = s; total += s
      i += 1
    }
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 64) {
      if (e(i) * 64 > total) {
        if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
      }
      i += 1
    }
    (hi, lo)
  }

  /** Total [[energyHash]] of an arbitrary payload: RIFF/WAVE PCM through
    * the pure-JVM [[MediaCodecs.WavDecoder]]; null, non-audio, or
    * corrupt bytes → None — [[averageHashOf]]'s contract for the audio
    * modality.
    */
  def energyHashOf(bytes: Array[Byte]): Option[(Long, Long)] =
    if (bytes == null || bytes.length < 4) None
    else
      try {
        val (_, _, samples) = MediaCodecs.WavDecoder.decodeSamples(bytes)
        Some(energyHash(samples))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** [[averageHashCodes]]' audio twin: `(id, ahash_hi, ahash_lo,
    * content_hash)` per row — the SAME output shape (the code columns
    * keep the shared names so the banded candidate/verify machinery and
    * the persisted media index serve both modalities unchanged), with
    * the codes from [[energyHash]] over the decoded WAV samples and the
    * ledger hash over the payload bytes. Undecodable payloads keep
    * NULL-code ledger rows, exactly as for images.
    */
  def audioEnergyHashCodes(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => energyHashOf(b))
    df.select(col(idCol).cast("long").as("id"),
        hashUdf(col(payloadCol)).as("_ah"),
        md5(col(payloadCol)).as("content_hash"))
      .select(col("id"), col("_ah._1").as("ahash_hi"),
        col("_ah._2").as("ahash_lo"), col("content_hash"))
  }

  /** 64-bit FRAME-SAMPLED clip hash — the VIDEO modality's near-dup
    * code: sample up to [[FrameSampleCount]] frames evenly (frame
    * `⌊k·F/S⌋` for k < S, duplicates dropped — short clips contribute
    * every frame once), downscale each sampled frame to the aHash's 8×8
    * grid (same nearest-neighbor integer math), pool TEMPORALLY by
    * summing the per-cell gray (r+g+b, [[averageHash]]'s channel sum)
    * across sampled frames, and apply the aHash decision to the pooled
    * grid: bit i = cell_i·64 > Σcells. Re-encodes, frame-rate changes
    * that keep the sampled content, and light per-frame noise keep the
    * code; different footage flips it. Integer arithmetic end to end —
    * an oracle derives every bit analytically from the frame rasters.
    * Packing matches [[averageHash]] (bit < 32 in `lo`).
    */
  val FrameSampleCount = 4

  def frameSampleHash(frames: Seq[MediaCodecs.GifFrame]): (Long, Long) = {
    val f = frames.size
    val s = math.min(FrameSampleCount, f)
    val sampled = (0 until s)
      .map(k => (k.toLong * f / s).toInt).distinct.map(frames)
    val cells = new Array[Long](64)
    sampled.foreach { fr =>
      val px =
        if (fr.width == 8 && fr.height == 8) fr.rgb
        else MediaCodecs.resizeNearest(fr.width, fr.height, fr.rgb, 8, 8)
      var i = 0
      while (i < 64) {
        cells(i) += (px(3 * i) & 0xff) + (px(3 * i + 1) & 0xff) +
          (px(3 * i + 2) & 0xff)
        i += 1
      }
    }
    var total = 0L
    cells.foreach(total += _)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) * 64 > total) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Total [[frameSampleHash]] of an arbitrary payload: GIF containers
    * through [[MediaCodecs.decodeGifFrames]] ONLY (the magic gate keeps
    * the video code space inert against BMP/WAV payloads); null,
    * non-GIF, or corrupt bytes → None — [[averageHashOf]]'s contract
    * for the clip modality.
    */
  def frameSampleHashOf(bytes: Array[Byte]): Option[(Long, Long)] =
    if (bytes == null || bytes.length < 6 ||
        !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == '8')) None
    else
      try Some(frameSampleHash(MediaCodecs.decodeGifFrames(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** [[averageHashCodes]]' video twin: `(id, ahash_hi, ahash_lo,
    * content_hash)` per row — the SAME output shape (shared code
    * columns keep the banded candidate/verify machinery and the
    * persisted media index serving all three modalities unchanged),
    * with codes from [[frameSampleHash]] over the decoded GIF frames
    * and the ledger hash over the payload bytes.
    */
  def frameSampleHashCodes(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => frameSampleHashOf(b))
    df.select(col(idCol).cast("long").as("id"),
        hashUdf(col(payloadCol)).as("_ah"),
        md5(col(payloadCol)).as("content_hash"))
      .select(col("id"), col("_ah._1").as("ahash_hi"),
        col("_ah._2").as("ahash_lo"), col("content_hash"))
  }

  /** The media-modality coder registry: a persisted media index pins the
    * coder NAME in its params, and every maintenance verb and indexed
    * probe derives batch codes through this dispatch — so an index can
    * never mix image, audio, and video-clip code spaces.
    */
  def codesFor(coder: String): (DataFrame, String, String) => DataFrame =
    coder match {
      case "image_ahash"     => averageHashCodes
      case "audio_energy"    => audioEnergyHashCodes
      case "video_framehash" => frameSampleHashCodes
      case other => throw new IllegalArgumentException(
        s"unknown media coder '$other' " +
          "(image_ahash | audio_energy | video_framehash)")
    }
}
