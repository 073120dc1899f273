package graft.operators

import java.io.ByteArrayInputStream

/** Pure-JVM media codecs behind a pluggable decoder interface.
  *
  * This closes the "decode is a stub" gap declared in [[Multimodal]]:
  * the formats below are decoded for real, with zero non-JDK
  * dependencies, so the same jars that run the engine also run the
  * decoders on every executor.
  *
  *  - [[BmpDecoder]]  — hand-rolled BMP (BITMAPINFOHEADER, BI_RGB,
  *    24/32 bpp, bottom-up or top-down rows, 4-byte row padding).
  *  - [[WavDecoder]]  — hand-rolled RIFF/WAVE PCM (8-bit unsigned /
  *    16-bit signed LE, any channel count, chunk-walk for `fmt `/`data`).
  *  - [[ImageIoDecoder]] — PNG / JPEG / GIF via `javax.imageio`
  *    (JDK-builtin plugins; headless-safe, no display needed).
  *
  * Bytes that match none of the registered magics fall back to
  * [[Multimodal.fakeDecode]] so pipelines stay total over mixed or
  * unknown payloads — the fallback is REPORTED via `format = "opaque"`
  * in [[Multimodal.decodeMedia]], never silently conflated with a real
  * decode.
  *
  * Scale notes: decoders are stateless `object`s (serializable by
  * construction, shared per-executor, no per-row allocation beyond the
  * output arrays); detection is an O(1) magic sniff so the registry walk
  * never reads payload bodies for non-matching formats.
  */
object MediaCodecs {

  /** Decoded media summary: typed metadata + a fixed-dim feature vector
    * (see each decoder for the exact feature layout).
    */
  final case class DecodedMedia(
      kind: String, // "image" | "audio"
      format: String, // "bmp" | "wav" | "png" | "jpeg" | "gif"
      width: Int, // image pixels; 0 for audio
      height: Int, // image pixels; 0 for audio
      channels: Int, // color or audio channels
      sampleRate: Int, // audio Hz; 0 for images
      nSamples: Long, // audio frames; width*height for images
      features: Array[Float])

  /** A sniff-then-decode codec. Implementations must be cheap to
    * `detect` (magic bytes only) and total for any input `detect`
    * accepts structurally (throw `MediaDecodeException` on a body that
    * contradicts its header rather than returning garbage).
    */
  trait MediaDecoder extends Serializable {
    def name: String
    def detect(bytes: Array[Byte]): Boolean
    def decode(bytes: Array[Byte]): DecodedMedia
  }

  final class MediaDecodeException(msg: String)
      extends RuntimeException(msg)

  /** Registry walked in order by [[auto]]; hand-rolled parsers first so
    * the BMP path never depends on which ImageIO plugins are present.
    */
  val registry: Seq[MediaDecoder] =
    Seq(BmpDecoder, WavDecoder, ImageIoDecoder)

  /** Sniff + decode, or None when no registered decoder matches.
    * Throws when a decoder matched but the body is corrupt — pipeline
    * callers that must stay total over dirty corpora use [[tryAuto]].
    */
  def auto(bytes: Array[Byte]): Option[DecodedMedia] = {
    if (bytes == null || bytes.length < 4) return None
    registry.find(_.detect(bytes)).map(_.decode(bytes))
  }

  /** Totality outcome for a payload: distinguishes "no codec claims
    * these bytes" from "a codec claimed them but the body is corrupt" —
    * the latter must be REPORTED, not conflated with unknown formats
    * and never allowed to kill a task over one bad row.
    */
  sealed trait DecodeOutcome
  final case class Decoded(media: DecodedMedia) extends DecodeOutcome
  case object UnknownFormat extends DecodeOutcome
  final case class Corrupt(format: String, reason: String)
      extends DecodeOutcome

  /** Total sniff + decode: corrupt bodies (a sniffed magic whose decode
    * throws — hostile headers, truncation, unsupported sub-formats)
    * come back as [[Corrupt]] instead of propagating the exception.
    */
  def tryAuto(bytes: Array[Byte]): DecodeOutcome = {
    if (bytes == null || bytes.length < 4) return UnknownFormat
    registry.find(_.detect(bytes)) match {
      case None => UnknownFormat
      case Some(d) =>
        try Decoded(d.decode(bytes))
        catch {
          case e if scala.util.control.NonFatal(e) =>
            Corrupt(d.name, String.valueOf(e.getMessage))
        }
    }
  }

  // shared little-endian readers (byte-order handling lives ONCE)
  private def leI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leI16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---------------------------------------------------------------- BMP

  /** Windows BMP parser. Supports the overwhelmingly-common on-disk
    * shape: BITMAPFILEHEADER + BITMAPINFOHEADER(-or-larger), BI_RGB
    * (no compression), 24 or 32 bits per pixel, rows padded to 4-byte
    * boundaries, bottom-up (positive height) or top-down (negative).
    * This is exactly what `ImageIO.write(..., "bmp", ...)` emits, which
    * the spec uses as an independent encode oracle.
    */
  object BmpDecoder extends MediaDecoder {
    val name = "bmp"

    def detect(bytes: Array[Byte]): Boolean =
      bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M'

    private def i32(b: Array[Byte], off: Int): Int = leI32(b, off)
    private def i16(b: Array[Byte], off: Int): Int = leI16(b, off)

    /** Parse to packed top-down RGB triples (3 bytes per pixel, pad
      * stripped, BGR→RGB swapped). Exposed separately from [[decode]]
      * so callers needing exact integer pixel stats (e.g. the
      * `mm_decode_bmp` oracle query) hit the same parse path as the
      * feature extractor.
      */
    def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      if (!detect(bytes))
        throw new MediaDecodeException("not a BMP (missing 'BM' magic)")
      val dataOff = i32(bytes, 10)
      val hdrSize = i32(bytes, 14)
      if (hdrSize < 40)
        throw new MediaDecodeException(s"BITMAPCOREHEADER ($hdrSize) unsupported")
      val width = i32(bytes, 18)
      val rawHeight = i32(bytes, 22)
      val bpp = i16(bytes, 28)
      val compression = i32(bytes, 30)
      if (compression != 0)
        throw new MediaDecodeException(s"compression $compression unsupported (BI_RGB only)")
      if (bpp != 24 && bpp != 32)
        throw new MediaDecodeException(s"$bpp bpp unsupported (24/32 only)")
      if (width <= 0 || rawHeight == 0)
        throw new MediaDecodeException(s"bad dimensions ${width}x$rawHeight")
      // hostile-header guards: a negative/into-the-header dataOff must
      // not pass the truncation check or decode header bytes as pixels,
      // and the dimension math must not overflow Int into a bad alloc
      // Long math: a hostile hdrSize near Int.MaxValue would overflow
      // `14 + hdrSize` to negative and let header bytes decode as pixels
      if (dataOff.toLong < 14L + hdrSize.toLong || dataOff > bytes.length)
        throw new MediaDecodeException(s"pixel data offset $dataOff out of range")
      val height = math.abs(rawHeight.toLong)
      val topDown = rawHeight < 0
      val pxBytes = bpp / 8
      val rowBytes = ((width.toLong * pxBytes + 3) / 4) * 4
      if (width.toLong * height * 3 > Int.MaxValue - 8)
        throw new MediaDecodeException(s"dimensions ${width}x$height overflow")
      if (dataOff + rowBytes * height > bytes.length)
        throw new MediaDecodeException("pixel data truncated vs header dimensions")
      val h = height.toInt // safe: bounded by the overflow check above
      val rb = rowBytes.toInt // safe: dataOff + rb*h fits in bytes.length
      val out = new Array[Byte](width * h * 3)
      var row = 0
      while (row < h) {
        // file rows run bottom-up unless height was negative
        val srcRow = if (topDown) row else h - 1 - row
        var x = 0
        var src = dataOff + srcRow * rb
        var dst = row * width * 3
        while (x < width) {
          out(dst) = bytes(src + 2) // R (file order is B,G,R[,A])
          out(dst + 1) = bytes(src + 1) // G
          out(dst + 2) = bytes(src) // B
          src += pxBytes
          dst += 3
          x += 1
        }
        row += 1
      }
      (width, h, out)
    }

    /** Features: [w, h, channels, meanR, meanG, meanB, meanLum, stdLum]
      * with channel means normalized to [0,1].
      */
    def decode(bytes: Array[Byte]): DecodedMedia = {
      val (w, h, px) = decodePixels(bytes)
      DecodedMedia("image", "bmp", w, h, 3, 0, w.toLong * h,
        imageFeatures(w, h, px))
    }
  }

  /** Shared image feature layout over packed top-down RGB bytes. */
  private[operators] def imageFeatures(
      w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
    val n = w.toLong * h
    var sr, sg, sb = 0L
    var sLum, sLum2 = 0.0
    var i = 0
    while (i < rgb.length) {
      val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff; val b = rgb(i + 2) & 0xff
      sr += r; sg += g; sb += b
      val lum = 0.2126 * r + 0.7152 * g + 0.0722 * b
      sLum += lum; sLum2 += lum * lum
      i += 3
    }
    val mLum = sLum / n
    val varLum = math.max(sLum2 / n - mLum * mLum, 0.0)
    Array(w.toFloat, h.toFloat, 3f,
      (sr / (255.0 * n)).toFloat, (sg / (255.0 * n)).toFloat,
      (sb / (255.0 * n)).toFloat, (mLum / 255.0).toFloat,
      (math.sqrt(varLum) / 255.0).toFloat)
  }

  // ---------------------------------------------------------------- WAV

  /** RIFF/WAVE PCM parser: walks chunks for `fmt ` and `data`, supports
    * audio format 1 (PCM) at 8-bit unsigned or 16-bit signed LE, any
    * channel count. Matches what `javax.sound.sampled.AudioSystem`
    * writes for `AudioFileFormat.Type.WAVE`, which the spec uses as an
    * independent parse oracle.
    */
  object WavDecoder extends MediaDecoder {
    val name = "wav"

    def detect(bytes: Array[Byte]): Boolean =
      bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

    private def i32(b: Array[Byte], off: Int): Int = leI32(b, off)
    private def i16(b: Array[Byte], off: Int): Int = leI16(b, off)

    /** Parse to interleaved 16-bit samples (8-bit input upscaled to the
      * centered 16-bit range). Returns (sampleRate, channels, samples).
      * Exposed separately from [[decode]] for exact integer sample
      * stats (the `mm_decode_wav` oracle query).
      */
    def decodeSamples(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      if (!detect(bytes))
        throw new MediaDecodeException("not a WAV (missing RIFF/WAVE magic)")
      // RIFF chunk lengths are UNSIGNED 32-bit; walk in Long so a
      // hostile length can neither wrap the overrun check nor drive the
      // cursor negative — every bad length dies here as the contracted
      // MediaDecodeException, not an index error or a giant allocation
      var off = 12L
      var sampleRate = -1; var channels = -1; var bits = -1
      var dataOff = -1L; var dataLen = -1L
      while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
        val id = new String(bytes, off.toInt, 4, "US-ASCII")
        val len = i32(bytes, off.toInt + 4).toLong & 0xffffffffL
        if (off + 8 + len > bytes.length)
          throw new MediaDecodeException(s"chunk '$id' overruns file")
        if (id == "fmt ") {
          if (len < 16) throw new MediaDecodeException("fmt chunk too short")
          val fmt = i16(bytes, off.toInt + 8)
          if (fmt != 1)
            throw new MediaDecodeException(s"audio format $fmt unsupported (PCM only)")
          channels = i16(bytes, off.toInt + 10)
          sampleRate = i32(bytes, off.toInt + 12)
          bits = i16(bytes, off.toInt + 22)
        } else if (id == "data") {
          dataOff = off + 8; dataLen = len
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (sampleRate < 0) throw new MediaDecodeException("no fmt chunk")
      if (dataOff < 0) throw new MediaDecodeException("no data chunk")
      if (bits != 8 && bits != 16)
        throw new MediaDecodeException(s"$bits-bit PCM unsupported (8/16 only)")
      if (channels <= 0)
        throw new MediaDecodeException(s"bad channel count $channels")
      // the overrun check bounded dataOff+dataLen by bytes.length
      val dOff = dataOff.toInt
      val dLen = dataLen.toInt
      // a 16-bit data chunk with an odd byte count is a truncated/corrupt
      // chunk — reject loudly rather than silently dropping the tail byte
      if (bits == 16 && (dLen & 1) == 1)
        throw new MediaDecodeException(
          s"16-bit data chunk has odd length $dLen")
      val out =
        if (bits == 16) {
          val n = dLen / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = ((bytes(dOff + 2 * i) & 0xff) |
              (bytes(dOff + 2 * i + 1) << 8)).toShort
            i += 1
          }
          s
        } else {
          val s = new Array[Short](dLen)
          var i = 0
          while (i < dLen) {
            // 8-bit WAV is unsigned, centered at 128
            s(i) = (((bytes(dOff + i) & 0xff) - 128) << 8).toShort
            i += 1
          }
          s
        }
      (sampleRate, channels, out)
    }

    /** Features: [sampleRate, channels, frames, durationSec, mean, rms,
      * peak, zeroCrossRate] with amplitude stats normalized to [-1,1].
      */
    def decode(bytes: Array[Byte]): DecodedMedia = {
      val (rate, ch, samples) = decodeSamples(bytes)
      val n = samples.length
      var sum = 0.0; var sum2 = 0.0; var peak = 0.0; var zc = 0L
      var i = 0
      while (i < n) {
        val v = samples(i) / 32768.0
        sum += v; sum2 += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i >= ch && (samples(i) >= 0) != (samples(i - ch) >= 0)) zc += 1
        i += 1
      }
      val frames = if (ch > 0) n.toLong / ch else 0L
      val dur = if (rate > 0) frames.toDouble / rate else 0.0
      DecodedMedia("audio", "wav", 0, 0, ch, rate, frames,
        Array(rate.toFloat, ch.toFloat, frames.toFloat, dur.toFloat,
          (if (n == 0) 0.0 else sum / n).toFloat,
          (if (n == 0) 0.0 else math.sqrt(sum2 / n)).toFloat,
          peak.toFloat,
          (if (n <= ch) 0.0 else zc.toDouble / (n - ch)).toFloat))
    }
  }

  // ---------------------------------------------------- PNG / JPEG / GIF

  /** JDK `javax.imageio` decoder for the formats its builtin plugins
    * ship with (PNG, JPEG, GIF). Headless-safe: `BufferedImage` needs
    * no display. Kept after the hand-rolled parsers in the registry so
    * BMP never routes through plugin discovery.
    */
  object ImageIoDecoder extends MediaDecoder {
    val name = "imageio"

    private def fmtOf(bytes: Array[Byte]): String =
      if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
      else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8') "gif"
      else ""

    def detect(bytes: Array[Byte]): Boolean = fmtOf(bytes).nonEmpty

    def decode(bytes: Array[Byte]): DecodedMedia = {
      val fmt = fmtOf(bytes)
      val (w, h, rgb) = imageIoRgb(bytes, fmt)
      DecodedMedia("image", fmt, w, h, 3, 0, w.toLong * h,
        imageFeatures(w, h, rgb))
    }
  }

  /** Real-codec image decode to packed top-down RGB triples through the
    * JDK ImageIO reader (PNG/JPEG/GIF) — the pixel-exact walk
    * [[ImageIoDecoder.decode]] summarizes into features, exposed whole
    * so the PNG oracle query can sum exact channel values.
    */
  def imageIoRgb(bytes: Array[Byte],
      fmt: String = "image"): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new MediaDecodeException(s"ImageIO could not decode sniffed $fmt")
    val w = img.getWidth; val h = img.getHeight
    // decompression-bomb guard: a huge PNG would overflow w*h*3 in Int
    // and throw NegativeArraySizeException instead of the documented
    // MediaDecodeException (same bound BmpDecoder applies)
    if (w.toLong * h * 3 > Int.MaxValue - 8)
      throw new MediaDecodeException(s"dimensions ${w}x$h overflow")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val d = (y * w + x) * 3
        rgb(d) = ((p >> 16) & 0xff).toByte
        rgb(d + 1) = ((p >> 8) & 0xff).toByte
        rgb(d + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  // ------------------------------------------------------------ encoders

  /** Write a 24bpp bottom-up BI_RGB BMP from packed top-down RGB
    * triples. Row padding to 4-byte boundaries, standard 54-byte
    * header — round-trips through [[BmpDecoder]] and through
    * `ImageIO.read`.
    */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, 54); put32(14, 40)
    put32(18, width); put32(22, height)
    out(26) = 1; out(28) = 24 // planes=1, bpp=24
    put32(34, dataSize)
    put32(38, 2835); put32(42, 2835) // 72 DPI
    var row = 0
    while (row < height) {
      val dstRow = 54 + (height - 1 - row) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val s = (row * width + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s) // RGB→BGR
        x += 1
      }
      row += 1
    }
    out
  }

  /** Spec-level PNG encoder: 8-bit truecolor (color type 2), filter 0
    * (None) on every scanline, zlib stream of STORED deflate blocks
    * (header 0x78 0x01, 64 KiB stored blocks, adler32 trailer), CRC32
    * per chunk — every output byte is a pure function of (width,
    * height, rgb), so an oracle can reason about the exact container
    * while the DECODE side still exercises the real JDK PNG codec:
    * signature check, chunk walk + CRC verify, zlib inflate, filter
    * reconstruction, raster cursor. The same fixed-filter/stored-block
    * trick the GIF fixture plays with its analytic palette
    * ([[encodeGif]]): deterministic bytes in, real decoder out.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    // filtered raster: every scanline prefixed by filter type 0 (None)
    val stride = 1 + width * 3
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0
      System.arraycopy(rgb, y * width * 3, raw, y * stride + 1, width * 3)
      y += 1
    }
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01) // CMF/FLG: 32K window, no dict, (0x7801 % 31 == 0)
    var pos = 0
    while (pos < raw.length) {
      val n = math.min(65535, raw.length - pos)
      z.write(if (pos + n >= raw.length) 1 else 0) // BFINAL | BTYPE=00
      z.write(n & 0xff); z.write((n >> 8) & 0xff)
      z.write(~n & 0xff); z.write((~n >> 8) & 0xff)
      z.write(raw, pos, n)
      pos += n
    }
    val ad = new java.util.zip.Adler32(); ad.update(raw)
    val a = ad.getValue
    z.write(((a >> 24) & 0xff).toInt); z.write(((a >> 16) & 0xff).toInt)
    z.write(((a >> 8) & 0xff).toInt); z.write((a & 0xff).toInt)

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(be32(data.length), 0, 4)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Spec-level baseline JPEG encoder for EXACTLY-decodable fixtures:
    * a grayscale image of flat 8×8 blocks, one block per entry of
    * `blockVals` (row-major `wBlocks`×`hBlocks` grid, values 0..255).
    * Every block carries ONLY a DC coefficient and the quantization
    * table is all-8s, so the dequantized DC is `(v-128)·8`, the IDCT of
    * a DC-only block is the flat value `dequant/8 = v-128` with ZERO
    * rounding (exact multiples — no fixed-point/IEEE divergence between
    * IDCT implementations), and the +128 level shift restores `v`
    * exactly. Grayscale skips YCbCr→RGB math entirely, so ANY
    * compliant baseline decoder — the JDK's included — reproduces the
    * block values bit-exactly, which is what lets a SQL oracle
    * recompute the decoded sums while the decode side still runs the
    * real JPEG path: marker parse, Huffman decode (std Annex K tables),
    * dequantization, IDCT, level shift. The same
    * deterministic-bytes-in/real-decoder-out trick as [[encodePng]]
    * and [[encodeGif]], for the one codec where general pixel-exact
    * oracles are impossible (IDCT rounding is implementation-defined
    * for nonzero AC terms — hence flat blocks).
    */
  def encodeJpegFlatBlocks(wBlocks: Int, hBlocks: Int,
      blockVals: Array[Int]): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0, s"bad grid ${wBlocks}x$hBlocks")
    require(blockVals.length == wBlocks * hBlocks,
      s"need ${wBlocks * hBlocks} block values, got ${blockVals.length}")
    require(blockVals.forall(v => v >= 0 && v <= 255), "values must be bytes")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0) // DQT, table 0, 8-bit
    (0 until 64).foreach(_ => u8(8)) // all-8 quantization
    // three YCbCr components (1x1 sampling, shared tables), chroma flat
    // at 128: the decoder's color convert is R=G=B=Y EXACTLY for zero
    // chroma (1.402·0 and 0.344·0 contribute nothing, round(Y)=Y). A
    // single-component grayscale JPEG would decode exactly too, but
    // Java then wraps it in a LINEAR gray ColorSpace whose getRGB
    // applies the sRGB gamma curve — the fixture must stay in RGB land
    // for the oracle to see the raw values.
    marker(0xc0) // SOF0 baseline
    u16(2 + 6 + 3 * 3); u8(8) // precision
    u16(hBlocks * 8); u16(wBlocks * 8)
    u8(3)
    (1 to 3).foreach { cid => u8(cid); u8(0x11); u8(0) }
    // standard Annex K luminance Huffman tables (DC class 0 / AC class 1)
    val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    val acBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(cls << 4)
      (1 to 16).foreach(i => u8(bits(i)))
      vals.foreach(u8)
    }
    dht(0, dcBits, dcVals)
    dht(1, acBits, acVals)
    marker(0xda); u16(2 + 1 + 2 * 3 + 3) // SOS
    u8(3)
    (1 to 3).foreach { cid => u8(cid); u8(0x00) } // all use DC 0 / AC 0
    u8(0); u8(63); u8(0) // full spectral selection, no approx

    // derive canonical Huffman codes from the bits/vals tables
    def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      val m = scala.collection.mutable.Map[Int, (Int, Int)]()
      var k = 0
      for (len <- 1 to 16) {
        var i = 0
        while (i < bits(len)) {
          m(vals(k)) = (code, len); code += 1; k += 1; i += 1
        }
        code <<= 1
      }
      m.toMap
    }
    val dcCode = codes(dcBits, dcVals)
    val acCode = codes(acBits, acVals)
    // bit packer with 0xFF byte stuffing
    var acc = 0; var nbits = 0
    val ecs = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1 << n) - 1)); nbits += n
      while (nbits >= 8) {
        val b = (acc >> (nbits - 8)) & 0xff
        ecs.write(b); if (b == 0xff) ecs.write(0x00)
        nbits -= 8
      }
    }
    // interleaved MCUs: Y block (md5-driven) then Cb, Cr (flat 128 →
    // dc 0, diff 0 after the first MCU); per-component DC predictors
    val eob = acCode(0x00) // all 63 AC coefficients zero
    def encodeDcDiff(diff: Int): Unit = {
      // category (bit length of |diff|) + diff bits (one's complement
      // for negatives, per the JPEG spec)
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
        math.abs(diff))
      val (c, l) = dcCode(cat); putBits(c, l)
      if (cat > 0) {
        val bitsVal = if (diff >= 0) diff else diff + (1 << cat) - 1
        putBits(bitsVal, cat)
      }
      putBits(eob._1, eob._2)
    }
    var prevY = 0; var prevCb = 0; var prevCr = 0
    blockVals.foreach { v =>
      val dc = v - 128
      encodeDcDiff(dc - prevY); prevY = dc
      encodeDcDiff(0 - prevCb); prevCb = 0 // Cb = 128 flat
      encodeDcDiff(0 - prevCr); prevCr = 0 // Cr = 128 flat
    }
    if (nbits > 0) putBits(0xff, 8 - nbits) // 1-padding to byte boundary
    out.write(ecs.toByteArray, 0, ecs.size())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** One decoded GIF frame: raw raster dims plus packed top-down RGB
    * triples (same layout every image codec here uses).
    */
  final case class GifFrame(frameNo: Int, width: Int, height: Int,
      rgb: Array[Byte])

  /** The fixed 256-entry palette [[encodeGif]] writes: entry i →
    * (i, 255-i, (7·i) mod 256). Analytic on purpose — an oracle can
    * recompute any decoded channel value straight from the palette
    * INDEX, which the md5-derived fixtures control.
    */
  def gifPaletteRgb(i: Int): (Int, Int, Int) =
    (i & 0xff, 255 - (i & 0xff), (7 * (i & 0xff)) % 256)

  /** Write a multi-frame GIF89a from per-frame palette-index rasters
    * (each `frames(f)(y*w + x)` is an index into [[gifPaletteRgb]]).
    * Spec-level construction (CompuServe GIF89a): one global 256-color
    * table, every frame full-size at (0,0) with no local table, and the
    * mandatory LZW stream emitted in LITERAL MODE — a CLEAR code before
    * every ≤126 literal codes, so the code width stays at 9 bits and the
    * bytes are deterministic; any conforming decoder (including the
    * JDK's) accepts it. Round-trips exactly through [[decodeGifFrames]]
    * because palette-indexed color is lossless.
    */
  def encodeGif(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame needs ${width * height} indices, got ${f.length}"))
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(width); le16(height)
    out.write(0xf7) // global color table, 2^(7+1)=256 entries
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    (0 until 256).foreach { i =>
      val (r, g, b) = gifPaletteRgb(i)
      out.write(r); out.write(g); out.write(b)
    }
    frames.foreach { px =>
      out.write(0x2c) // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      out.write(0) // no local color table, not interlaced
      out.write(8) // LZW minimum code size
      val clear = 256; val eoi = 257
      val codes = scala.collection.mutable.ArrayBuffer[Int](clear)
      var sinceClear = 0
      px.foreach { p =>
        if (sinceClear == 126) { codes += clear; sinceClear = 0 }
        codes += (p & 0xff); sinceClear += 1
      }
      codes += eoi
      // pack 9-bit codes LSB-first (GIF bit order), then sub-block
      val data = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      codes.foreach { c =>
        acc |= (c.toLong << nbits); nbits += 9
        while (nbits >= 8) {
          data.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
        }
      }
      if (nbits > 0) data.write((acc & 0xff).toInt)
      val db = data.toByteArray
      var off = 0
      while (off < db.length) {
        val n = math.min(255, db.length - off)
        out.write(n); out.write(db, off, n); off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode EVERY frame of a (possibly animated) GIF via the JDK's
    * multi-image reader — the real one-row-in → many-frames-out video
    * shape. Each frame comes back as its own raw raster (not composited
    * onto prior frames — [[encodeGif]] writes full-size frames, so for
    * its output raw = composed). Corrupt input dies as
    * [[MediaDecodeException]], consistent with every parser here.
    */
  def decodeGifFrames(bytes: Array[Byte]): Seq[GifFrame] = {
    if (!(bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8'))
      throw new MediaDecodeException("not a GIF (missing 'GIF8' magic)")
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext)
      throw new MediaDecodeException("no GIF reader available")
    val reader = readers.next()
    try {
      reader.setInput(iis, false, true)
      val n =
        try reader.getNumImages(true)
        catch { case e: Exception =>
          throw new MediaDecodeException(s"bad GIF structure: ${e.getMessage}")
        }
      if (n <= 0) throw new MediaDecodeException("GIF has no frames")
      (0 until n).map { f =>
        val img =
          try reader.read(f)
          catch { case e: Exception =>
            throw new MediaDecodeException(
              s"GIF frame $f undecodable: ${e.getMessage}")
          }
        val w = img.getWidth; val h = img.getHeight
        if (w.toLong * h * 3 > Int.MaxValue - 8)
          throw new MediaDecodeException(s"frame dims ${w}x$h overflow")
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val d = (y * w + x) * 3
            rgb(d) = ((p >> 16) & 0xff).toByte
            rgb(d + 1) = ((p >> 8) & 0xff).toByte
            rgb(d + 2) = (p & 0xff).toByte
            x += 1
          }
          y += 1
        }
        GifFrame(f, w, h, rgb)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Write a 16-bit signed LE PCM RIFF/WAVE file from interleaved
    * samples — round-trips through [[WavDecoder]] and through
    * `AudioSystem.getAudioInputStream`.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad rate/channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * 2) // byte rate
    put16(32, channels * 2); put16(34, 16) // block align, bits
    tag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i))
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize over packed top-down RGB triples — the
    * thumbnail/normalize step of an image pipeline, pure JVM. Exact for
    * integer scale factors; O(outW*outH) regardless of input size.
    */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
      outW: Int, outH: Int): Array[Byte] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0, "bad dimensions")
    require(rgb.length == w * h * 3, "rgb length mismatch")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = math.min((y.toLong * h / outH).toInt, h - 1)
      var x = 0
      while (x < outW) {
        val sx = math.min((x.toLong * w / outW).toInt, w - 1)
        val s = (sy * w + sx) * 3
        val d = (y * outW + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
