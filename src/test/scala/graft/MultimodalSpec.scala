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

  // ------------------------------------------------ real pure-JVM codecs

  import graft.operators.MediaCodecs
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

  /** Deterministic RGB test card: gradient + channel stripes, odd width
    * so BMP rows need padding.
    */
  private def testCard(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val px = i / 3
      (i % 3 match {
        case 0 => (px * 7) % 256 // R gradient
        case 1 => ((px / w) * 40) % 256 // G by row
        case 2 => ((px % w) * 60) % 256 // B by column
      }).toByte
    }

  test("encodeBmp round-trips through JDK ImageIO (encode oracle)") {
    val (w, h) = (5, 3) // width 5 → 15-byte rows padded to 16
    val rgb = testCard(w, h)
    val bmp = MediaCodecs.encodeBmp(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bmp))
    assert(img != null, "JDK ImageIO rejected our BMP bytes")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val s = (y * w + x) * 3
      assert(((p >> 16) & 0xff) === (rgb(s) & 0xff), s"R at ($x,$y)")
      assert(((p >> 8) & 0xff) === (rgb(s + 1) & 0xff), s"G at ($x,$y)")
      assert((p & 0xff) === (rgb(s + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("encodePng round-trips through JDK ImageIO pixel-exactly (encode oracle)") {
    // multi-scanline + boundary values: 0x00 and 0xff land in the
    // raster, and a width whose stride exercises >1 filter byte
    val (w, h) = (6, 3)
    val rgb = testCard(w, h)
    rgb(0) = 0x00.toByte; rgb(1) = 0xff.toByte
    val png = MediaCodecs.encodePng(w, h, rgb)
    // container sanity: PNG signature + IHDR first, IEND last
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    assert(new String(png.slice(12, 16), "US-ASCII") === "IHDR")
    assert(new String(png.slice(png.length - 8, png.length - 4),
      "US-ASCII") === "IEND")
    val (dw, dh, px) = MediaCodecs.imageIoRgb(png, "png")
    assert(dw === w && dh === h)
    assert(px.toSeq === rgb.toSeq,
      "JDK PNG decode must reproduce the encoder's raster bit-exactly")
    // the registry routes PNG through ImageIoDecoder with the same dims
    val dm = MediaCodecs.ImageIoDecoder.decode(png)
    assert(dm.format === "png" && dm.width === w && dm.height === h)

    // a stored-block stream longer than one 64 KiB deflate block still
    // decodes (the multi-block path): 160x140 → raw 67,340 bytes
    val (bw, bh) = (160, 140)
    val big = Array.tabulate(bw * bh * 3)(i => ((i * 31) % 256).toByte)
    val (gw, gh, gpx) = MediaCodecs.imageIoRgb(
      MediaCodecs.encodePng(bw, bh, big), "png")
    assert(gw === bw && gh === bh && gpx.toSeq === big.toSeq)
  }

  test("encodeJpegFlatBlocks decodes pixel-exactly through the JDK JPEG codec") {
    // flat DC-only blocks + all-8s quant = zero IDCT rounding freedom;
    // flat chroma = exact color convert. Sweep ALL 256 block values.
    val vals = Array.tabulate(256)(identity)
    val jpg = MediaCodecs.encodeJpegFlatBlocks(16, 16, vals)
    val (w, h, rgb) = MediaCodecs.imageIoRgb(jpg, "jpeg")
    assert(w === 128 && h === 128)
    for (by <- 0 until 16; bx <- 0 until 16; y <- 0 until 8; x <- 0 until 8) {
      val v = vals(by * 16 + bx)
      val px = ((by * 8 + y) * w + (bx * 8 + x)) * 3
      assert((rgb(px) & 0xff) === v && (rgb(px + 1) & 0xff) === v &&
        (rgb(px + 2) & 0xff) === v, s"block($bx,$by)=$v at ($x,$y)")
    }
    // the registry sniffs and routes it as a real JPEG
    val dm = MediaCodecs.ImageIoDecoder.decode(jpg)
    assert(dm.format === "jpeg" && dm.width === 128 && dm.height === 128)
  }

  test("BmpDecoder parses JDK-ImageIO-written BMPs (decode oracle)") {
    val (w, h) = (7, 4) // 21-byte rows padded to 24
    val rgb = testCard(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) |
        ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val (dw, dh, dpx) = MediaCodecs.BmpDecoder.decodePixels(bos.toByteArray)
    assert(dw === w && dh === h)
    assert(dpx.toSeq === rgb.toSeq)
    val m = MediaCodecs.BmpDecoder.decode(bos.toByteArray)
    assert(m.kind === "image" && m.format === "bmp" && m.nSamples === w.toLong * h)
  }

  test("BmpDecoder rejects malformed input loudly") {
    val good = MediaCodecs.encodeBmp(4, 4, testCard(4, 4))
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.BmpDecoder.decodePixels(java.util.Arrays.copyOf(good, 60))
    }
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.BmpDecoder.decodePixels(rle)
    }
  }

  test("encodeWavPcm16 round-trips through JDK AudioSystem (encode oracle)") {
    val samples = Array.tabulate(16)(i => ((i - 8) * 3000).toShort)
    val wav = MediaCodecs.encodeWavPcm16(8000, 2, samples)
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 8000f)
    assert(fmt.getChannels === 2)
    assert(fmt.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === 8) // 16 samples / 2 channels
    val pcm = ais.readAllBytes()
    val decodedViaJdk = Array.tabulate(16)(i =>
      ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort)
    assert(decodedViaJdk.toSeq === samples.toSeq)
  }

  test("WavDecoder parses JDK-AudioSystem-written WAVs, incl. 8-bit") {
    // 16-bit via the JDK writer
    val samples = Array.tabulate(10)(i => (i * 2500 - 12000).toShort)
    val pcm = new Array[Byte](20)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt16 = new javax.sound.sampled.AudioFormat(11025f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt16, 10),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (rate, ch, parsed) = MediaCodecs.WavDecoder.decodeSamples(bos.toByteArray)
    assert(rate === 11025 && ch === 1)
    assert(parsed.toSeq === samples.toSeq)

    // 8-bit unsigned via the JDK writer → centered, upscaled to 16-bit
    val raw8 = Array[Byte](0, 64.toByte, 128.toByte, 192.toByte, 255.toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val bos8 = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(raw8), fmt8, 5),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val (rate8, _, parsed8) = MediaCodecs.WavDecoder.decodeSamples(bos8.toByteArray)
    assert(rate8 === 8000)
    assert(parsed8.toSeq === raw8.toSeq.map(b => (((b & 0xff) - 128) << 8).toShort))
  }

  test("ImageIoDecoder decodes PNG with correct dims and features") {
    val (w, h) = (6, 2)
    val rgb = testCard(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) |
        ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val m = MediaCodecs.ImageIoDecoder.decode(bos.toByteArray)
    assert(m.format === "png" && m.width === w && m.height === h)
    // PNG is lossless → features must equal the BMP route's features
    val viaBmp = MediaCodecs.BmpDecoder.decode(MediaCodecs.encodeBmp(w, h, rgb))
    assert(m.features.toSeq === viaBmp.features.toSeq)
  }

  test("ImageIoDecoder decodes GIF and JPEG with correct dims") {
    // two-tone image survives GIF's 256-color palette exactly
    val (w, h) = (8, 4)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    // oracle: whatever ImageIO.read itself sees in those bytes (the JDK
    // GIF *encoder* palettizes lossily, so compare post-decode to
    // post-decode, not to the pre-encode image)
    def meanLum(bytes: Array[Byte]): Float = {
      val back = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      var s = 0.0
      for (y <- 0 until back.getHeight; x <- 0 until back.getWidth) {
        val p = back.getRGB(x, y)
        s += 0.2126 * ((p >> 16) & 0xff) + 0.7152 * ((p >> 8) & 0xff) +
          0.0722 * (p & 0xff)
      }
      (s / (back.getWidth * back.getHeight) / 255.0).toFloat
    }
    val gifB = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", gifB))
    val gif = MediaCodecs.ImageIoDecoder.decode(gifB.toByteArray)
    assert(gif.format === "gif" && gif.width === w && gif.height === h)
    assert(math.abs(gif.features(6) - meanLum(gifB.toByteArray)) < 1e-4)

    // JPEG: dims exact, decoded luminance matches the JDK's own decode
    val jpgB = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jpgB))
    val jpg = MediaCodecs.ImageIoDecoder.decode(jpgB.toByteArray)
    assert(jpg.format === "jpeg" && jpg.width === w && jpg.height === h)
    assert(math.abs(jpg.features(6) - meanLum(jpgB.toByteArray)) < 1e-4)
    // and the registry sniffs both without being told the format
    assert(MediaCodecs.auto(gifB.toByteArray).get.format === "gif")
    assert(MediaCodecs.auto(jpgB.toByteArray).get.format === "jpeg")
  }

  test("decodeMedia over a mixed corpus: real codecs + reported opaque fallback") {
    val bmp = MediaCodecs.encodeBmp(4, 4, testCard(4, 4))
    val wav = MediaCodecs.encodeWavPcm16(16000, 1,
      Array.tabulate(8)(i => (i * 1000).toShort))
    val junk = "not a media file".getBytes("UTF-8")
    val df = Seq((1L, bmp), (2L, wav), (3L, junk))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, "doc_id", "payload")
      .sort("doc_id").collect()
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("image", "bmp"), ("audio", "wav"), ("opaque", "opaque")))
    assert(out(0).getInt(3) === 4 && out(0).getInt(4) === 4) // width, height
    assert(out(1).getInt(6) === 16000 && out(1).getLong(7) === 8L)
    // opaque rows carry the stub features, never a crash or a dropped row
    assert(out(2).getAs[Seq[Float]]("features") ===
      Multimodal.fakeDecode(junk).toSeq)
    // and realDecode routes the same way
    assert(Multimodal.realDecode(junk).toSeq === Multimodal.fakeDecode(junk).toSeq)
    assert(Multimodal.realDecode(bmp).toSeq ===
      MediaCodecs.BmpDecoder.decode(bmp).features.toSeq)
  }

  test("corrupt-but-sniffed payloads are reported, never fail the job") {
    val good = MediaCodecs.encodeBmp(4, 4, testCard(4, 4))
    val truncated = java.util.Arrays.copyOf(good, 60) // BM magic, no pixels
    val rle = good.clone(); rle(30) = 1 // unsupported compression
    val badWav = "RIFF????WAVE".getBytes("US-ASCII") ++
      Array.fill[Byte](40)(0x7f.toByte) // magic ok, chunk soup
    // tryAuto: Corrupt (with the sniffed codec), not an exception
    assert(MediaCodecs.tryAuto(truncated) ===
      MediaCodecs.Corrupt("bmp", "pixel data truncated vs header dimensions"))
    assert(MediaCodecs.tryAuto(rle).isInstanceOf[MediaCodecs.Corrupt])
    assert(MediaCodecs.tryAuto(badWav) match {
      case MediaCodecs.Corrupt("wav", _) => true
      case _ => false
    })
    // ...and through the DataFrame op: rows survive with kind=corrupt
    val df = Seq((1L, good), (2L, truncated), (3L, rle))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeMedia(df, "doc_id", "payload")
      .sort("doc_id").collect()
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("image", "bmp"), ("corrupt", "bmp"), ("corrupt", "bmp")))
    // realDecode falls back to the stub instead of throwing
    assert(Multimodal.realDecode(truncated).toSeq ===
      Multimodal.fakeDecode(truncated).toSeq)
    // hostile BMP headers die as MediaDecodeException, not index errors
    val evilOff = good.clone()
    evilOff(10) = 2; evilOff(11) = 0; evilOff(12) = 0; evilOff(13) = 0
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.BmpDecoder.decodePixels(evilOff)
    }
    // hostile WAV chunk length (0xFFFFFFF0) dies the same way
    val evilWav = MediaCodecs.encodeWavPcm16(8000, 1,
      Array.tabulate(4)(_.toShort))
    evilWav(40) = 0xf0.toByte; evilWav(41) = 0xff.toByte
    evilWav(42) = 0xff.toByte; evilWav(43) = 0xff.toByte
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.WavDecoder.decodeSamples(evilWav)
    }
    // hostile BMP hdrSize near Int.MaxValue must not overflow 14+hdrSize
    // into a negative bound and decode header bytes as pixels
    val evilHdr = good.clone()
    evilHdr(14) = 0xf0.toByte; evilHdr(15) = 0xff.toByte
    evilHdr(16) = 0xff.toByte; evilHdr(17) = 0x7f.toByte
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.BmpDecoder.decodePixels(evilHdr)
    }
    // a 16-bit data chunk with an ODD byte count is corrupt, not one
    // sample shorter
    val oddWav = MediaCodecs.encodeWavPcm16(8000, 1,
      Array.tabulate(4)(_.toShort))
    oddWav(40) = 7 // data chunk claims 7 of the 8 payload bytes
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.WavDecoder.decodeSamples(oddWav)
    }
  }

  test("animated GIF round-trips every frame exactly through the JDK reader") {
    val (w, h) = (4, 2)
    // two frames with distinct, boundary-heavy palette indices
    val f0 = Array[Byte](0, 1, 127, -128, -1, 63, 7, 99)
    val f1 = Array.tabulate[Byte](8)(i => (200 + i).toByte)
    val gif = MediaCodecs.encodeGif(w, h, Seq(f0, f1))
    val frames = MediaCodecs.decodeGifFrames(gif)
    assert(frames.map(_.frameNo) === Seq(0, 1))
    frames.zip(Seq(f0, f1)).foreach { case (fr, idx) =>
      assert(fr.width === w && fr.height === h)
      idx.zipWithIndex.foreach { case (pi, p) =>
        val (r, g, b) = MediaCodecs.gifPaletteRgb(pi & 0xff)
        assert((fr.rgb(p * 3) & 0xff) === r, s"frame ${fr.frameNo} px $p R")
        assert((fr.rgb(p * 3 + 1) & 0xff) === g, s"frame ${fr.frameNo} px $p G")
        assert((fr.rgb(p * 3 + 2) & 0xff) === b, s"frame ${fr.frameNo} px $p B")
      }
    }
    // the single-image ImageIoDecoder also accepts it (first frame)
    val dm = MediaCodecs.ImageIoDecoder.decode(gif)
    assert(dm.format === "gif" && dm.width === w && dm.height === h)
    // corrupt input dies as MediaDecodeException, not a reader error
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.decodeGifFrames("GIF89a not actually a gif".getBytes)
    }
    intercept[MediaCodecs.MediaDecodeException] {
      MediaCodecs.decodeGifFrames(Array[Byte](1, 2, 3))
    }
  }

  test("gifFrames op is total: one row per frame, corrupt rows marked") {
    val good = MediaCodecs.encodeGif(2, 1,
      Seq(Array[Byte](5, 10), Array[Byte](15, 20), Array[Byte](25, 30)))
    val df = Seq((1L, good), (2L, java.util.Arrays.copyOf(good, 20)))
      .toDF("doc_id", "payload")
    val out = Multimodal.gifFrames(df, "doc_id", "payload")
      .select("doc_id", "frame_no", "width", "height")
      .as[(Long, Int, Int, Int)].collect().sorted.toSeq
    assert(out === Seq((1L, 0, 2, 1), (1L, 1, 2, 1), (1L, 2, 2, 1),
      (2L, -1, 0, 0)),
      "3 real frames for the good row, one marker row for the corrupt one")
  }

  test("resizeNearest halves a test card exactly") {
    val (w, h) = (4, 4)
    val rgb = testCard(w, h)
    val out = MediaCodecs.resizeNearest(w, h, rgb, 2, 2)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3) {
      val expected = rgb(((2 * y) * w + 2 * x) * 3 + c)
      assert(out((y * 2 + x) * 3 + c) === expected, s"at ($x,$y,$c)")
    }
  }

  test("energyHash: threshold packing, container invariance, degenerate clips") {
    import graft.operators.MediaCodecs
    // second half loud (1000), first half quiet (0): loud windows sit
    // above the mean → bits 32..63 set → hi = 0xFFFFFFFF, lo = 0
    val halfLoud = Array.tabulate[Short](128)(j =>
      if (j >= 64) 1000.toShort else 0.toShort)
    val (hi, lo) = Multimodal.energyHash(halfLoud)
    assert(hi === 0xffffffffL && lo === 0L)

    // the hash is a property of the SAMPLES, not the container: the
    // real RIFF encode→decode round trip hashes identically
    val viaWav = MediaCodecs.WavDecoder
      .decodeSamples(MediaCodecs.encodeWavPcm16(16000, 1, halfLoud))._3
    assert(Multimodal.energyHash(viaWav) === ((hi, lo)))

    // |s| drives the energy: a sign flip changes nothing
    assert(Multimodal.energyHash(halfLoud.map(s => (-s).toShort))
      === ((hi, lo)))

    // silence: total energy 0, no window is STRICTLY above the mean —
    // all bits 0 (not an exception, not all-ones)
    assert(Multimodal.energyHash(new Array[Short](128)) === ((0L, 0L)))

    // a clip shorter than 64 samples still partitions totally: the
    // floor-boundary windows leave some windows empty (E = 0) and the
    // occupied loud ones clear the mean — deterministic, total
    val short = Array.tabulate[Short](10)(j =>
      if (j >= 5) 800.toShort else 0.toShort)
    val (sh, sl) = Multimodal.energyHash(short)
    assert(java.lang.Long.bitCount(sh) + java.lang.Long.bitCount(sl) === 5,
      "exactly the 5 loud samples' windows should clear the mean")
    // and the undecodable contract matches the image path
    assert(Multimodal.energyHashOf(null) === None)
    assert(Multimodal.energyHashOf(Array[Byte](1, 2, 3)) === None)
  }

  test("averageHash: threshold packing, container invariance, noise robustness") {
    import graft.operators.MediaCodecs
    // left half dark (0), right half bright (200): bright pixels sit
    // above the mean, so each row packs to 0xF0 — both 32-bit halves
    // are 0xF0F0F0F0
    val rgb = new Array[Byte](192)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      rgb((y * 8 + x) * 3 + c) = if (x >= 4) 200.toByte else 0.toByte
    val (hi, lo) = Multimodal.averageHash(8, 8, rgb)
    assert(lo === 0xf0f0f0f0L && hi === 0xf0f0f0f0L)

    // the hash is a property of the IMAGE, not the container: the same
    // raster through the real BMP and PNG encode→decode round trips
    // hashes identically
    val viaBmp = MediaCodecs.BmpDecoder
      .decodePixels(MediaCodecs.encodeBmp(8, 8, rgb))
    val viaPng = MediaCodecs.imageIoRgb(MediaCodecs.encodePng(8, 8, rgb),
      "png")
    assert(Multimodal.averageHash(viaBmp._1, viaBmp._2, viaBmp._3)
      === ((hi, lo)))
    assert(Multimodal.averageHash(viaPng._1, viaPng._2, viaPng._3)
      === ((hi, lo)))

    // 16×8 input: the downscale keeps even columns, so junk in odd
    // columns cannot reach the hash
    val wide = new Array[Byte](16 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
      wide((y * 16 + 2 * x) * 3 + c) = rgb((y * 8 + x) * 3 + c)
      wide((y * 16 + 2 * x + 1) * 3 + c) = 123.toByte
    }
    assert(Multimodal.averageHash(16, 8, wide) === ((hi, lo)))

    // low-bit noise (re-encode jitter) far from the mean flips nothing
    val noisy = rgb.clone()
    for (i <- noisy.indices) noisy(i) = ((noisy(i) & 0xf8) | (i % 8)).toByte
    assert(Multimodal.averageHash(8, 8, noisy) === ((hi, lo)))
  }
}
