package graft.operators

/** The ONE source of truth for the deterministic binary-image fixture
  * every media-path surface shares: the declared `mm_ahash_*` query
  * fixtures ([[graft.queries.TextQueries]]), the media-index and
  * streaming specs (`MediaFixture`), and the ×1/×10/×100 stress harness
  * (`graft.dev.MediaStress`). The DuckDB oracle derives each image's
  * aHash code ANALYTICALLY from these exact md5 chains
  * (`TextQueries.ahashCodeCtes`), so all consumers must synthesize
  * byte-identical payloads — which is why the synthesis lives here once
  * instead of in three drift-prone copies.
  *
  * Pixel math: a 16×8 logical grayscale grid where pixel i takes its 5
  * high bits from byte i of the TEMPLATE md5 chain and its 3 low bits
  * from byte i of the NOISE chain — same-template images are
  * perceptually near (re-encodes/crops of one photo), different
  * templates distinct. Optional nearest-neighbor upscaling replicates
  * pixels, so the 8×8 downscale inside the aHash samples the same
  * logical grid and near-dup structure survives any `w`×`h`.
  */
object SyntheticMedia {

  /** 128 deterministic bytes of `s`: md5(s) ++ md5(s+"x1") ++ … ++
    * md5(s+"x7") — one byte per logical pixel.
    */
  def chain(s: String): Array[Byte] = {
    val out = new Array[Byte](128)
    var j = 0
    while (j < 8) {
      val key = if (j == 0) s else s + "x" + j
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.arraycopy(d, 0, out, 16 * j, 16)
      j += 1
    }
    out
  }

  /** The fixture image as a `w`×`h` BMP (spec-level encoder —
    * [[MediaCodecs.encodeBmp]]). Dimensions must upscale the 16×8
    * logical grid evenly; the 16×8 default is the query/spec fixture,
    * larger sizes give the stress harness realistic decode bytes.
    */
  def bmp(template: String, noise: String, w: Int = 16,
      h: Int = 8): Array[Byte] = {
    require(w % 16 == 0 && h % 8 == 0, s"scale 16x8 evenly, got ${w}x$h")
    val t = chain(template)
    val n = chain(noise)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * 8 / h) * 16 + (x * 16 / w)
        val v = ((t(base) & 0xf8) | (n(base) & 0x07)).toByte
        val o = 3 * (y * w + x)
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        x += 1
      }
      y += 1
    }
    MediaCodecs.encodeBmp(w, h, rgb)
  }

  /** The fixture's AUDIO twin: a 128-sample 16 kHz mono PCM16 WAV whose
    * sample j takes 5 magnitude bits from the TEMPLATE chain and 3 from
    * the NOISE chain — ((t(j)&0xf8)|(n(j)&0x07)) << 4, always
    * non-negative — so same-template clips are energy-envelope-near the
    * way re-encodes/trims of one recording are, and the energy-hash
    * oracle derives every bit analytically from the same md5 chains the
    * image fixture uses.
    */
  def wav(template: String, noise: String): Array[Byte] = {
    val t = chain(template)
    val n = chain(noise)
    val samples = Array.tabulate[Short](128)(j =>
      (((t(j) & 0xf8) | (n(j) & 0x07)) << 4).toShort)
    MediaCodecs.encodeWavPcm16(16000, 1, samples)
  }

  /** The fixture's VIDEO twin: a 4-frame 16×8 GIF89a clip whose frame
    * `f` pixel `i` is the PALETTE INDEX ((t(i)&0xf8)|(n_f(i)&0x07)) —
    * template structure shared across frames, per-frame noise from the
    * chain of `noise + "f" + f` — so same-template clips are
    * temporally-pooled-near the way re-encodes/frame-rate changes of
    * one clip are. [[MediaCodecs.encodeGif]]'s analytic palette maps
    * index v to RGB (v, 255−v, (7v) mod 256), so the frame-hash oracle
    * derives each pooled gray cell as 255 + (7v mod 256) straight from
    * the md5 chains.
    */
  def gif(template: String, noise: String, frames: Int = 4): Array[Byte] = {
    val t = chain(template)
    val rasters = (0 until frames).map { f =>
      val n = chain(noise + "f" + f)
      Array.tabulate[Byte](128)(i => ((t(i) & 0xf8) | (n(i) & 0x07)).toByte)
    }
    MediaCodecs.encodeGif(16, 8, rasters)
  }
}
