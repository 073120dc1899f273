package graft.dev

/** Exhaustive exactness probe for the flat-block JPEG fixture: all 256
  * block values, every pixel — decoded through the real JDK JPEG path.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val vals = Array.tabulate(256)(identity)
    val jpg = graft.operators.MediaCodecs.encodeJpegFlatBlocks(16, 16, vals)
    val (w, h, rgb) = graft.operators.MediaCodecs.imageIoRgb(jpg, "jpeg")
    var bad = 0
    for (by <- 0 until 16; bx <- 0 until 16; y <- 0 until 8; x <- 0 until 8) {
      val v = vals(by * 16 + bx)
      val px = ((by * 8 + y) * w + (bx * 8 + x)) * 3
      if ((rgb(px) & 0xff) != v || (rgb(px + 1) & 0xff) != v ||
        (rgb(px + 2) & 0xff) != v) bad += 1
    }
    println(s"dims ${w}x$h bad=$bad of ${w * h} -> " +
      (if (bad == 0) "EXACT" else "NOT EXACT"))
  }
}
