package graft

/** Pixel-drift bound for the lossy member of the decode family
  * (`mm_decode_jpeg`): the oracle hash-checks only the PARSED
  * dimensions (lossy pixels are codec-version-dependent), so this
  * spec carries the quantitative half — the decoded raster must stay
  * within a few grey levels of the closed-form ramp the encoder
  * wrote. A broken encode (wrong raster type, stride bug) or decode
  * (color-profile remap, truncation) blows far past these bounds.
  */
class JpegDriftSpec extends SparkTestBase {

  test("JPEG round-trip drift is bounded on the smooth ramp") {
    var worst = 0
    var sumAbs = 0L
    var n = 0L
    // deterministic sample of doc ids across the dimension lattice
    (0L until 48L).foreach { id =>
      val (w, h) = operators.Multimodal.jpegDimsOf(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(operators.Multimodal.jpegOf(id)))
      assert(img.getWidth == w && img.getHeight == h,
        s"id=$id: parsed dims ${img.getWidth}x${img.getHeight} != ${w}x$h")
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = math.abs(raster.getSample(x, y, 0) -
            operators.Multimodal.jpxOf(id, x, y))
          worst = math.max(worst, d)
          sumAbs += d
          n += 1
          x += 1
        }
        y += 1
      }
    }
    val mean = sumAbs.toDouble / n
    // smooth ramp: baseline-JPEG DCT error is a few grey levels; the
    // clip at 255 adds a mild edge, hence the max allowance
    assert(mean <= 4.0, s"mean abs drift $mean > 4 grey levels")
    assert(worst <= 32, s"max abs drift $worst > 32 grey levels")
  }
}
