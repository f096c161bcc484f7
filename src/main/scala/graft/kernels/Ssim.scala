package graft.kernels

/** E12 — SSIM, faithful to the reference's call
  * (`skimage.metrics.structural_similarity(image1, image2, full=True)`,
  * `/root/reference/advanced_metrics.py:7-21`) with skimage defaults for
  * uint8 2-D inputs: win_size=7, UNIFORM filter (gaussian_weights=False),
  * K1=0.01, K2=0.03, data_range=255, sample covariance (N/(N-1)), and the
  * mean taken over the pad-cropped map.
  */
object Ssim {

  private def uniformFilter(img: Array[Double], h: Int, w: Int, size: Int): Array[Double] = {
    // scipy.ndimage.uniform_filter default mode 'reflect' (= symmetric:
    // dcba|abcd|dcba), origin 0
    val r = size / 2
    @inline def reflect(i: Int, n: Int): Int = {
      var x = i
      val period = 2 * n
      x = ((x % period) + period) % period
      if (x >= n) period - 1 - x else x
    }
    val tmp = new Array[Double](h * w)
    val out = new Array[Double](h * w)
    // separable: rows then cols; for odd size window centered
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0; var i = -r
        while (i <= size - 1 - r) { acc += img(y * w + reflect(x + i, w)); i += 1 }
        tmp(y * w + x) = acc / size
        x += 1
      }
      y += 1
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0; var i = -r
        while (i <= size - 1 - r) { acc += tmp(reflect(y + i, h) * w + x); i += 1 }
        out(y * w + x) = acc / size
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mean SSIM of two equal-shape images (values 0..255). */
  def ssim(img1: Array[Double], img2: Array[Double], h: Int, w: Int,
      winSize: Int = 7, dataRange: Double = 255.0): Double = {
    require(img1.length == h * w && img2.length == h * w)
    require(h >= winSize && w >= winSize, s"image smaller than win_size=$winSize")
    val np = winSize.toDouble * winSize
    val covNorm = np / (np - 1) // sample covariance (skimage default)
    val k1 = 0.01; val k2 = 0.03
    val c1 = math.pow(k1 * dataRange, 2)
    val c2 = math.pow(k2 * dataRange, 2)

    val ux = uniformFilter(img1, h, w, winSize)
    val uy = uniformFilter(img2, h, w, winSize)
    val uxx = uniformFilter(img1.map(v => v * v), h, w, winSize)
    val uyy = uniformFilter(img2.map(v => v * v), h, w, winSize)
    val uxy = uniformFilter(Array.tabulate(h * w)(i => img1(i) * img2(i)), h, w, winSize)

    val pad = (winSize - 1) / 2
    var sum = 0.0; var cnt = 0L
    var y = pad
    while (y < h - pad) {
      var x = pad
      while (x < w - pad) {
        val i = y * w + x
        val vx = covNorm * (uxx(i) - ux(i) * ux(i))
        val vy = covNorm * (uyy(i) - uy(i) * uy(i))
        val vxy = covNorm * (uxy(i) - ux(i) * uy(i))
        val a1 = 2 * ux(i) * uy(i) + c1
        val a2 = 2 * vxy + c2
        val b1 = ux(i) * ux(i) + uy(i) * uy(i) + c1
        val b2 = vx + vy + c2
        sum += (a1 * a2) / (b1 * b2)
        cnt += 1
        x += 1
      }
      y += 1
    }
    sum / cnt
  }

  /** The reference's SSIM wrapper coercions
    * (`/root/reference/advanced_metrics.py:8-19`): non-uint8 inputs are
    * max-scaled to uint8 first. Shape-resize divergence is out of scope
    * (callers pass equal shapes). */
  def ssimU8Coerced(a: Array[Double], b: Array[Double], h: Int, w: Int): Double = {
    def coerce(img: Array[Double]): Array[Double] = {
      val mx = math.max(img.max, 1e-6)
      img.map(v => (v / mx * 255).toInt.toDouble)
    }
    ssim(coerce(a), coerce(b), h, w)
  }

  /** E13 — BF score (`advanced_metrics.cpython-312.pyc` lines 45-64; source
    * truncated at `/root/reference/advanced_metrics.py:54`): Sobel magnitude
    * of pred (binarized to {0,255} if not uint8) → Butterworth high-pass →
    * with GT: SSIM(filtered_pred, filtered_gt); without GT:
    * `sum(filtered_edges) / (size·255)`.
    */
  def bfScore(pred: Array[Int], gtOpt: Option[Array[Int]], h: Int, w: Int,
      cutoff: Double = 30, order: Int = 2): Double = {
    def filteredEdges(m: Array[Int]): Array[Int] = {
      val edges = ImageKernels.maxNormalizeToU8(
        ImageKernels.sobelMagnitude(m.map(_.toDouble), h, w))
      ImageKernels.butterworth(edges.map(_.toDouble), h, w, cutoff, order, highPass = true)
    }
    val fp = filteredEdges(pred)
    gtOpt match {
      case Some(gt) =>
        ssimU8Coerced(fp.map(_.toDouble), filteredEdges(gt).map(_.toDouble), h, w)
      case None =>
        fp.map(_.toLong).sum.toDouble / (h.toLong * w * 255)
    }
  }
}
