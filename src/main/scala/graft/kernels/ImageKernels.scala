package graft.kernels

/** Dense per-image kernels — the genuinely stencil/sequential/frequency-domain
  * operators of the reference that have no reasonable relational form
  * (SURVEY.md §2.D2/D3/D11/D12/D14, §7.1). They run as JVM functions inside
  * Spark UDFs/mapPartitions: per-image work parallelizes across images (one
  * image per row), exactly like the reference's Beam ParDo.
  *
  * Images are row-major `Array[Double]` + (h, w). All borders use OpenCV's
  * default BORDER_REFLECT_101 (gfedcb|abcdefgh|gfedcba) unless noted.
  */
object ImageKernels {

  @inline private def reflect101(i: Int, n: Int): Int = {
    if (n == 1) 0
    else {
      var x = i
      val period = 2 * (n - 1)
      x = ((x % period) + period) % period
      if (x >= n) period - x else x
    }
  }

  /** OpenCV getGaussianKernel: size from sigma when ksize=(0,0) for 8-bit:
    * `ksize = 2*round(sigma*3)+1 |1` per cv::GaussianBlur
    * (`cvRound(sigma*3*2 + 1) | 1`). Kernel g_i ∝ exp(-(i-c)²/(2σ²)),
    * normalized to sum 1. */
  def gaussianKernel1d(sigma: Double): Array[Double] = {
    val ksize = (math.round(sigma * 3 * 2 + 1).toInt) | 1
    val c = ksize / 2
    val k = Array.tabulate(ksize)(i => math.exp(-(i - c) * (i - c) / (2 * sigma * sigma)))
    val s = k.sum
    k.map(_ / s)
  }

  /** D3 — Gaussian blur, separable convolution with reflect-101 borders
    * (`cv2.GaussianBlur(img, (0,0), sigmaX=s)`,
    * `/root/reference/dataflow_pipeline.py:45`, `utils.py:29`). Float path;
    * uint8 callers round the result. */
  def gaussianBlur(img: Array[Double], h: Int, w: Int, sigma: Double): Array[Double] = {
    if (sigma <= 0) return img.clone()
    val k = gaussianKernel1d(sigma)
    val r = k.length / 2
    val tmp = new Array[Double](h * w)
    val out = new Array[Double](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0; var i = -r
        while (i <= r) { acc += k(i + r) * img(y * w + reflect101(x + i, w)); i += 1 }
        tmp(y * w + x) = acc; x += 1
      }
      y += 1
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0; var i = -r
        while (i <= r) { acc += k(i + r) * tmp(reflect101(y + i, h) * w + x); i += 1 }
        out(y * w + x) = acc; x += 1
      }
      y += 1
    }
    out
  }

  /** D2 — CLAHE (`cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8))`,
    * `/root/reference/dataflow_pipeline.py:43`, `utils.py:34`,
    * `preprocessor.py:102-130`). Faithful to the OpenCV algorithm: per-tile
    * 256-bin histogram; clip at `max(clipLimit·tileArea/256, 1)` with the
    * excess redistributed uniformly (plus residual round-robin); per-tile
    * LUT = cumsum scaled to 255; output = bilinear interpolation between the
    * four surrounding tile LUTs. Input/output uint8 in Array[Int].
    */
  def clahe(img: Array[Int], h: Int, w: Int, clipLimit: Double = 2.0,
      tilesY: Int = 8, tilesX: Int = 8): Array[Int] = {
    // OpenCV pads the image to a multiple of the grid with BORDER_REFLECT_101;
    // we index through a padded coordinate map instead of materializing it.
    val tileH = (h + tilesY - 1) / tilesY
    val tileW = (w + tilesX - 1) / tilesX
    @inline def at(y: Int, x: Int): Int = img(reflect101(y, h) * w + reflect101(x, w))

    val tileArea = tileH * tileW
    val clip = math.max((clipLimit * tileArea / 256).toInt, 1)
    val lutScale = 255.0 / tileArea
    val luts = Array.ofDim[Int](tilesY * tilesX, 256)
    var ty = 0
    while (ty < tilesY) {
      var tx = 0
      while (tx < tilesX) {
        val hist = new Array[Int](256)
        var y = ty * tileH
        while (y < (ty + 1) * tileH) {
          var x = tx * tileW
          while (x < (tx + 1) * tileW) { hist(at(y, x) & 0xff) += 1; x += 1 }
          y += 1
        }
        // clip + uniform redistribution (OpenCV clahe.cpp)
        var clipped = 0
        var i = 0
        while (i < 256) {
          if (hist(i) > clip) { clipped += hist(i) - clip; hist(i) = clip }
          i += 1
        }
        val redistBatch = clipped / 256
        val residual = clipped - redistBatch * 256
        i = 0
        while (i < 256) { hist(i) += redistBatch; i += 1 }
        // residual: one count every `step` bins (OpenCV clahe.cpp residualStep)
        if (residual > 0) {
          val step = math.max(256 / residual, 1)
          var idx = 0; var left = residual
          while (idx < 256 && left > 0) { hist(idx) += 1; left -= 1; idx += step }
        }
        val lut = luts(ty * tilesX + tx)
        var sum = 0
        i = 0
        while (i < 256) {
          sum += hist(i)
          lut(i) = math.min(math.max(math.round(sum * lutScale).toInt, 0), 255)
          i += 1
        }
        tx += 1
      }
      ty += 1
    }

    // bilinear interpolation between tile LUTs (tile centers as anchors)
    val out = new Array[Int](h * w)
    var y = 0
    while (y < h) {
      val fy = (y + 0.5) / tileH - 0.5
      val ty0 = math.floor(fy).toInt
      val wy = fy - ty0
      val t0 = math.min(math.max(ty0, 0), tilesY - 1)
      val t1 = math.min(math.max(ty0 + 1, 0), tilesY - 1)
      var x = 0
      while (x < w) {
        val fx = (x + 0.5) / tileW - 0.5
        val tx0 = math.floor(fx).toInt
        val wx = fx - tx0
        val s0 = math.min(math.max(tx0, 0), tilesX - 1)
        val s1 = math.min(math.max(tx0 + 1, 0), tilesX - 1)
        val v = img(y * w + x) & 0xff
        val r =
          (1 - wy) * ((1 - wx) * luts(t0 * tilesX + s0)(v) + wx * luts(t0 * tilesX + s1)(v)) +
          wy       * ((1 - wx) * luts(t1 * tilesX + s0)(v) + wx * luts(t1 * tilesX + s1)(v))
        out(y * w + x) = math.min(math.max(math.round(r).toInt, 0), 255)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 3×3 convolution with reflect-101 border (helper for Sobel). */
  private def conv3x3(img: Array[Double], h: Int, w: Int, k: Array[Int]): Array[Double] = {
    val out = new Array[Double](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0.0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            acc += k((dy + 1) * 3 + (dx + 1)) * img(reflect101(y + dy, h) * w + reflect101(x + dx, w))
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = acc
        x += 1
      }
      y += 1
    }
    out
  }

  /** D12 — Sobel edge magnitude, 3×3 CV_64F, max-normalized to uint8
    * (`advanced_metrics.cpython-312.pyc` lines 48-51; source truncated at
    * `/root/reference/advanced_metrics.py:54`):
    * `sqrt(Sobel_x² + Sobel_y²)` then `edges/max(edges.max(),1e-6)*255`.
    */
  def sobelMagnitude(img: Array[Double], h: Int, w: Int): Array[Double] = {
    val kx = Array(-1, 0, 1, -2, 0, 2, -1, 0, 1)
    val ky = Array(-1, -2, -1, 0, 0, 0, 1, 2, 1)
    val gx = conv3x3(img, h, w, kx)
    val gy = conv3x3(img, h, w, ky)
    Array.tabulate(h * w)(i => math.sqrt(gx(i) * gx(i) + gy(i) * gy(i)))
  }

  def maxNormalizeToU8(img: Array[Double]): Array[Int] = {
    val mx = math.max(img.max, 1e-6)
    img.map(v => math.min((v / mx * 255).toInt, 255))
  }

  /** min-max rescale to uint8 with the reference's epsilon guard
    * (`/root/reference/advanced_metrics.py:45-47`): truncating cast. */
  def minMaxRescaleToU8(img: Array[Double]): Array[Int] = {
    val mn = img.min
    val denom = math.max(img.max - mn, 1e-6)
    img.map(v => math.min(math.max(((v - mn) / denom * 255).toInt, 0), 255))
  }

  // --------------------------------------------------------------- FFT
  /** Complex 1-D DFT, naive O(n²) — images here are small tiles; at scale the
    * per-image cost is constant and parallelism is across images. (A radix-2
    * FFT drop-in is possible; profile first.) sign = -1 forward, +1 inverse
    * (inverse scales by 1/n at the 2-D level). */
  private def dft1d(re: Array[Double], im: Array[Double], sign: Int): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    var k = 0
    while (k < n) {
      var sr = 0.0; var si = 0.0
      var t = 0
      while (t < n) {
        val ang = sign * 2.0 * math.Pi * k * t / n
        val c = math.cos(ang); val s = math.sin(ang)
        sr += re(t) * c - im(t) * s
        si += re(t) * s + im(t) * c
        t += 1
      }
      or(k) = sr; oi(k) = si
      k += 1
    }
    (or, oi)
  }

  private def dft2d(re: Array[Double], im: Array[Double], h: Int, w: Int, sign: Int)
      : (Array[Double], Array[Double]) = {
    val rr = re.clone(); val ri = im.clone()
    // rows
    var y = 0
    while (y < h) {
      val (r2, i2) = dft1d(rr.slice(y * w, y * w + w), ri.slice(y * w, y * w + w), sign)
      System.arraycopy(r2, 0, rr, y * w, w); System.arraycopy(i2, 0, ri, y * w, w)
      y += 1
    }
    // cols
    var x = 0
    while (x < w) {
      val cr = Array.tabulate(h)(y2 => rr(y2 * w + x))
      val ci = Array.tabulate(h)(y2 => ri(y2 * w + x))
      val (r2, i2) = dft1d(cr, ci, sign)
      var y2 = 0
      while (y2 < h) { rr(y2 * w + x) = r2(y2); ri(y2 * w + x) = i2(y2); y2 += 1 }
      x += 1
    }
    (rr, ri)
  }

  private def fftshift(a: Array[Double], h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    val sy = h / 2; val sx = w / 2 // np.fft.fftshift: roll by floor(n/2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(((y + sy) % h) * w + ((x + sx) % w)) = a(y * w + x)
        x += 1
      }
      y += 1
    }
    out
  }

  private def ifftshift(a: Array[Double], h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    val sy = (h + 1) / 2; val sx = (w + 1) / 2 // inverse roll: ceil(n/2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(((y + sy) % h) * w + ((x + sx) % w)) = a(y * w + x)
        x += 1
      }
      y += 1
    }
    out
  }

  /** D11 — Butterworth frequency filter
    * (`/root/reference/advanced_metrics.py:24-47`): FFT2 → shift → multiply
    * transfer `H = 1/(1+(D0/(D+1e-8))^2n)` (high-pass) or
    * `1/(1+(D/(D0+1e-8))^2n)` (low-pass) → ifftshift → |IFFT2| → min-max
    * rescale to uint8.
    */
  def butterworth(img: Array[Double], h: Int, w: Int, cutoff: Double = 30,
      order: Int = 2, highPass: Boolean = true): Array[Int] = {
    val (fr, fi) = dft2d(img, new Array[Double](h * w), h, w, -1)
    val sr = fftshift(fr, h, w); val si = fftshift(fi, h, w)
    val crow = h / 2; val ccol = w / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val du = y - crow; val dv = x - ccol
        val d = math.sqrt(du.toDouble * du + dv.toDouble * dv)
        val hh =
          if (highPass) 1.0 / (1.0 + math.pow(cutoff / (d + 1e-8), 2.0 * order))
          else 1.0 / (1.0 + math.pow(d / (cutoff + 1e-8), 2.0 * order))
        sr(y * w + x) *= hh; si(y * w + x) *= hh
        x += 1
      }
      y += 1
    }
    val ur = ifftshift(sr, h, w); val ui = ifftshift(si, h, w)
    val (br, bi) = dft2d(ur, ui, h, w, +1)
    val n = (h * w).toDouble
    val mag = Array.tabulate(h * w)(i => math.sqrt(br(i) * br(i) + bi(i) * bi(i)) / n)
    minMaxRescaleToU8(mag)
  }

  // --------------------------------------------------------------- morphology
  /** Erode with an all-ones k×k kernel, OpenCV default border (+∞ for erode
    * so borders don't spuriously erode). */
  def erode(img: Array[Int], h: Int, w: Int, k: Int): Array[Int] = {
    val r = k / 2
    val out = new Array[Int](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var mn = Int.MaxValue
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) {
            val yy = y + dy; val xx = x + dx
            if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
              val v = img(yy * w + xx); if (v < mn) mn = v
            }
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = mn
        x += 1
      }
      y += 1
    }
    out
  }

  /** Dilate with an all-ones k×k kernel (border −∞). */
  def dilate(img: Array[Int], h: Int, w: Int, k: Int): Array[Int] = {
    val r = k / 2
    val out = new Array[Int](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var mx = Int.MinValue
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) {
            val yy = y + dy; val xx = x + dx
            if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
              val v = img(yy * w + xx); if (v > mx) mx = v
            }
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = mx
        x += 1
      }
      y += 1
    }
    out
  }

  /** D14 — morphological open(3×3) then close(5×5), the region-growing
    * post-pass (`/root/reference/region_growing.py:95-96`). */
  def openClose(mask: Array[Int], h: Int, w: Int): Array[Int] = {
    val opened = dilate(erode(mask, h, w, 3), h, w, 3)
    erode(dilate(opened, h, w, 5), h, w, 5)
  }

  /** Bilinear resize (OpenCV INTER_LINEAR convention: pixel centers at
    * +0.5, border clamped) — the multimodal pipeline's resize step over
    * decoded frames. */
  def resizeBilinear(img: Array[Int], h: Int, w: Int, outH: Int, outW: Int): Array[Int] = {
    val out = new Array[Int](outH * outW)
    val sy = h.toDouble / outH
    val sx = w.toDouble / outW
    var oy = 0
    while (oy < outH) {
      val fy = (oy + 0.5) * sy - 0.5
      val y0 = math.max(math.min(math.floor(fy).toInt, h - 1), 0)
      val y1 = math.min(y0 + 1, h - 1)
      val wy = math.max(math.min(fy - y0, 1.0), 0.0)
      var ox = 0
      while (ox < outW) {
        val fx = (ox + 0.5) * sx - 0.5
        val x0 = math.max(math.min(math.floor(fx).toInt, w - 1), 0)
        val x1 = math.min(x0 + 1, w - 1)
        val wx = math.max(math.min(fx - x0, 1.0), 0.0)
        val v =
          (1 - wy) * ((1 - wx) * img(y0 * w + x0) + wx * img(y0 * w + x1)) +
          wy       * ((1 - wx) * img(y1 * w + x0) + wx * img(y1 * w + x1))
        out(oy * outW + ox) = math.min(math.max(math.round(v).toInt, 0), 255)
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** D1 dense variant — intensity windowing on a dense image
    * (`/root/reference/dataflow_pipeline.py:19-39`); returns (img_u8, usedWindow).
    */
  def applyWindowing(img: Array[Double], wc: Option[Double], ww: Option[Double]): Array[Int] = {
    (wc, ww) match {
      case (Some(c), Some(width)) if width > 0 =>
        val low = c - width / 2.0
        val high = c + width / 2.0
        img.map { v =>
          val cl = math.min(math.max(v, low), high)
          val u = (cl - low) / math.max(high - low, 1e-6) * 255.0
          math.min(math.max(u.toInt, 0), 255)
        }
      case _ =>
        val mn = img.min
        val denom = math.max(img.max - mn, 1e-6)
        img.map(v => math.min(math.max(((v - mn) / denom * 255.0).toInt, 0), 255))
    }
  }
}
