package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Contours, ImageKernels, Ssim}

/** Pure-JVM kernel semantics: D1-dense/D2/D3/D11-D14, E12/E13/E15
  * (reference: `/root/reference/dataflow_pipeline.py`, `advanced_metrics.py`,
  * `evaluation.py:26-32`). */
class KernelsSpec extends AnyFunSuite {

  test("D1 dense windowing: tag path and min-max fallback") {
    val img = Array(50.0, 60.0, 100.0, 140.0, 200.0)
    val w = ImageKernels.applyWindowing(img, Some(100.0), Some(80.0))
    assert(w.toSeq == Seq(0, 0, 127, 255, 255))
    // no tags → min-max normalize: 50→0, 200→255
    val f = ImageKernels.applyWindowing(img, None, None)
    assert(f.head == 0 && f.last == 255)
    // ww <= 0 → fallback too (dataflow_pipeline.py:30 requires ww>0)
    assert(ImageKernels.applyWindowing(img, Some(100.0), Some(0.0)).toSeq == f.toSeq)
    // constant image: epsilon guard, all zeros, no NaN
    assert(ImageKernels.applyWindowing(Array(7.0, 7.0), None, None).toSeq == Seq(0, 0))
  }

  test("D3 Gaussian blur: preserves constant images, mass, and sigma<=0 is identity") {
    val flat = Array.fill(64)(42.0)
    assert(ImageKernels.gaussianBlur(flat, 8, 8, 1.5).forall(v => math.abs(v - 42.0) < 1e-9))
    val img = Array.tabulate(64)(_.toDouble)
    assert(ImageKernels.gaussianBlur(img, 8, 8, 0.0).toSeq == img.toSeq)
    // kernel normalized → blur of any image keeps values within [min,max]
    val b = ImageKernels.gaussianBlur(img, 8, 8, 0.5)
    assert(b.forall(v => v >= -1e-9 && v <= 63.0 + 1e-9))
  }

  test("D2 CLAHE: output in [0,255], constant image stays constant-ish") {
    val img = Array.tabulate(256)(i => (i % 16) * 16)
    val out = ImageKernels.clahe(img, 16, 16)
    assert(out.forall(v => v >= 0 && v <= 255))
    assert(out.length == 256)
  }

  test("D2 CLAHE: near-identity when every 16x16 tile holds each value exactly once") {
    // 128x128 with 8x8 tiles → tileArea=256; v = (y%16)*16 + (x%16) gives
    // every tile a perfectly uniform histogram → each LUT ≈ identity ramp
    // and bilinear blending of identical LUTs is a no-op
    val h = 128; val w = 128
    val img = Array.tabulate(h * w)(i => ((i / w) % 16) * 16 + (i % w) % 16)
    val out = ImageKernels.clahe(img, h, w)
    val maxDiff = out.zip(img).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1, s"max deviation $maxDiff from identity")
  }

  test("D2 CLAHE: expands contrast of a low-contrast image (bounded by clip limit)") {
    val h = 64; val w = 64
    // values squeezed into [100, 115]
    val img = Array.tabulate(h * w)(i => 100 + (i * 7) % 16)
    val out = ImageKernels.clahe(img, h, w)
    val inRange = img.max - img.min
    val outRange = out.max - out.min
    assert(outRange > inRange * 2, s"contrast $inRange -> $outRange")
  }

  test("D12 Sobel magnitude: zero on constant interior, positive on an edge") {
    val flat = Array.fill(49)(100.0)
    val s = ImageKernels.sobelMagnitude(flat, 7, 7)
    assert(s.forall(v => math.abs(v) < 1e-9))
    val edge = Array.tabulate(49)(i => if (i % 7 < 3) 0.0 else 255.0)
    val se = ImageKernels.sobelMagnitude(edge, 7, 7)
    assert(se(3 * 7 + 3) > 0) // column 3 sits on the step
  }

  test("D14 erode/dilate/open-close on a small mask") {
    val mask = Array.fill(49)(0)
    for { y <- 1 to 5; x <- 1 to 5 } mask(y * 7 + x) = 1 // 5x5 block
    val er = ImageKernels.erode(mask, 7, 7, 3)
    assert(er.sum == 9) // 3x3 core survives
    val di = ImageKernels.dilate(er, 7, 7, 3)
    assert(di.sum == 25) // opening restores the 5x5 block exactly
    // single pixel is wiped out by open(3x3)
    val dot = Array.fill(49)(0); dot(24) = 1
    assert(ImageKernels.openClose(dot, 7, 7).sum == 0)
  }

  test("D11 Butterworth high-pass: flattens a constant image to ~0 contrast") {
    val flat = Array.fill(64)(128.0)
    val out = ImageKernels.butterworth(flat, 8, 8, cutoff = 4, order = 2, highPass = true)
    assert(out.forall(v => v >= 0 && v <= 255))
  }

  test("E15 perimeter: contour arc length of a 3x3 block = 8, single pixel = 0") {
    val mask = Array.fill(25)(0)
    for { y <- 1 to 3; x <- 1 to 3 } mask(y * 5 + x) = 1
    assert(math.abs(Contours.perimeter(mask, 5, 5) - 8.0) < 1e-9)
    val dot = Array.fill(25)(0); dot(12) = 1
    assert(Contours.perimeter(dot, 5, 5) == 0.0)
    assert(Contours.perimeter(Array.fill(25)(0), 5, 5) == 0.0)
  }

  test("E15 contour shapes: 1x3 line perimeter = 4; two components = two contours") {
    val line = Array.fill(25)(0)
    for (x <- 1 to 3) line(2 * 5 + x) = 1
    assert(math.abs(Contours.perimeter(line, 5, 5) - 4.0) < 1e-9)
    val two = Array.fill(25)(0)
    two(0) = 1; two(24) = 1 // opposite corners, 8-disconnected
    assert(Contours.externalContours(two, 5, 5).length == 2)
  }

  test("E14 solidity: concave L-shape strictly below 1") {
    val mask = Array.fill(25)(0)
    Seq((0, 0), (1, 0), (2, 0), (2, 1), (2, 2)).foreach { case (y, x) => mask(y * 5 + x) = 1 }
    val s = Contours.solidity(mask, 5, 5)
    assert(s > 0.0 && s < 1.0, s"solidity $s")
  }

  test("D11 Butterworth: low-pass preserves smooth structure better than high-pass") {
    val h = 16; val w = 16
    val img = Array.tabulate(h * w)(i => ((i / w) * 8 + (i % w) * 4).toDouble)
    def corr(a: Array[Int], b: Array[Double]): Double = {
      val ad = a.map(_.toDouble)
      val ma = ad.sum / ad.length; val mb = b.sum / b.length
      val cov = ad.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = ad.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val lp = ImageKernels.butterworth(img, h, w, cutoff = 6, order = 2, highPass = false)
    val hp = ImageKernels.butterworth(img, h, w, cutoff = 6, order = 2, highPass = true)
    assert(corr(lp, img) > 0.8, s"low-pass corr ${corr(lp, img)}")
    assert(corr(hp, img) < corr(lp, img))
  }

  test("E14 solidity: convex shape = 1") {
    val mask = Array.fill(49)(0)
    for { y <- 1 to 4; x <- 1 to 4 } mask(y * 7 + x) = 1
    assert(math.abs(Contours.solidity(mask, 7, 7) - 1.0) < 1e-9)
  }

  test("E12 SSIM: identical images = 1, different images < 1") {
    val a = Array.tabulate(64)(i => (i * 37 % 256).toDouble)
    assert(math.abs(Ssim.ssim(a, a, 8, 8) - 1.0) < 1e-9)
    val b = a.map(v => 255.0 - v)
    assert(Ssim.ssim(a, b, 8, 8) < 0.5)
  }

  test("E13 BF score no-GT fallback = sum(filtered_edges)/(size*255)") {
    val mask = Array.fill(64)(0)
    for { y <- 2 to 5; x <- 2 to 5 } mask(y * 8 + x) = 1
    val s = Ssim.bfScore(mask, None, 8, 8)
    assert(s >= 0.0 && s <= 1.0)
    // all-zero mask → no edges → 0
    assert(Ssim.bfScore(Array.fill(64)(0), None, 8, 8) == 0.0)
  }
}
