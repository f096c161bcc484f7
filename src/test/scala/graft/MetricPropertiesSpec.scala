package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{ImageKernels, RegionGrowing}

/** SURVEY.md §5.3 property-based invariants over the pure kernels (fast, no
  * Spark): metric identities, output ranges, region-growing containment.
  * Deterministic seeded generation (the offline cache has no
  * scalatest-scalacheck bridge; 30 seeded cases per property give the same
  * coverage reproducibly).
  */
class MetricPropertiesSpec extends AnyFunSuite {

  private val Cases = 30

  private def rng(seed: Int) = new scala.util.Random(seed)

  private def randImage(r: scala.util.Random): Array[Double] =
    Array.fill(64)(r.nextDouble() * 4095.0)

  private def randMask(r: scala.util.Random): Array[Int] =
    Array.fill(64)(if (r.nextBoolean()) 1 else 0)

  private def dice(p: Array[Int], g: Array[Int]): Double = {
    val inter = p.zip(g).count { case (a, b) => a == 1 && b == 1 }
    val total = p.sum + g.sum
    if (total == 0) 1.0 else 2.0 * inter / total
  }
  private def jaccard(p: Array[Int], g: Array[Int]): Double = {
    val inter = p.zip(g).count { case (a, b) => a == 1 && b == 1 }
    val union = p.zip(g).count { case (a, b) => a == 1 || b == 1 }
    if (union == 0) 1.0 else inter.toDouble / union
  }

  test("windowing output always in [0,255], both tag path and fallback") {
    val r = rng(1)
    for (_ <- 1 to Cases) {
      val img = randImage(r)
      val wc = r.nextDouble() * 4095.0
      val ww = r.nextDouble() * 2010.0 - 10.0 // includes ww <= 0 fallback cases
      val out = ImageKernels.applyWindowing(img, Some(wc), Some(ww))
      assert(out.forall(v => v >= 0 && v <= 255))
      val fb = ImageKernels.applyWindowing(img, None, None)
      assert(fb.forall(v => v >= 0 && v <= 255))
    }
  }

  test("metric identity J = D/(2−D) links Dice and Jaccard (evaluation.py:62-125)") {
    val r = rng(2)
    for (_ <- 1 to Cases) {
      val p = randMask(r); val g = randMask(r)
      val d = dice(p, g); val j = jaccard(p, g)
      assert(math.abs(j - d / (2 - d)) < 1e-12)
    }
    // degenerate both-empty case
    val z = Array.fill(64)(0)
    assert(dice(z, z) == 1.0 && jaccard(z, z) == 1.0)
  }

  test("Dice(m, m) = 1; Jaccard vs a fixed gt is monotone as pred grows toward gt") {
    val r = rng(3)
    for (_ <- 1 to Cases) {
      val gt = randMask(r)
      assert(dice(gt, gt) == 1.0)
      // start from a random subset of gt and add one gt pixel at a time
      val pred = gt.map(v => if (v == 1 && r.nextBoolean()) 1 else 0)
      var last = jaccard(pred, gt)
      val missing = (0 until 64).filter(i => gt(i) == 1 && pred(i) == 0)
      missing.foreach { i =>
        pred(i) = 1
        val cur = jaccard(pred, gt)
        assert(cur >= last - 1e-12)
        last = cur
      }
      assert(gt.sum == 0 || last == 1.0)
    }
  }

  test("region growing: mask contains seed; all mask pixels 8-connected to seed") {
    val r = rng(4)
    for (_ <- 1 to Cases) {
      val img = randImage(r).map(v => (v / 16).toInt.min(255))
      val sy = r.nextInt(8); val sx = r.nextInt(8)
      val m = RegionGrowing.exact(img, 8, 8, sy, sx, 0.2, 8, Int.MaxValue, postProcess = false)
      assert(m(sy * 8 + sx) == 1)
      val seen = Array.fill(64)(false)
      val q = scala.collection.mutable.Queue((sy, sx)); seen(sy * 8 + sx) = true
      while (q.nonEmpty) {
        val (y, x) = q.dequeue()
        for { dy <- -1 to 1; dx <- -1 to 1 if dy != 0 || dx != 0 } {
          val ny = y + dy; val nx = x + dx
          if (ny >= 0 && ny < 8 && nx >= 0 && nx < 8 &&
            m(ny * 8 + nx) == 1 && !seen(ny * 8 + nx)) {
            seen(ny * 8 + nx) = true; q.enqueue((ny, nx))
          }
        }
      }
      assert((0 until 64).forall(i => m(i) == 0 || seen(i)))
    }
  }

  test("gaussian blur output bounded by input range (normalized kernel)") {
    val r = rng(5)
    for (_ <- 1 to Cases) {
      val img = randImage(r)
      val sigma = 0.3 + r.nextDouble() * 2.7
      val out = ImageKernels.gaussianBlur(img, 8, 8, sigma)
      val (mn, mx) = (img.min, img.max)
      assert(out.forall(v => v >= mn - 1e-9 && v <= mx + 1e-9))
    }
  }

  test("dummy-GT-style perturbation keeps Dice high (advanced_metrics.pyc:77-95 shape)") {
    val r = rng(6)
    for (_ <- 1 to Cases) {
      // base blob mask
      val m = Array.fill(256)(0)
      val cy = 4 + r.nextInt(8); val cx = 4 + r.nextInt(8); val rad = 2 + r.nextInt(3)
      for { y <- 0 until 16; x <- 0 until 16
        if (y - cy) * (y - cy) + (x - cx) * (x - cx) <= rad * rad } m(y * 16 + x) = 1
      val perturbed = if (r.nextBoolean()) ImageKernels.dilate(m, 16, 16, 3)
        else ImageKernels.erode(m, 16, 16, 3)
      // dilate/erode with a small kernel keeps the masks overlapping
      // (erode of a radius-2 blob can shrink it hard; overlap stays non-trivial)
      if (m.sum > 0 && perturbed.sum > 0) assert(dice(m, perturbed) > 0.1)
    }
  }
}
