package graft.kernels

import scala.collection.mutable

/** External-contour tracing + arc length + convex hull — the reference's
  * perimeter/solidity kernels (`cv2.findContours(RETR_EXTERNAL,
  * CHAIN_APPROX_SIMPLE)` + `arcLength`, `/root/reference/evaluation.py:26-32`,
  * `utils.py:177-185`; solidity via `skimage regionprops`,
  * `evaluation.py:52-53`).
  *
  * Moore-neighbour border following per 8-connected component (equivalent to
  * OpenCV's external borders for RETR_EXTERNAL), with collinear-run collapse
  * (CHAIN_APPROX_SIMPLE). Sequential per image by nature — runs inside a UDF,
  * parallel across images.
  */
object Contours {

  /** Trace the external contour of each 8-connected component of `mask>0`.
    * Returns one polygon (list of (y,x) vertices, collinear runs collapsed)
    * per component, in raster order of the component's top-left pixel —
    * OpenCV's CHAIN_APPROX_SIMPLE shape for simple regions.
    */
  def externalContours(mask: Array[Int], h: Int, w: Int,
      simplify: Boolean = true): Seq[IndexedSeq[(Int, Int)]] = {
    val seen = new Array[Boolean](h * w)
    @inline def in(y: Int, x: Int) = y >= 0 && y < h && x >= 0 && x < w && mask(y * w + x) > 0
    // clockwise Moore neighbourhood starting at W
    val dirs = Array((0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1))
    val out = mutable.ArrayBuffer.empty[IndexedSeq[(Int, Int)]]

    // mark all pixels of a component reachable from (sy,sx) so it isn't retraced
    def flood(sy: Int, sx: Int): Unit = {
      val stack = mutable.Stack((sy, sx))
      seen(sy * w + sx) = true
      while (stack.nonEmpty) {
        val (y, x) = stack.pop()
        var d = 0
        while (d < 8) {
          val ny = y + dirs(d)._1; val nx = x + dirs(d)._2
          if (in(ny, nx) && !seen(ny * w + nx)) { seen(ny * w + nx) = true; stack.push((ny, nx)) }
          d += 1
        }
      }
    }

    def trace(sy: Int, sx: Int): IndexedSeq[(Int, Int)] = {
      val pts = mutable.ArrayBuffer((sy, sx))
      // previous position starts W of the start pixel (raster scan guarantees
      // everything left/above is background)
      var cur = (sy, sx)
      var backtrack = 0 // index into dirs of the neighbour we came FROM (W)
      var done = false
      var guard = 0
      val maxSteps = 4 * h * w + 8
      while (!done && guard < maxSteps) {
        guard += 1
        var d = (backtrack + 1) % 8
        var found = -1
        var tries = 0
        while (tries < 8 && found < 0) {
          val ny = cur._1 + dirs(d)._1; val nx = cur._2 + dirs(d)._2
          if (in(ny, nx)) found = d
          else { d = (d + 1) % 8; tries += 1 }
        }
        if (found < 0) done = true // isolated pixel
        else {
          val nd = found
          val next = (cur._1 + dirs(nd)._1, cur._2 + dirs(nd)._2)
          if (next == pts.head && cur == pts.last && pts.length > 1) done = true
          else {
            pts += next
            cur = next
            backtrack = (nd + 4 + 1) % 8 // direction pointing back, advanced one
            if (pts.length > 2 && next == pts.head) done = true
          }
        }
      }
      // drop closing duplicate of the start point
      val poly = if (pts.length > 1 && pts.last == pts.head) pts.dropRight(1) else pts
      if (simplify) simplifyCollinear(poly.toIndexedSeq) else poly.toIndexedSeq
    }

    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (in(y, x) && !seen(y * w + x)) {
          out += trace(y, x)
          flood(y, x)
        }
        x += 1
      }
      y += 1
    }
    out.toSeq
  }

  /** CHAIN_APPROX_SIMPLE: collapse runs of collinear points. */
  def simplifyCollinear(pts: IndexedSeq[(Int, Int)]): IndexedSeq[(Int, Int)] = {
    if (pts.length <= 2) return pts
    val n = pts.length
    val keep = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < n) {
      val prev = pts((i - 1 + n) % n)
      val cur = pts(i)
      val nxt = pts((i + 1) % n)
      val collinear = (cur._1 - prev._1) == (nxt._1 - cur._1) && (cur._2 - prev._2) == (nxt._2 - cur._2)
      if (!collinear) keep += cur
      i += 1
    }
    if (keep.isEmpty) IndexedSeq(pts.head) else keep.toIndexedSeq
  }

  /** `cv2.arcLength(contour, closed=true)`: sum of Euclidean segment lengths
    * including the closing segment. Single point → 0. */
  def arcLength(poly: IndexedSeq[(Int, Int)]): Double = {
    if (poly.length < 2) return 0.0
    var s = 0.0
    var i = 0
    while (i < poly.length) {
      val a = poly(i); val b = poly((i + 1) % poly.length)
      val dy = (a._1 - b._1).toDouble; val dx = (a._2 - b._2).toDouble
      s += math.sqrt(dy * dy + dx * dx)
      i += 1
    }
    s
  }

  /** E15 — total perimeter: arcLength summed over all external contours
    * (`/root/reference/evaluation.py:29-32`). */
  def perimeter(mask: Array[Int], h: Int, w: Int): Double =
    externalContours(mask, h, w).map(arcLength).sum

  /** Convex hull of lattice points (Andrew monotone chain), returns hull
    * vertices CCW. */
  def convexHull(points: IndexedSeq[(Int, Int)]): IndexedSeq[(Int, Int)] = {
    val pts = points.distinct.sorted
    if (pts.length <= 2) return pts
    def cross(o: (Int, Int), a: (Int, Int), b: (Int, Int)): Long =
      (a._2 - o._2).toLong * (b._1 - o._1) - (a._1 - o._1).toLong * (b._2 - o._2)
    val lower = mutable.ArrayBuffer.empty[(Int, Int)]
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = mutable.ArrayBuffer.empty[(Int, Int)]
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toIndexedSeq
  }

  /** E14 solidity — mask area / filled-convex-hull area (lattice-point count
    * inside the hull of mask pixels), the regionprops measure
    * (`/root/reference/evaluation.py:52-53`). 0 for empty masks
    * (`:54-58`). */
  def solidity(mask: Array[Int], h: Int, w: Int): Double = {
    val pts = (for { y <- 0 until h; x <- 0 until w if mask(y * w + x) > 0 } yield (y, x)).toIndexedSeq
    if (pts.isEmpty) return 0.0
    val hull = convexHull(pts)
    if (hull.length <= 2) return 1.0
    // count lattice points inside/on hull row by row
    var inside = 0L
    val ys = hull.map(_._1)
    for (y <- ys.min to ys.max) {
      // intersect hull edges with scanline y → [xmin, xmax]
      var xmin = Double.MaxValue; var xmax = Double.MinValue
      var i = 0
      while (i < hull.length) {
        val a = hull(i); val b = hull((i + 1) % hull.length)
        if (a._1 == b._1) {
          if (a._1 == y) { xmin = math.min(xmin, math.min(a._2, b._2)); xmax = math.max(xmax, math.max(a._2, b._2)) }
        } else {
          val t = (y - a._1).toDouble / (b._1 - a._1)
          if (t >= 0 && t <= 1) {
            val xx = a._2 + t * (b._2 - a._2)
            xmin = math.min(xmin, xx); xmax = math.max(xmax, xx)
          }
        }
        i += 1
      }
      if (xmin <= xmax) inside += math.floor(xmax).toLong - math.ceil(xmin).toLong + 1
    }
    pts.length.toDouble / math.max(inside.toDouble, 1.0)
  }
}
