package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation buffer for the one-pass Gram/covariance matrix:
  * vector count, per-dimension sums, and the upper-triangular product sums
  * in row-major order (`prods(t(i,j))` with `t` the triangular index).
  * Dimensionality is discovered from the first vector reduced, so the
  * aggregator needs no configuration and merge order cannot matter.
  */
case class GramBuf(var n: Long, var sums: Array[Double], var prods: Array[Double])

/** One (i, j) cell of the covariance/correlation matrix (1-based dims,
  * i <= j). `corr` is None when either dimension has zero variance (the
  * correlation is undefined there, matching SQL's NULL). */
case class GramCell(i: Int, j: Int, n_vecs: Long, cov: Double, corr: Option[Double])

/** Wrapper so the result rides a plain product encoder. */
case class GramCells(cells: Seq[GramCell])

/** SINGLE-PASS COVARIANCE / CORRELATION MATRIX — the full-width
  * alternative to the pair-join form of `emb_covariance` (which explodes
  * d² rows PER VECTOR before the aggregate: correct for d=8 slices,
  * quadratic damage at embedding widths). Here each partition folds its
  * vectors into one `(n, Σxᵢ, Σxᵢxⱼ)` buffer of d + d(d+1)/2 + 1 doubles
  * — ~17 KB at d=64 — and ONLY those buffers cross the exchange (map-side
  * partial combine, one buffer per partition, regardless of row count).
  * At 100 TB the shuffle is O(partitions · d²) bytes, not O(rows · d²).
  *
  * Population covariance in the textbook two-pass-equivalent form
  * cov = Σxy/n − (Σx/n)(Σy/n), evaluated in EXACTLY this operation order
  * so an independent SQL engine computing the same expression over the
  * same doubles reproduces the value bit-for-bit (both engines' division
  * and multiplication are IEEE-correctly-rounded; only Σ-order varies,
  * absorbed by the caller's 1e-9 rounding).
  */
class GramAggregator extends Aggregator[Array[Double], GramBuf, GramCells] {

  override def zero: GramBuf = GramBuf(0L, Array.empty, Array.empty)

  override def reduce(b: GramBuf, v: Array[Double]): GramBuf = {
    if (v == null) return b
    val d = v.length
    if (b.n == 0L && b.sums.isEmpty) {
      b.sums = new Array[Double](d)
      b.prods = new Array[Double](d * (d + 1) / 2)
    }
    require(b.sums.length == d,
      s"ragged embedding widths: ${b.sums.length} vs $d")
    var i = 0
    var t = 0
    while (i < d) {
      b.sums(i) += v(i)
      var j = i
      while (j < d) {
        b.prods(t) += v(i) * v(j)
        j += 1
        t += 1
      }
      i += 1
    }
    b.n += 1L
    b
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    require(a.sums.length == b.sums.length,
      s"ragged embedding widths: ${a.sums.length} vs ${b.sums.length}")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    var t = 0
    while (t < a.prods.length) { a.prods(t) += b.prods(t); t += 1 }
    a.n += b.n
    a
  }

  override def finish(b: GramBuf): GramCells = {
    val d = b.sums.length
    if (b.n == 0L || d == 0) return GramCells(Seq.empty)
    val n = b.n.toDouble
    // triangular index of (i, j), 0-based, i <= j
    def tri(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    def cov(i: Int, j: Int): Double =
      b.prods(tri(i, j)) / n - (b.sums(i) / n) * (b.sums(j) / n)
    val cells = for (i <- 0 until d; j <- i until d) yield {
      val c = cov(i, j)
      val denom = math.sqrt(cov(i, i) * cov(j, j))
      val corr = if (denom == 0.0 || denom.isNaN) None else Some(c / denom)
      GramCell(i + 1, j + 1, b.n, c, corr)
    }
    GramCells(cells)
  }

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramCells] = Encoders.product[GramCells]
}
