package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed stencil convolution over long-format pixels — the relational
  * form of the reference's neighborhood kernels (D3 Gaussian blur,
  * `/root/reference/dataflow_pipeline.py:45`; D12 Sobel,
  * `advanced_metrics.cpython-312.pyc` lines 48-51).
  *
  * Shape: each pixel explodes into one contribution row per kernel tap,
  * then a hash-aggregate sums contributions per target pixel — exactly one
  * shuffle, keyed by (image, y, x). For a k-tap kernel the shuffle carries
  * k× the pixel count; at 100 TB the better physical plan is tile
  * partitioning with halo exchange inside `mapPartitions`
  * ([[graft.kernels.ImageKernels]] is that kernel) — this operator is the
  * declarative/Catalyst path, and it stays entirely in WholeStageCodegen
  * (explode + HashAggregate, no UDFs).
  *
  * Border semantics: only targets whose full neighborhood lies in-image are
  * emitted (interior-only), the cleanest cross-engine-checkable contract.
  */
object Stencil {

  /** Generic convolve: out(g, y, x) = Σ taps w·v(y+dy, x+dx), interior only.
    * `taps` = (dy, dx, weight). */
  def convolve(pixels: DataFrame, taps: Seq[(Int, Int, Double)],
      h: Int, w: Int, group: String = "image_id"): DataFrame = {
    val contribs = array(taps.map { case (dy, dx, wt) =>
      struct(lit(dy).as("dy"), lit(dx).as("dx"), lit(wt).as("wt"))
    }: _*)
    val maxR = taps.map(t => math.max(math.abs(t._1), math.abs(t._2))).max
    pixels
      .select(col(group), col("y"), col("x"), col("v"), explode(contribs).as("t"))
      // contribution of source (y,x) to target (y - dy, x - dx)
      .select(col(group), (col("y") - col("t.dy")).as("ty"),
        (col("x") - col("t.dx")).as("tx"), (col("v") * col("t.wt")).as("c"))
      .filter(col("ty").between(maxR, h - 1 - maxR) && col("tx").between(maxR, w - 1 - maxR))
      .groupBy(col(group), col("ty").as("y"), col("tx").as("x"))
      .agg(sum(col("c")).as("out"))
  }

  /** 3x3 Gaussian taps for sigma, normalized to sum 1 (the σ=0.5 default of
    * the reference pipeline truncates to 3x3). */
  def gaussian3x3Taps(sigma: Double): Seq[(Int, Int, Double)] = {
    val raw = for { dy <- -1 to 1; dx <- -1 to 1 }
      yield (dy, dx, math.exp(-(dy * dy + dx * dx) / (2 * sigma * sigma)))
    val s = raw.map(_._3).sum
    raw.map { case (dy, dx, wt) => (dy, dx, wt / s) }
  }

  /** E12 — SSIM on long format, ONE stencil pass: the five windowed
    * moments (μa, μb, E[a²], E[b²], E[ab]) accumulate in a single
    * explode+aggregate, then per-pixel SSIM and the per-image mean follow
    * as plain column math — two shuffles total for any image count.
    *
    * Exactness: skimage crops the filtered map by win/2 before averaging,
    * and every window at a cropped-interior pixel lies fully in-image — so
    * interior-only windowed sums reproduce `skimage.structural_similarity`
    * (uniform filter, K1=0.01, K2=0.03, sample covariance) EXACTLY; the
    * kernel cross-check lives in StencilSsimSpec.
    *
    * `pairs` columns: (group, y, x, a, b), both images 0..dataRange.
    */
  def meanSsim(pairs: DataFrame, h: Int, w: Int, winSize: Int = 7,
      dataRange: Double = 255.0, group: String = "image_id"): DataFrame = {
    val r = winSize / 2
    val np = winSize.toDouble * winSize
    val covNorm = np / (np - 1)
    val c1 = math.pow(0.01 * dataRange, 2)
    val c2 = math.pow(0.03 * dataRange, 2)
    val taps = array((for { dy <- -r to r; dx <- -r to r }
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)
    val moments = pairs
      .select(col(group), col("y"), col("x"),
        col("a").cast("double").as("a"), col("b").cast("double").as("b"),
        explode(taps).as("t"))
      .select(col(group), (col("y") - col("t.dy")).as("ty"),
        (col("x") - col("t.dx")).as("tx"), col("a"), col("b"))
      .filter(col("ty").between(r, h - 1 - r) && col("tx").between(r, w - 1 - r))
      .groupBy(col(group), col("ty"), col("tx"))
      .agg(
        (sum(col("a")) / np).as("ux"), (sum(col("b")) / np).as("uy"),
        (sum(col("a") * col("a")) / np).as("uxx"),
        (sum(col("b") * col("b")) / np).as("uyy"),
        (sum(col("a") * col("b")) / np).as("uxy"))
    val vx = lit(covNorm) * (col("uxx") - col("ux") * col("ux"))
    val vy = lit(covNorm) * (col("uyy") - col("uy") * col("uy"))
    val vxy = lit(covNorm) * (col("uxy") - col("ux") * col("uy"))
    moments
      .withColumn("ssim",
        ((lit(2.0) * col("ux") * col("uy") + c1) * (lit(2.0) * vxy + c2)) /
          ((col("ux") * col("ux") + col("uy") * col("uy") + c1) * (vx + vy + c2)))
      .groupBy(col(group))
      .agg(avg(col("ssim")).as("mssim"))
  }

  /** D12 — Sobel gradient magnitude on long format: both direction kernels
    * in ONE explode+aggregate pass (two weighted sums per tap), interior
    * only. Integer kernel taps keep the sums exact across engines.
    */
  def sobelMagnitude(pixels: DataFrame, h: Int, w: Int,
      group: String = "image_id"): DataFrame = {
    val kx = Map((-1, -1) -> -1, (-1, 1) -> 1, (0, -1) -> -2, (0, 1) -> 2, (1, -1) -> -1, (1, 1) -> 1)
    val ky = Map((-1, -1) -> -1, (-1, 0) -> -2, (-1, 1) -> -1, (1, -1) -> 1, (1, 0) -> 2, (1, 1) -> 1)
    val taps = for { dy <- -1 to 1; dx <- -1 to 1 } yield
      struct(lit(dy).as("dy"), lit(dx).as("dx"),
        lit(kx.getOrElse((dy, dx), 0)).as("wx"), lit(ky.getOrElse((dy, dx), 0)).as("wy"))
    pixels
      .select(col(group), col("y"), col("x"), col("v"), explode(array(taps: _*)).as("t"))
      .select(col(group), (col("y") - col("t.dy")).as("ty"),
        (col("x") - col("t.dx")).as("tx"),
        (col("v") * col("t.wx")).as("cx"), (col("v") * col("t.wy")).as("cy"))
      .filter(col("ty").between(1, h - 2) && col("tx").between(1, w - 2))
      .groupBy(col(group), col("ty").as("y"), col("tx").as("x"))
      .agg(sum(col("cx")).as("gx"), sum(col("cy")).as("gy"))
      .withColumn("magnitude", sqrt(col("gx") * col("gx") + col("gy") * col("gy")))
  }
}
