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
