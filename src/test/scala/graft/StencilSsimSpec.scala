package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Ssim
import graft.operators.{Relational, Stencil}

/** E12 distributed SSIM ≡ the skimage-faithful kernel: interior-only
  * windowed sums reproduce the pad-cropped map exactly. */
class StencilSsimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("relational meanSsim equals the kernel on identical inputs") {
    val h = 24; val w = 24
    val a = Array.tabulate(h * w) { i => ((i / w) * 4 + (i % w) * 2) % 256.0 }
    val b = a.zipWithIndex.map { case (v, i) =>
      math.min(255.0, v * 0.9 + ((i / w) * 3 + i % w) % 29) }
    val kernel = Ssim.ssim(a, b, h, w)

    import spark.implicits._
    val pairs = (for { y <- 0 until h; x <- 0 until w }
      yield (1L, y, x, a(y * w + x), b(y * w + x))).toDF("image_id", "y", "x", "a", "b")
    val rel = Stencil.meanSsim(pairs, h, w).head().getAs[Double]("mssim")
    assert(math.abs(rel - kernel) < 1e-9, s"relational=$rel kernel=$kernel")
  }

  test("meanSsim of an image with itself is 1") {
    import spark.implicits._
    val pairs = Relational.gradientImage(spark, 2, 16, 16)
      .withColumn("a", col("v")).withColumn("b", col("v"))
    val out = Stencil.meanSsim(pairs, 16, 16).collect()
    assert(out.length == 2)
    out.foreach(r => assert(math.abs(r.getAs[Double]("mssim") - 1.0) < 1e-9))
  }
}
