package graft.kernels

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-facing wrappers for the dense-image kernels: images travel as a
  * flat `array<int>` column plus (h, w) columns — flat beats nested
  * array<array<int>> for Tungsten (one ArrayData, no per-row nesting).
  * Each UDF is per-image; Spark parallelizes across images, mirroring the
  * reference's Beam ParDo shape (`/root/reference/dataflow_pipeline.py:132`).
  */
object ImageOps {

  /** Deterministic smooth synthetic image as a dense column: a quantized
    * two-gradient field with a bright blob — enough structure for region
    * growing / blur / SSIM to be meaningful. Built with `transform(sequence)`
    * so generation is distributed and codegen'd (no driver-side arrays).
    */
  def syntheticDense(spark: SparkSession, nImages: Int, h: Int, w: Int): DataFrame = {
    spark.range(nImages.toLong)
      .select(col("id").as("image_id"),
        lit(h).as("h"), lit(w).as("w"),
        transform(sequence(lit(0), lit(h * w - 1)), i => {
          val y = i / w
          val x = i % w
          val cy = lit(h / 2) + col("id") % 5
          val cx = lit(w / 2) - col("id") % 7
          val d2 = (y - cy) * (y - cy) + (x - cx) * (x - cx)
          // bright gaussian-ish blob on a mild gradient, quantized
          (least(lit(200.0) * exp(-d2.cast("double") / lit(2.0 * (h / 6.0) * (h / 6.0))), lit(200.0))
            + (y * 40 / h + x * 15 / w).cast("double")).cast("int")
        }).as("img"))
  }

  private def toArr(s: Seq[Int]): Array[Int] = s.toArray

  val gaussianBlurU8 = udf { (img: Seq[Int], h: Int, w: Int, sigma: Double) =>
    ImageKernels.gaussianBlur(toArr(img).map(_.toDouble), h, w, sigma)
      .map(v => math.min(math.max(math.round(v).toInt, 0), 255)).toSeq
  }

  val claheU8 = udf { (img: Seq[Int], h: Int, w: Int) =>
    ImageKernels.clahe(toArr(img), h, w).toSeq
  }

  val sobelU8 = udf { (img: Seq[Int], h: Int, w: Int) =>
    ImageKernels.maxNormalizeToU8(
      ImageKernels.sobelMagnitude(toArr(img).map(_.toDouble), h, w)).toSeq
  }

  val butterworthU8 = udf { (img: Seq[Int], h: Int, w: Int, cutoff: Double, order: Int, highPass: Boolean) =>
    ImageKernels.butterworth(toArr(img).map(_.toDouble), h, w, cutoff, order, highPass).toSeq
  }

  val openCloseMask = udf { (mask: Seq[Int], h: Int, w: Int) =>
    ImageKernels.openClose(toArr(mask), h, w).toSeq
  }

  val regionGrow = udf { (img: Seq[Int], h: Int, w: Int, sy: Int, sx: Int,
      threshold: Double, connectivity: Int, maxIter: Int) =>
    RegionGrowing.exact(toArr(img), h, w, sy, sx, threshold, connectivity, maxIter).toSeq
  }

  /** [[regionGrow]] without the morphological post-pass and without an
    * iteration cap — the converged connected region, comparable against
    * reachability oracles and the frontier-join variant. */
  val regionGrowConverged = udf { (img: Seq[Int], h: Int, w: Int, sy: Int, sx: Int,
      threshold: Double, connectivity: Int) =>
    RegionGrowing.exact(toArr(img), h, w, sy, sx, threshold, connectivity,
      Int.MaxValue, postProcess = false).toSeq
  }

  val regionGrowAdaptive = udf { (img: Seq[Int], h: Int, w: Int, sy: Int, sx: Int) =>
    RegionGrowing.adaptive(toArr(img), h, w, sy, sx).toSeq
  }

  val perimeterUdf = udf { (mask: Seq[Int], h: Int, w: Int) =>
    Contours.perimeter(toArr(mask), h, w)
  }

  /** D10 kernel half (`/root/reference/utils.py:39-84`): additive
    * saturating overlay on in-mask pixels, then external contour pixels
    * drawn at full intensity — grayscale single-channel form of the
    * reference's red-overlay + green-contour rendering. */
  val overlayWithContours = udf { (img: Seq[Int], mask: Seq[Int], h: Int, w: Int,
      alpha: Double) =>
    val m = toArr(mask)
    val out = img.toArray
    var i = 0
    while (i < out.length) {
      if (m(i) > 0) out(i) = math.min(math.round(out(i) + alpha * 255.0).toInt, 255)
      i += 1
    }
    // un-simplified trace = every border pixel (the simplified polygon only
    // keeps corners; drawing needs the full 8-connected chain)
    Contours.externalContours(m, h, w, simplify = false).foreach(_.foreach { case (y, x) =>
      out(y * w + x) = 255
    })
    out.toSeq
  }

  val solidityUdf = udf { (mask: Seq[Int], h: Int, w: Int) =>
    Contours.solidity(toArr(mask), h, w)
  }

  /** D8 gate: encode to a real PNG byte stream and decode it back. The
    * caller compares round-tripped pixels against the generating formula,
    * proving encode∘decode = id. Failure yields an empty array (dropped
    * row → red CORRECTNESS gate). */
  val pngRoundTrip = udf { (img: Seq[Int], h: Int, w: Int) =>
    Png.encodeGray(toArr(img), h, w).flatMap(Png.decodeGray)
      .map(_._1.toSeq).getOrElse(Seq.empty[Int])
  }

  val ssimUdf = udf { (a: Seq[Int], b: Seq[Int], h: Int, w: Int) =>
    Ssim.ssim(toArr(a).map(_.toDouble), toArr(b).map(_.toDouble), h, w)
  }

  val bfScoreUdf = udf { (pred: Seq[Int], h: Int, w: Int) =>
    Ssim.bfScore(toArr(pred), None, h, w)
  }

  /** Wide→long: dense image column → `(image_id, y, x, v)` rows — the
    * engine's central Generator use (SURVEY.md §2.K). posexplode keeps the
    * index so y/x derive arithmetically.
    */
  def explodeToLong(dense: DataFrame): DataFrame =
    dense.select(col("image_id"), col("w"), posexplode(col("img")).as(Seq("pos", "v")))
      .select(col("image_id"),
        expr("pos div w").as("y"), (col("pos") % col("w")).as("x"), col("v"))
}
