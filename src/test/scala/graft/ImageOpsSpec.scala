package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.ImageOps

/** Dense-image column path: synthetic generation, per-image kernel UDFs,
  * and the wide→long Generator (SURVEY §2.K). */
class ImageOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("syntheticDense: distributed generation, values in range, deterministic") {
    val df = ImageOps.syntheticDense(spark, 4, 16, 16)
    val rows = df.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val img = r.getAs[collection.Seq[Int]]("img")
      assert(img.length == 256)
      assert(img.forall(v => v >= 0 && v <= 255))
    }
    val again = ImageOps.syntheticDense(spark, 4, 16, 16).collect()
    assert(rows.map(_.getAs[collection.Seq[Int]]("img")).sameElements(again.map(_.getAs[collection.Seq[Int]]("img"))))
  }

  test("explodeToLong: every pixel exactly once, y/x arithmetic correct") {
    val long = ImageOps.explodeToLong(ImageOps.syntheticDense(spark, 3, 8, 8))
    assert(long.count() == 3 * 64)
    val r = long.filter(col("image_id") === 0).orderBy("y", "x").collect()
    assert(r.head.getAs[Number]("y").longValue == 0 && r.head.getAs[Number]("x").longValue == 0)
    assert(r.last.getAs[Number]("y").longValue == 7 && r.last.getAs[Number]("x").longValue == 7)
    // round-trip: long-format sum equals dense-array sum
    val denseSum = ImageOps.syntheticDense(spark, 3, 8, 8)
      .select(expr("aggregate(img, 0L, (a, v) -> a + v)").as("s"))
      .agg(sum("s")).head().getLong(0)
    assert(long.agg(sum("v")).head().getLong(0) == denseSum)
  }

  test("kernel UDF chain stays uint8-ranged; region growing mask contains the seed") {
    val out = ImageOps.syntheticDense(spark, 2, 16, 16)
      .withColumn("img", ImageOps.claheU8(col("img"), col("h"), col("w")))
      .withColumn("img", ImageOps.gaussianBlurU8(col("img"), col("h"), col("w"), lit(0.5)))
      .withColumn("mask", ImageOps.regionGrow(col("img"), col("h"), col("w"),
        lit(8), lit(8), lit(0.3), lit(8), lit(100000)))
      .collect()
    out.foreach { r =>
      assert(r.getAs[collection.Seq[Int]]("img").forall(v => v >= 0 && v <= 255))
      assert(r.getAs[collection.Seq[Int]]("mask").forall(v => v == 0 || v == 1))
    }
  }

  test("D10 overlay with contours: in-mask brightened, contour at 255, outside untouched") {
    val h = 8; val w = 8
    val img = Seq.fill(h * w)(100)
    val mask = Array.fill(h * w)(0)
    for { y <- 2 to 5; x <- 2 to 5 } mask(y * w + x) = 1
    val out = Seq((1L, img, mask.toSeq)).toDF("image_id", "img", "mask")
      .select(ImageOps.overlayWithContours(col("img"), col("mask"),
        lit(h), lit(w), lit(0.3)).as("o"))
      .as[Seq[Int]].head()
    assert(out(0) == 100)                 // outside mask unchanged
    assert(out(3 * w + 3) == 177)         // interior: 100 + 0.3*255 = 176.5 → 177
    assert(out(2 * w + 2) == 255)         // contour corner drawn at 255
    assert(out(2 * w + 3) == 255)         // contour EDGE pixel drawn too (full chain)
  }

  test("ssimUdf: identical dense images score 1") {
    val one = ImageOps.syntheticDense(spark, 1, 16, 16)
      .select(ImageOps.ssimUdf(col("img"), col("img"), col("h"), col("w")).as("s"))
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-9)
  }
}
