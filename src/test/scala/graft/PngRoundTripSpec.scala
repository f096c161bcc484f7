package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Png
import graft.operators.SlicePipeline
import graft.sources.BinaryFiles

/** D8/B1/A1/A4/A5 — the full write-then-scan loop: pipeline writes one PNG
  * per record (executor-side sink), the binaryFile source reads them back,
  * a decode step recovers the exact pixels. */
class PngRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PNG encode/decode round-trips uint8 pixels exactly (lossless)") {
    val img = Array.tabulate(64 * 48)(i => (i * 37) % 256)
    val bytes = Png.encodeGray(img, 48, 64).get
    val (decoded, h, w) = Png.decodeGray(bytes).get
    assert(h == 48 && w == 64)
    assert(decoded.sameElements(img))
  }

  test("B1 sink writes one PNG per record; A1/A5 binaryFile scan + suffix listing read them back") {
    val dir = java.nio.file.Files.createTempDirectory("png_sink").toString
    SlicePipeline.writePngs(spark, 20, dir)
    // A5 listing: suffix filter + limit, path-sorted
    val listed = BinaryFiles.listing(spark, dir, ".png", 50).collect()
    assert(listed.length == 20)
    assert(listed.map(_.getString(0)).toSeq == listed.map(_.getString(0)).toSeq.sorted)
    // A1/A4: full binary scan + decode recovers the enhanced pixels exactly
    val decoded = BinaryFiles.binaryFiles(spark, dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val (px, h, w) = Png.decodeGray(bytes).get
        val n = px.length.toDouble
        val mean = px.map(_.toDouble).sum / n
        (path.split('/').last, h, w, mean)
      }.collect().map { case (f, h, w, m) => f -> ((h, w, m)) }.toMap
    val expected = (0L until 20L).map { id =>
      val img = SlicePipeline.stubDecode(id)
      val px = SlicePipeline.enhancedPixels(img)
      (f"img_$id%06d.png", px.map(_.toDouble).sum / px.length)
    }
    expected.foreach { case (name, mean) =>
      val (h, w, gotMean) = decoded(name)
      assert(h == 32 && w == 32)
      assert(math.abs(gotMean - mean) < 1e-9, s"$name mean mismatch")
    }
  }

  test("A4 common-format decode: JPEG and BMP bytes decode through the same seam") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for { y <- 0 until 16; x <- 0 until 16 } img.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8)
    for (fmt <- Seq("jpg", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      val decoded = Png.decodeGray(bos.toByteArray)
      assert(decoded.isDefined, s"decode $fmt failed")
      val (px, h, w) = decoded.get
      assert(h == 16 && w == 16 && px.forall(v => v >= 0 && v <= 255), fmt)
    }
  }

  test("multimodal resize: PNG payloads decode → bilinear resize → re-encode, bad payloads drop") {
    import graft.kernels.ImageKernels
    // constant image resizes to the same constant; gradient stays monotone
    val flat = Array.fill(32 * 32)(77)
    assert(ImageKernels.resizeBilinear(flat, 32, 32, 16, 16).forall(_ == 77))
    val grad = Array.tabulate(32 * 32)(i => (i % 32) * 8)
    val small = ImageKernels.resizeBilinear(grad, 32, 32, 16, 16)
    val row = (0 until 16).map(x => small(8 * 16 + x))
    assert(row == row.sorted, s"monotone row expected: $row")

    val dir = java.nio.file.Files.createTempDirectory("png_resize").toString
    SlicePipeline.writePngs(spark, 6, dir)
    val media = BinaryFiles.binaryFiles(spark, dir)
      .select(monotonically_increasing_id().as("media_id"), col("content").as("payload"))
      .union(Seq((999L, "not a png".getBytes)).toDF("media_id", "payload")) // must drop
    val resized = graft.functions.Multimodal.resizeImages(media, 16, 16).collect()
    assert(resized.length == 6) // bad payload dropped
    resized.foreach { r =>
      val (px, h, w) = Png.decodeGray(r.getAs[Array[Byte]]("payload")).get
      assert(h == 16 && w == 16 && px.forall(v => v >= 0 && v <= 255))
    }
  }

  test("C3 drop-on-failure: encode of a degenerate image returns None and drops") {
    // zero-size image cannot be encoded — BufferedImage construction fails
    assert(Png.encodeGray(Array.emptyIntArray, 0, 0).isEmpty)
  }
}
