package graft.kernels

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** D8 — PNG encode/decode (`cv2.imencode(".png", img)`,
  * `/root/reference/dataflow_pipeline.py:78-81`; decode `cv2.imdecode`,
  * `/root/reference/gcp_utils.py:34-35`). Real codec via the JDK's ImageIO
  * (lossless 8-bit grayscale PNG) — no native/external dependency.
  */
object Png {

  /** Encode a uint8 grayscale image to PNG bytes. Returns None on encode
    * failure — callers drop the record, matching the reference's
    * `if not ok: return` (C3, `dataflow_pipeline.py:79-80`). */
  def encodeGray(img: Array[Int], h: Int, w: Int): Option[Array[Byte]] = {
    try {
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = bi.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, img(y * w + x) & 0xff); x += 1 }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      if (!ImageIO.write(bi, "png", bos)) None else Some(bos.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Decode PNG (or any ImageIO-supported format) to a grayscale uint8
    * image `(pixels, h, w)`; RGB inputs are reduced with the reference's
    * luma weights (D4, `/root/reference/utils.py:100-103`). */
  def decodeGray(bytes: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    try {
      val bi = ImageIO.read(new ByteArrayInputStream(bytes))
      if (bi == null) return None
      val h = bi.getHeight; val w = bi.getWidth
      val out = new Array[Int](h * w)
      val gray = bi.getType == BufferedImage.TYPE_BYTE_GRAY
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) =
            if (gray) bi.getRaster.getSample(x, y, 0) & 0xff
            else {
              val rgb = bi.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt.min(255)
            }
          x += 1
        }
        y += 1
      }
      Some((out, h, w))
    } catch { case _: Exception => None }
  }
}
