package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** One decoded image from the unified loader, normalized to u8 like the
  * reference's `load_medical_image` return value. */
final case class MedicalImage(
    path: String, file_name: String, format: String,
    h: Int, w: Int, pixels: Array[Int])

/** Unified multi-format loader — `load_medical_image`
  * (`/root/reference/preprocessor.py:10-81`): ONE entry point routing a
  * file by extension to the format decoder, returning a common record.
  *
  *  - `.dcm` → [[Dicom.decode]] (explicit-VR-LE parser), then min-max
  *    normalize to u8 (`preprocessor.py:39-43` — non-uint8 pixel arrays are
  *    scaled `(v-min)/(max-min)*255` and truncated);
  *  - `.nii` → [[Nifti.decode]] + middle slice (`preprocessor.py:52-58`),
  *    then the same min-max normalize (`preprocessor.py:61-64`);
  *  - `.png` → [[graft.kernels.Png.decodeGray]], already u8, no normalize
  *    (`preprocessor.py:68-70`; divergence: the reference converts regular
  *    images to RGB — our engine is grayscale-native throughout, consistent
  *    with every other D-family operator);
  *  - anything else, or a corrupt payload, drops silently (C3 shape — the
  *    reference raises to the UI; in a batch pipeline the drop-on-failure
  *    semantics of `dataflow_pipeline.py:79-80` apply).
  *
  * The scan is a distributed `binaryFile` read; decode is a narrow
  * per-partition pass — at 100 TB this runs at scan speed with no shuffle.
  */
object MedicalImages {

  /** Min-max normalize to u8 (`preprocessor.py:41-43`): floor-scaled with
    * the engine's 1e-6 zero-range guard (the reference divides unguarded —
    * identical whenever max > min, and NaN-free when not). */
  private def minMaxU8(px: Array[Double]): Array[Int] = {
    var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < px.length) { val v = px(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    val range = math.max(mx - mn, 1e-6)
    px.map(v => math.min(math.max(math.floor((v - mn) / range * 255.0).toInt, 0), 255))
  }

  /** Extension-dispatched decode of one file. */
  def decodeAny(path: String, bytes: Array[Byte]): Option[MedicalImage] = {
    val name = path.split('/').last
    val ext = if (name.contains('.')) name.toLowerCase.substring(name.lastIndexOf('.') + 1) else ""
    ext match {
      case "dcm" => Dicom.decode(bytes).map(d =>
        MedicalImage(path, name, "dicom", d.rows, d.cols, minMaxU8(d.pixels)))
      case "nii" => Nifti.decode(bytes).map { v =>
        val (px, h, w) = Nifti.middleSlice(v)
        MedicalImage(path, name, "nifti", h, w, minMaxU8(px))
      }
      case "png" => graft.kernels.Png.decodeGray(bytes).map { case (px, h, w) =>
        MedicalImage(path, name, "png", h, w, px)
      }
      case _ => None
    }
  }

  /** Distributed load of a mixed-format directory into the common record. */
  def load(spark: SparkSession, dir: String): Dataset[MedicalImage] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (p, b) => decodeAny(p, b) })
  }
}
