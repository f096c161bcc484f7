package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BinaryFiles, Nifti}

/** A3 — NIfTI-1 volume codec and the middle-slice-select semantics. */
class NiftiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val (nz, ny, nx) = (6, 8, 10)
  private val vox = Array.tabulate(nz * ny * nx)(i => (i % 977).toDouble)

  test("encode→decode round-trips dims and float32 voxels exactly") {
    val v = Nifti.decode(Nifti.encode(nz, ny, nx, vox)).get
    assert((v.nz, v.ny, v.nx) == ((nz, ny, nx)))
    assert(v.voxels.sameElements(vox))
  }

  test("middle slice = image[shape[0]//2] (preprocessor.py:56-58)") {
    val v = Nifti.decode(Nifti.encode(nz, ny, nx, vox)).get
    val (slice, h, w) = Nifti.middleSlice(v)
    assert(h == ny && w == nx && slice.length == ny * nx)
    // z = 6/2 = 3 → voxels [3*80, 4*80)
    assert(slice.sameElements(vox.slice(3 * 80, 4 * 80)))
  }

  test("garbage, truncation, and bad magic decode to None") {
    assert(Nifti.decode(Array.fill[Byte](100)(7)).isEmpty)
    val good = Nifti.encode(nz, ny, nx, vox)
    assert(Nifti.decode(good.take(400)).isEmpty)
    val badMagic = good.clone(); badMagic(344) = 'x'
    assert(Nifti.decode(badMagic).isEmpty)
  }

  test("distributed volume scan: binaryFile → decode → middle-slice stats") {
    val dir = java.nio.file.Files.createTempDirectory("nifti_fixtures").toString
    (0 until 5).foreach { i =>
      val vol = Array.tabulate(nz * ny * nx)(j => ((i * 31 + j) % 255).toDouble)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"vol_$i%03d.nii"),
        Nifti.encode(nz, ny, nx, vol))
    }
    val stats = BinaryFiles.binaryFiles(spark, dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Nifti.decode(bytes).map { v =>
          val (slice, h, w) = Nifti.middleSlice(v)
          (path.split('/').last, h, w, slice.sum / slice.length)
        }
      }.collect().sortBy(_._1)
    assert(stats.length == 5)
    stats.foreach { case (_, h, w, mean) =>
      assert(h == ny && w == nx && mean >= 0 && mean <= 255)
    }
    // exact check for volume 0: mean of voxels [240, 320) of (j % 255)
    val expected = (3 * 80 until 4 * 80).map(j => (j % 255).toDouble).sum / 80
    assert(math.abs(stats.head._4 - expected) < 1e-9)
  }
}
