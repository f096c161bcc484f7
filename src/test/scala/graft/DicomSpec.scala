package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SlicePipeline
import graft.sources.Dicom

/** A2 — the pure-Scala DICOM codec and the file-based pipeline path. */
class DicomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixtureTags = Map[String, String](
    "SOPInstanceUID" -> "sop_1", "Modality" -> "MR", "PatientID" -> "patient_7",
    "StudyInstanceUID" -> "study_1", "SeriesInstanceUID" -> "series_2",
    "WindowCenter" -> "1040\\1050", "WindowWidth" -> "420\\430")
  private val px = Array.tabulate(32 * 32)(i => ((i * 131) % 4096).toDouble)

  test("encode→decode round-trips tags and 16-bit pixels exactly") {
    val d = Dicom.decode(Dicom.encode(fixtureTags, 32, 32, px)).get
    assert(d.rows == 32 && d.cols == 32)
    assert(d.pixels.sameElements(px))
    fixtureTags.foreach { case (k, v) => assert(d.tags(k) == v, k) }
  }

  test("force=True parity: missing preamble still parses") {
    val noPre = Dicom.encode(fixtureTags, 32, 32, px, withPreamble = false)
    val d = Dicom.decode(noPre).get
    assert(d.pixels.sameElements(px) && d.tags("PatientID") == "patient_7")
  }

  test("implicit VR LE: meta-declared dataset round-trips exactly") {
    val bytes = Dicom.encode(fixtureTags, 32, 32, px, implicitDataset = true)
    val d = Dicom.decode(bytes).get
    assert(d.rows == 32 && d.cols == 32)
    assert(d.pixels.sameElements(px))
    fixtureTags.foreach { case (k, v) => assert(d.tags(k) == v, k) }
    // implicit really is on the wire: the explicit encoding differs
    assert(!bytes.sameElements(Dicom.encode(fixtureTags, 32, 32, px)))
  }

  test("implicit VR LE without preamble: VR sniffing picks the right parse") {
    val bytes = Dicom.encode(fixtureTags, 32, 32, px,
      withPreamble = false, implicitDataset = true)
    val d = Dicom.decode(bytes).get
    assert(d.pixels.sameElements(px) && d.tags("PatientID") == "patient_7")
    assert(d.tags("WindowCenter") == "1040\\1050")
  }

  test("implicit and explicit encodings of one image decode identically") {
    val variants = Seq(
      Dicom.encode(fixtureTags, 32, 32, px),
      Dicom.encode(fixtureTags, 32, 32, px, withPreamble = false),
      Dicom.encode(fixtureTags, 32, 32, px, implicitDataset = true),
      Dicom.encode(fixtureTags, 32, 32, px, withPreamble = false, implicitDataset = true))
    val decoded = variants.map(Dicom.decode(_).get)
    decoded.foreach { d =>
      assert(d.tags == decoded.head.tags)
      assert(d.pixels.sameElements(decoded.head.pixels))
    }
  }

  test("garbage and truncated input decode to None (drop-on-failure C3)") {
    assert(Dicom.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = Dicom.encode(fixtureTags, 32, 32, px)
    assert(Dicom.decode(good.take(good.length / 2)).isEmpty)
    assert(Dicom.decode("not dicom at all, truly".getBytes).isEmpty)
  }

  test("file-based pipeline equals the in-memory pipeline field-for-field") {
    val dir = java.nio.file.Files.createTempDirectory("dicom_fixtures").toString
    SlicePipeline.writeDicomFixtures(spark, 30, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".dcm")) == 30)
    val fromFiles = SlicePipeline.runFromDicomFiles(spark, dir)
      .collect().map(r => r.file_name -> r).toMap
    val inMemory = SlicePipeline.run(spark, 30)
      .collect().map(r => r.file_name -> r).toMap
    assert(fromFiles.keySet == inMemory.keySet)
    inMemory.foreach { case (name, m) =>
      val f = fromFiles(name)
      // gcs_uri_raw differs by construction (real file URI vs stub path)
      assert(f.copy(gcs_uri_raw = m.gcs_uri_raw) == m, name)
    }
  }

  test("implicit-VR first element whose length spells a long-form VR no longer misparses") {
    import java.io.ByteArrayOutputStream
    import java.nio.{ByteBuffer, ByteOrder}
    val bb = new ByteArrayOutputStream()
    def imp(group: Int, elem: Int, value: Array[Byte]): Unit = {
      val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      head.putShort(group.toShort).putShort(elem.toShort).putInt(value.length)
      bb.write(head.array()); bb.write(value)
    }
    def us(v: Int) =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    // 16975 = 0x424F: bytes 4-5 of the first element spell "OB" (a
    // LONG-FORM VR), so the pydicom-style guess alone classifies the
    // headerless dataset explicit — and the explicit parse then reads the
    // first value bytes ("sop_" = 0x5F706F73) as a 1.6 GB length and
    // drops the file via C3. The length sanity check must notice the
    // explicit reading cannot fit while the implicit one does.
    val sop = ("sop_collision" + " " * 16975).substring(0, 16975)
      .getBytes("ISO-8859-1")
    imp(0x0008, 0x0018, sop)
    imp(0x0028, 0x0010, us(2)); imp(0x0028, 0x0011, us(2))
    imp(0x0028, 0x0100, us(16))
    imp(0x7FE0, 0x0010, Array.tabulate[Byte](8)(i => i.toByte))
    val d = Dicom.decode(bb.toByteArray)
    assert(d.isDefined, "length-sane sniff must classify this dataset implicit")
    assert(d.get.rows == 2 && d.get.cols == 2)
    assert(d.get.tags("SOPInstanceUID") == "sop_collision")
  }
}
