package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** A2 — real DICOM decode (`pydicom.dcmread(f, force=True)` +
  * `ds.pixel_array`, `/root/reference/dataflow_pipeline.py:72-73`,
  * `preprocessor.py:34-37`), pure Scala, zero dependencies.
  *
  * Supported profile: Explicit VR Little Endian (transfer syntax
  * 1.2.840.10008.1.2.1), uncompressed MONOCHROME pixel data, 8- or 16-bit.
  * `force=True` parity: a missing 128-byte preamble / "DICM" magic is
  * tolerated — parsing falls back to offset 0 (the reference relies on
  * exactly this pydicom behaviour).
  *
  * Includes a writer for the same profile so fixtures are self-contained:
  * encode→decode round-trips are exact (DicomSpec), and the file-based
  * pipeline is checked against the in-memory one end-to-end.
  */
object Dicom {

  /** Parsed DICOM: pydicom-style tag names → string values (multi-valued
    * DS values joined with '\' as in the wire format), plus pixel data. */
  final case class DicomImage(
      tags: Map[String, String],
      rows: Int, cols: Int,
      pixels: Array[Double])

  // (group, element) → pydicom keyword, the tags the reference reads
  private val TagNames: Map[(Int, Int), String] = Map(
    (0x0008, 0x0018) -> "SOPInstanceUID",
    (0x0008, 0x0060) -> "Modality",
    (0x0010, 0x0020) -> "PatientID",
    (0x0020, 0x000D) -> "StudyInstanceUID",
    (0x0020, 0x000E) -> "SeriesInstanceUID",
    (0x0028, 0x0010) -> "Rows",
    (0x0028, 0x0011) -> "Columns",
    (0x0028, 0x0100) -> "BitsAllocated",
    (0x0028, 0x1050) -> "WindowCenter",
    (0x0028, 0x1051) -> "WindowWidth")

  private val LongLengthVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")

  /** Decode bytes → image; None if unparseable (drop-on-failure C3). */
  def decode(bytes: Array[Byte]): Option[DicomImage] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // preamble check with force=True fallback
      if (bytes.length > 132 &&
          bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M')
        buf.position(132)
      else
        buf.position(0)

      var tags = Map.empty[String, String]
      var pixelBytes: Array[Byte] = null
      var bitsAllocated = 16

      while (buf.remaining() >= 8) {
        val group = buf.getShort() & 0xffff
        val elem = buf.getShort() & 0xffff
        val vr = new String(Array(buf.get(), buf.get()).map(_.toChar))
        val length =
          if (LongLengthVRs.contains(vr)) { buf.getShort(); buf.getInt() }
          else buf.getShort() & 0xffff
        if (length < 0 || length > buf.remaining()) return None
        val value = new Array[Byte](length)
        buf.get(value)

        if (group == 0x7FE0 && elem == 0x0010) pixelBytes = value
        else TagNames.get((group, elem)).foreach { name =>
          val s = vr match {
            case "US" =>
              ByteBuffer.wrap(value).order(ByteOrder.LITTLE_ENDIAN).getShort().toInt.toString
            case _ => new String(value, "ISO-8859-1").trim
          }
          if (name == "BitsAllocated") bitsAllocated = s.toInt
          tags += (name -> s)
        }
      }

      val rows = tags.getOrElse("Rows", "0").toInt
      val cols = tags.getOrElse("Columns", "0").toInt
      if (rows <= 0 || cols <= 0 || pixelBytes == null) return None
      val px = new Array[Double](rows * cols)
      val pb = ByteBuffer.wrap(pixelBytes).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      if (bitsAllocated == 8) {
        if (pixelBytes.length < rows * cols) return None
        while (i < px.length) { px(i) = (pb.get() & 0xff).toDouble; i += 1 }
      } else {
        if (pixelBytes.length < rows * cols * 2) return None
        while (i < px.length) { px(i) = (pb.getShort() & 0xffff).toDouble; i += 1 }
      }
      Some(DicomImage(tags - "Rows" - "Columns" - "BitsAllocated", rows, cols, px))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------- writer
  private def evenPad(s: String, pad: Byte = ' '): Array[Byte] = {
    val b = s.getBytes("ISO-8859-1")
    if (b.length % 2 == 0) b else b :+ pad
  }

  private def element(bb: java.io.ByteArrayOutputStream,
      group: Int, elem: Int, vr: String, value: Array[Byte]): Unit = {
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.putShort(group.toShort).putShort(elem.toShort)
    head.put(vr.charAt(0).toByte).put(vr.charAt(1).toByte)
    if (LongLengthVRs.contains(vr)) {
      head.putShort(0)
      bb.write(head.array())
      val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(value.length)
      bb.write(len.array())
    } else {
      head.putShort(value.length.toShort)
      bb.write(head.array())
    }
    bb.write(value)
  }

  /** Encode an explicit-VR-LE file: preamble + DICM + meta + dataset.
    * `tags` uses pydicom keywords; WindowCenter/Width may be multi-valued
    * with '\'. 16-bit pixels. */
  def encode(tags: Map[String, String], rows: Int, cols: Int,
      pixels: Array[Double], withPreamble: Boolean = true): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    if (withPreamble) {
      bb.write(new Array[Byte](128))
      bb.write("DICM".getBytes("ISO-8859-1"))
      // minimal file meta: transfer syntax UID (UI, NUL-padded)
      element(bb, 0x0002, 0x0010, "UI", evenPad("1.2.840.10008.1.2.1", 0))
    }
    def strTag(g: Int, e: Int, vr: String, name: String): Unit =
      tags.get(name).foreach(v => element(bb, g, e, vr, evenPad(v)))
    strTag(0x0008, 0x0018, "UI", "SOPInstanceUID")
    strTag(0x0008, 0x0060, "CS", "Modality")
    strTag(0x0010, 0x0020, "LO", "PatientID")
    strTag(0x0020, 0x000D, "UI", "StudyInstanceUID")
    strTag(0x0020, 0x000E, "UI", "SeriesInstanceUID")
    def usTag(g: Int, e: Int, v: Int): Unit =
      element(bb, g, e, "US",
        ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())
    usTag(0x0028, 0x0010, rows)
    usTag(0x0028, 0x0011, cols)
    usTag(0x0028, 0x0100, 16)
    strTag(0x0028, 0x1050, "DS", "WindowCenter")
    strTag(0x0028, 0x1051, "DS", "WindowWidth")
    val pb = ByteBuffer.allocate(pixels.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    pixels.foreach(v => pb.putShort(math.max(0, math.min(65535, math.round(v))).toShort))
    element(bb, 0x7FE0, 0x0010, "OW", pb.array())
    bb.toByteArray
  }
}
