package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** A2 — real DICOM decode (`pydicom.dcmread(f, force=True)` +
  * `ds.pixel_array`, `/root/reference/dataflow_pipeline.py:72-73`,
  * `preprocessor.py:34-37`), pure Scala, zero dependencies.
  *
  * Supported profile: Explicit VR Little Endian (transfer syntax
  * 1.2.840.10008.1.2.1) AND Implicit VR Little Endian (1.2.840.10008.1.2
  * — the DEFAULT transfer syntax and the more common wire format, which
  * `pydicom.dcmread(force=True)` also accepts), uncompressed MONOCHROME
  * pixel data, 8- or 16-bit. The dataset encoding is taken from the file
  * meta's transfer-syntax UID when a meta group is present (the meta group
  * itself is always explicit VR per PS3.10); a raw dataset without
  * preamble/meta is sniffed pydicom-style — if the first element's bytes
  * 4-5 form a registered VR it is explicit, otherwise implicit.
  * `force=True` parity: a missing 128-byte preamble / "DICM" magic is
  * tolerated — parsing falls back to offset 0 (the reference relies on
  * exactly this pydicom behaviour).
  *
  * Includes a writer for both profiles so fixtures are self-contained:
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

  // projected tags whose implicit-VR value is binary US (everything else
  // we project decodes as a string); the VR dictionary entry for the 15
  // fields the reference reads — implicit VR carries no VR bytes, so the
  // reader supplies it
  private val UsTags: Set[(Int, Int)] =
    Set((0x0028, 0x0010), (0x0028, 0x0011), (0x0028, 0x0100))

  private val LongLengthVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")

  // registered VRs (PS3.5 §6.2) — used only to SNIFF explicit vs implicit
  // on headerless datasets, mirroring pydicom's guess
  private val KnownVRs = Set(
    "AE", "AS", "AT", "CS", "DA", "DS", "DT", "FL", "FD", "IS", "LO", "LT",
    "OB", "OD", "OF", "OL", "OW", "PN", "SH", "SL", "SQ", "SS", "ST", "TM",
    "UC", "UI", "UL", "UN", "UR", "US", "UT")

  private val ImplicitTsUid = "1.2.840.10008.1.2"

  /** Peek (no consume): do bytes 4-5 of the element at the buffer's
    * position spell a registered VR — mirroring pydicom's guess, PLUS a
    * length sanity check: an implicit-VR file whose first element's
    * 32-bit length happens to contain two VR ASCII bytes would otherwise
    * be misparsed as explicit and silently dropped via the C3
    * drop-on-failure path. When the explicit reading's implied length
    * does not fit the remaining bytes but the implicit reading's does,
    * the VR match was a coincidence — classify implicit. */
  private def sniffExplicit(buf: ByteBuffer): Boolean = {
    if (buf.remaining() < 8) return true
    val p = buf.position()
    val c1 = (buf.get(p + 4) & 0xff).toChar
    val c2 = (buf.get(p + 5) & 0xff).toChar
    val vr = new String(Array(c1, c2))
    if (!KnownVRs.contains(vr)) return false
    val longForm = LongLengthVRs.contains(vr)
    if (longForm && buf.remaining() < 12) return true
    val explicitLen =
      if (longForm) buf.getInt(p + 8) & 0xffffffffL
      else buf.getShort(p + 6) & 0xffffL
    val explicitFits = explicitLen <= buf.remaining() - (if (longForm) 12 else 8)
    val implicitFits = (buf.getInt(p + 4) & 0xffffffffL) <= buf.remaining() - 8
    // neither fits → keep the VR guess; the parse fails cleanly either way
    explicitFits || !implicitFits
  }

  /** Decode bytes → image; None if unparseable (drop-on-failure C3). */
  def decode(bytes: Array[Byte]): Option[DicomImage] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // preamble check with force=True fallback
      val hasMagic = bytes.length > 132 &&
        bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M'
      buf.position(if (hasMagic) 132 else 0)

      // dataset encoding: declared by the meta transfer syntax when a meta
      // group is present (updated below when (0002,0010) is read);
      // sniffed on raw headerless datasets
      var datasetExplicit = if (hasMagic) true else sniffExplicit(buf)

      var tags = Map.empty[String, String]
      var pixelBytes: Array[Byte] = null
      var bitsAllocated = 16

      while (buf.remaining() >= 8) {
        val group = buf.getShort() & 0xffff
        val elem = buf.getShort() & 0xffff
        // the file-meta group (0002,xxxx) is ALWAYS explicit VR (PS3.10)
        val elementExplicit = group == 0x0002 || datasetExplicit
        var vr: String = null
        val length =
          if (elementExplicit) {
            vr = new String(Array(buf.get(), buf.get()).map(_.toChar))
            if (LongLengthVRs.contains(vr)) { buf.getShort(); buf.getInt() }
            else buf.getShort() & 0xffff
          } else buf.getInt()
        if (length < 0 || length > buf.remaining()) return None
        val value = new Array[Byte](length)
        buf.get(value)

        if (group == 0x0002 && elem == 0x0010)
          datasetExplicit = new String(value, "ISO-8859-1").trim != ImplicitTsUid
        else if (group == 0x7FE0 && elem == 0x0010) pixelBytes = value
        else TagNames.get((group, elem)).foreach { name =>
          val isUS = vr == "US" || (vr == null && UsTags((group, elem)))
          val s =
            if (isUS)
              ByteBuffer.wrap(value).order(ByteOrder.LITTLE_ENDIAN).getShort().toInt.toString
            else new String(value, "ISO-8859-1").trim
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

  /** Implicit-VR element: (group, elem, 32-bit length) — no VR bytes. */
  private def elementImplicit(bb: java.io.ByteArrayOutputStream,
      group: Int, elem: Int, value: Array[Byte]): Unit = {
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.putShort(group.toShort).putShort(elem.toShort).putInt(value.length)
    bb.write(head.array())
    bb.write(value)
  }

  /** Encode a DICOM file: preamble + DICM + meta + dataset. `tags` uses
    * pydicom keywords; WindowCenter/Width may be multi-valued with '\'.
    * 16-bit pixels. `implicitDataset = true` writes the dataset in
    * Implicit VR LE (meta — itself always explicit — declares transfer
    * syntax 1.2.840.10008.1.2); headerless implicit output exercises the
    * reader's VR sniffing. */
  def encode(tags: Map[String, String], rows: Int, cols: Int,
      pixels: Array[Double], withPreamble: Boolean = true,
      implicitDataset: Boolean = false): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    if (withPreamble) {
      bb.write(new Array[Byte](128))
      bb.write("DICM".getBytes("ISO-8859-1"))
      // minimal file meta: transfer syntax UID (UI, NUL-padded)
      val ts = if (implicitDataset) ImplicitTsUid else "1.2.840.10008.1.2.1"
      element(bb, 0x0002, 0x0010, "UI", evenPad(ts, 0))
    }
    def put(g: Int, e: Int, vr: String, value: Array[Byte]): Unit =
      if (implicitDataset) elementImplicit(bb, g, e, value)
      else element(bb, g, e, vr, value)
    def strTag(g: Int, e: Int, vr: String, name: String): Unit =
      tags.get(name).foreach(v => put(g, e, vr, evenPad(v)))
    strTag(0x0008, 0x0018, "UI", "SOPInstanceUID")
    strTag(0x0008, 0x0060, "CS", "Modality")
    strTag(0x0010, 0x0020, "LO", "PatientID")
    strTag(0x0020, 0x000D, "UI", "StudyInstanceUID")
    strTag(0x0020, 0x000E, "UI", "SeriesInstanceUID")
    def usTag(g: Int, e: Int, v: Int): Unit =
      put(g, e, "US",
        ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())
    usTag(0x0028, 0x0010, rows)
    usTag(0x0028, 0x0011, cols)
    usTag(0x0028, 0x0100, 16)
    strTag(0x0028, 0x1050, "DS", "WindowCenter")
    strTag(0x0028, 0x1051, "DS", "WindowWidth")
    val pb = ByteBuffer.allocate(pixels.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    pixels.foreach(v => pb.putShort(math.max(0, math.min(65535, math.round(v))).toShort))
    put(0x7FE0, 0x0010, "OW", pb.array())
    bb.toByteArray
  }
}
