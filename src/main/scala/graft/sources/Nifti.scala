package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** A3 — real NIfTI-1 volume decode (`sitk.ReadImage` →
  * `GetArrayFromImage`, `/root/reference/preprocessor.py:50-58`), pure
  * Scala. Supported profile: uncompressed single-file `.nii` (magic
  * "n+1\0"), little- or big-endian, datatypes uint8 (2), int16 (4),
  * float32 (16), uint16 (512); 3-D dims. Includes a writer for
  * self-contained fixtures.
  *
  * The reference immediately reduces a volume to its MIDDLE SLICE
  * (`image[shape[0]//2]`, `preprocessor.py:56-58`) — [[middleSlice]]
  * mirrors that exactly (slowest-varying axis, floor-half index).
  */
object Nifti {

  /** (nz, ny, nx, voxels row-major z-major) — shape follows the numpy
    * array view `GetArrayFromImage` returns: z slowest. */
  final case class NiftiVolume(nz: Int, ny: Int, nx: Int, voxels: Array[Double])

  def decode(bytes: Array[Byte]): Option[NiftiVolume] = {
    try {
      if (bytes.length < 352) return None
      // sizeof_hdr at offset 0 is 348 in the file's byte order — use it to
      // detect endianness
      val le = ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 348
      val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val buf = ByteBuffer.wrap(bytes).order(order)
      if (buf.getInt(0) != 348) return None
      // magic "n+1\0" at offset 344
      if (!(bytes(344) == 'n' && bytes(345) == '+' && bytes(346) == '1' && bytes(347) == 0))
        return None
      val ndim = buf.getShort(40).toInt
      if (ndim < 3) return None
      val nx = buf.getShort(42).toInt // dim[1] fastest-varying
      val ny = buf.getShort(44).toInt
      val nz = buf.getShort(46).toInt
      val datatype = buf.getShort(70).toInt
      val voxOffset = buf.getFloat(108).toInt
      val n = nx.toLong * ny * nz
      if (nx <= 0 || ny <= 0 || nz <= 0 || n > Int.MaxValue) return None
      val out = new Array[Double](n.toInt)
      val bytesPer = datatype match {
        case 2 => 1; case 4 | 512 => 2; case 16 => 4; case _ => return None
      }
      if (bytes.length < voxOffset + n * bytesPer) return None
      val data = ByteBuffer.wrap(bytes, voxOffset, (n * bytesPer).toInt).order(order)
      var i = 0
      while (i < n) {
        out(i) = datatype match {
          case 2   => (data.get() & 0xff).toDouble
          case 4   => data.getShort().toDouble
          case 512 => (data.getShort() & 0xffff).toDouble
          case 16  => data.getFloat().toDouble
        }
        i += 1
      }
      Some(NiftiVolume(nz, ny, nx, out))
    } catch { case _: Exception => None }
  }

  /** `image[shape[0]//2]` (`preprocessor.py:56-58`): the middle slice along
    * the slowest axis as a dense 2-D array. */
  def middleSlice(v: NiftiVolume): (Array[Double], Int, Int) = {
    val z = v.nz / 2
    val sliceLen = v.ny * v.nx
    (v.voxels.slice(z * sliceLen, (z + 1) * sliceLen), v.ny, v.nx)
  }

  /** Write an uncompressed float32 little-endian `.nii`. */
  def encode(nz: Int, ny: Int, nx: Int, voxels: Array[Double]): Array[Byte] = {
    require(voxels.length == nz * ny * nx)
    val voxOffset = 352
    val buf = ByteBuffer.allocate(voxOffset + voxels.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, 348)                       // sizeof_hdr
    buf.putShort(40, 3.toShort)              // dim[0] = ndim
    buf.putShort(42, nx.toShort)             // dim[1]
    buf.putShort(44, ny.toShort)             // dim[2]
    buf.putShort(46, nz.toShort)             // dim[3]
    buf.putShort(70, 16.toShort)             // datatype = float32
    buf.putShort(72, 32.toShort)             // bitpix
    buf.putFloat(108, voxOffset.toFloat)     // vox_offset
    buf.put(344, 'n'.toByte); buf.put(345, '+'.toByte)
    buf.put(346, '1'.toByte); buf.put(347, 0.toByte)
    buf.position(voxOffset)
    voxels.foreach(v => buf.putFloat(v.toFloat))
    buf.array()
  }
}
