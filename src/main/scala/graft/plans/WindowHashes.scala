package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[WindowHashes]] — every length-L character window's
  * fingerprint in ONE O(n) pass (Rabin-Karp slide), not O(n·L) per-window
  * refolds.
  *
  * Fingerprint design: a PAIR of independent polynomial hashes mod the
  * Mersenne prime 2^31−1 (bases 31 and 37), packed `(h1 << 31) | h2` into
  * one non-negative long. The pair exists because the slide step
  * `h ← (h − c_out·pow)·base + c_in  (mod M)` must stay inside signed
  * 64-bit arithmetic: with a ~2^57 modulus, `c_out·pow` alone reaches
  * 2^64 and silently wraps, while with M = 2^31−1 every intermediate is
  * bounded by 2^38 — exact with plain longs — and two independent 31-bit
  * hashes give a 2^-62 per-pair collision bound, equivalent to one 62-bit
  * hash. Each packed value equals the DIRECT fold
  * `(fold31(window) << 31) | fold37(window)` of its window's bytes, so an
  * independent engine (the DuckDB oracle, the HoF cross-check) can
  * recompute it per-substring without implementing the slide.
  *
  * Defined on normalized-ASCII input (one byte per character), like
  * [[RollingHash64]]: the kernel walks bytes; callers normalize first.
  */
object WindowHashesUtil {
  val M: Long = 2147483647L // 2^31 − 1, Mersenne prime
  val Base1: Long = 31L
  val Base2: Long = 37L

  /** Direct (non-sliding) packed fingerprint of one string — the
    * cross-check reference the slide must match per window. */
  def direct(s: UTF8String): Long = {
    val n = s.numBytes()
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) {
      val c = s.getByte(i).toLong
      h1 = (h1 * Base1 + c) % M
      h2 = (h2 * Base2 + c) % M
      i += 1
    }
    (h1 << 31) | h2
  }

  def hashes(s: UTF8String, winLen: Int): ArrayData = {
    val n = s.numBytes()
    if (winLen <= 0 || n < winLen) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - winLen + 1)
    var pow1 = 1L; var pow2 = 1L
    var i = 0
    while (i < winLen - 1) {
      pow1 = pow1 * Base1 % M
      pow2 = pow2 * Base2 % M
      i += 1
    }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < winLen) {
      val c = s.getByte(i).toLong
      h1 = (h1 * Base1 + c) % M
      h2 = (h2 * Base2 + c) % M
      i += 1
    }
    out(0) = (h1 << 31) | h2
    var p = 1
    while (p <= n - winLen) {
      val cOut = s.getByte(p - 1).toLong
      val cIn = s.getByte(p + winLen - 1).toLong
      h1 = java.lang.Math.floorMod((h1 - cOut * pow1 % M) * Base1 + cIn, M)
      h2 = java.lang.Math.floorMod((h2 - cOut * pow2 % M) * Base2 + cIn, M)
      out(p) = (h1 << 31) | h2
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_window_hash_counts(norm, L)` → `array<struct<wh: long, n_pos:
  * long>>`: the DISTINCT window fingerprints of a document with their
  * position counts, pre-aggregated IN-ROW (one O(n log n) sort + run-
  * length pass over the O(n) slide output). Replaces the explode →
  * `groupBy(doc, wh)` formulation: the per-document counts are exact
  * before any exchange, so the corpus-level pipeline keeps document
  * locality from the scan — the per-doc flag regroup collapses map-side
  * to one row per document, and the only full-size shuffle left is the
  * document-frequency rollup (irreducible: corpus-level df needs a
  * wh-keyed exchange). Entries are emitted in ascending-wh order
  * (deterministic; the order is irrelevant downstream since each entry
  * becomes an independent row).
  */
case class WindowHashCounts(child: Expression, winLen: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  override def left: Expression = child
  override def right: Expression = winLen
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("wh", LongType, nullable = false),
    StructField("n_pos", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_window_hash_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, winLen.dataType) match {
      case (StringType, IntegerType) if winLen.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckFailure(
        "graft_window_hash_counts needs a literal window length")
      case (c, l) => TypeCheckResult.TypeCheckFailure(
        s"graft_window_hash_counts expects (string, int), got (${c.simpleString}, ${l.simpleString})")
    }

  override protected def nullSafeEval(s: Any, l: Any): Any =
    WindowHashCountsUtil.counts(s.asInstanceOf[UTF8String], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.plans.WindowHashCountsUtil.counts($s, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, winLen = newRight)
}

/** Codegen entry point for [[WindowHashCounts]] (static call target). */
object WindowHashCountsUtil {
  import org.apache.spark.sql.catalyst.InternalRow

  def counts(s: UTF8String, winLen: Int): ArrayData = {
    val raw = WindowHashesUtil.hashes(s, winLen).toLongArray()
    java.util.Arrays.sort(raw)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](raw.length)
    var i = 0
    while (i < raw.length) {
      var j = i + 1
      while (j < raw.length && raw(j) == raw(i)) j += 1
      out += InternalRow(raw(i), (j - i).toLong)
      i = j
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_window_hashes(norm, L)` → `array<long>`: the packed fingerprint
  * of every length-L character window of a normalized-ASCII string, O(n)
  * total (see [[WindowHashesUtil]]). The map-side signature generator for
  * exact-substring duplicate detection (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): explode →
  * count windows across docs → flag spans seen in ≥ minDocs documents.
  * A string shorter than L yields an empty array (no full window).
  */
case class WindowHashes(child: Expression, winLen: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = winLen
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, winLen.dataType) match {
      case (StringType, IntegerType) if winLen.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckFailure(
        "graft_window_hashes needs a literal window length")
      case (c, l) => TypeCheckResult.TypeCheckFailure(
        s"graft_window_hashes expects (string, int), got (${c.simpleString}, ${l.simpleString})")
    }

  override protected def nullSafeEval(s: Any, l: Any): Any =
    WindowHashesUtil.hashes(s.asInstanceOf[UTF8String], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l) =>
      s"${ev.value} = graft.plans.WindowHashesUtil.hashes($s, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, winLen = newRight)
}
