package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[RollingHash64]]. */
object RollingHash64Util {
  val Modulus: Long = 144115188075855859L // 2^57 − 13, prime

  /** Rabin-Karp fold h = (h·31 + byte) mod M over the string's bytes,
    * signed bytes + floorMod exactly like `ascii()`'s signed first byte
    * under `pmod`. Defined on ASCII input (one byte per character — the
    * fingerprint normalization guarantees it); on multi-byte characters
    * this folds per BYTE where the HoF form folds the first byte per
    * CHARACTER, so callers must normalize first. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = java.lang.Math.floorMod(h * 31L + s.getByte(i).toLong, Modulus)
      i += 1
    }
    h
  }
}

/** Rolling polynomial fingerprint over a normalized-ASCII string column as
  * a native codegen expression — the document-fingerprinting hot path.
  * The HoF formulation (`aggregate(split(norm, ''), …)`) materializes a
  * one-character-string ARRAY per character of every document and folds it
  * with interpreted lambda dispatch; this walks the UTF8String's bytes in
  * place, zero allocation, inside whole-stage codegen. Bit-identical on
  * ASCII input (DedupTextSpec pins it; the text_analysis closed-form
  * oracle gates it end-to-end).
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    RollingHash64Util.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.RollingHash64Util.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
