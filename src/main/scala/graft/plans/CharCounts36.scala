package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document `[0-9a-z]` character histogram in ONE byte walk: a
  * 36-element `array<long>` indexed in SORTED character order (digits
  * '0'–'9' at 0–9, letters 'a'–'z' at 10–35 — the order `array_sort` on
  * the char list produces, so downstream folds over the histogram visit
  * runs in the identical sequence the per-char formulation did).
  *
  * Replaces `regexp_extract_all` char explosion + `array_sort` + an
  * interpreted per-character HoF fold: one expression call per ROW with a
  * tight JVM loop, instead of per-character lambda dispatch. Walking raw
  * UTF-8 bytes is exact: continuation/lead bytes of multi-byte code
  * points are ≥ 0x80 and never collide with the ASCII ranges counted.
  *
  * CodegenFallback is deliberate: the cost model is one virtual call per
  * row — the loop itself is compiled JVM code, and fabricating an
  * UnsafeArrayData writer in generated Java buys nothing measurable here.
  */
case class CharCounts36(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_counts expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Long](36)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') counts(b - '0') += 1
      else if (b >= 'a' && b <= 'z') counts(10 + (b - 'a')) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts36 =
    copy(child = newChild)
}
