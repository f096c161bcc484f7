package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared kernel for [[SimHash64]] — one tight Scala loop per row, invoked
  * from generated code as a single static call (no per-element lambda
  * dispatch, no boxing). */
object SimHash64Util {
  /** 64-bit SimHash of a token array: per bit b, sum ±1 over the tokens'
    * xxhash64 values; bit b of the result = (sum > 0). Seed 42 and
    * [[XxHash64Function]] make each token hash BIT-IDENTICAL to Spark's
    * `xxhash64` builtin, so this replaces the higher-order-function
    * formulation without changing any signature (the driver's simhash
    * fixture gate pins the equivalence end-to-end). A null token hashes to
    * the seed, exactly like `xxhash64(NULL)`. */
  def signature(toks: ArrayData): Long = {
    val n = toks.numElements()
    val sums = new Array[Long](64)
    var i = 0
    while (i < n) {
      val h: Long =
        if (toks.isNullAt(i)) 42L
        else XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** SimHash signature over an `array<string>` token column as a native
  * codegen expression — the text-dedup hot path. The HoF formulation
  * (`aggregate(transform(toks, xxhash64), array_repeat(0L, 64), zip_with …)`)
  * routes through HigherOrderFunction, which is CodegenFallback: every row
  * pays interpreted lambda dispatch per token × 64 bit positions, plus a
  * 64-element array allocation per fold step. This stays inside
  * whole-stage codegen and runs the whole signature as one fused loop.
  * At a 100 TB corpus the signature stage IS the scan cost — this keeps it
  * at scan speed.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash64Util.signature(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SimHash64Util.signature($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
