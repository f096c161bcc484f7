package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** ADC table fold — the IVFADC scoring hot path as a native codegen
  * expression: `graft_adc_fold(codes, tab) = Σ_s tab[s][codes[s]]` over
  * a per-vector PQ code array (`array<int>`, one entry per subspace) and
  * a pivoted per-query / per-cell lookup table (`array<array<long>>`,
  * outer indexed by subspace, inner positionally by codeword — codebook
  * cents are renumbered contiguous per sub at train time, so a sorted
  * collect IS the positional array).
  *
  * The `aggregate`/`element_at` higher-order composition this replaces
  * routes through HigherOrderFunction (CodegenFallback: interpreted
  * lambda dispatch per element, boxing every accumulator step); this
  * emits one fused primitive loop inside whole-stage codegen. Integer
  * sums are order-independent, so the value is bit-identical to both
  * the HoF fold and the historical normalized-row groupBy-sum — the
  * committed ANN fixtures pin that equivalence.
  *
  * Inputs are non-null by construction (codes come from the coder, the
  * table from the codebook/cross-term pivot); a code id outside its
  * sub-array raises the ArrayData bounds error rather than silently
  * scoring wrong. */
case class AdcFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_adc_fold expects (array<int>, array<array<long>>), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    var acc = 0L
    var s = 0
    while (s < n) {
      acc += tab.getArray(s).getLong(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $s = 0; $s < $n; $s++) {
         |  $acc += $b.getArray($s).getLong($a.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFold =
    copy(left = newLeft, right = newRight)
}
