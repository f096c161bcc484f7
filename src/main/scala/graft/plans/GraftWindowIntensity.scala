package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** D1 as a native Catalyst expression with whole-stage codegen — the
  * engine's hottest scalar (`/root/reference/dataflow_pipeline.py:30-35`):
  * `low = wc − ww/2; high = wc + ww/2; clip; (v−low)/max(high−low,1e-6)·255`
  * truncated to uint8-ranged long.
  *
  * Exists alongside the `functions`-composed form
  * ([[graft.operators.Relational.windowIntensity]]); both produce identical
  * results (CatalystSpec cross-checks). The custom form (a) evaluates
  * wc/ww exactly once per row even under repeated reference, (b) emits one
  * branch-free Java expression, and (c) is lowered by
  * [[LowerGraftWindow]] to built-in arithmetic when wc/ww are literals so
  * `ConstantFolding` pre-computes the window bounds at plan time.
  */
case class GraftWindowIntensity(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // ExpectsInputTypes needs the private[sql] AbstractDataType — check types
  // manually instead (callers cast explicitly, as the oracle SQL does too)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_window expects (double, double, double), got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_window"

  override protected def nullSafeEval(v: Any, wc: Any, ww: Any): Any = {
    val vv = v.asInstanceOf[Double]
    val c = wc.asInstanceOf[Double]
    val w = ww.asInstanceOf[Double]
    val low = c - w / 2.0
    val high = c + w / 2.0
    val clipped = math.min(math.max(vv, low), high)
    math.floor((clipped - low) / math.max(high - low, 1e-6) * 255.0).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, w) => {
      val low = ctx.freshName("low")
      val high = ctx.freshName("high")
      val clip = ctx.freshName("clip")
      s"""
         |double $low = $c - $w / 2.0;
         |double $high = $c + $w / 2.0;
         |double $clip = java.lang.Math.min(java.lang.Math.max($v, $low), $high);
         |${ev.value} = (long) java.lang.Math.floor(
         |  ($clip - $low) / java.lang.Math.max($high - $low, 1e-6) * 255.0);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
