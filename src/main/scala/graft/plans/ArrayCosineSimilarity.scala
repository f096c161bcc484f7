package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity over two `array<double>` columns as a native codegen
  * expression — the ANN hot path. The `zip_with`/`aggregate` composition
  * ([[graft.functions.Similarity.cosine]]'s portable form) routes through
  * HigherOrderFunction, which is CodegenFallback: every row pays
  * interpreted lambda dispatch per element. This emits one fused Java loop
  * (dot + both norms in a single pass) inside whole-stage codegen.
  *
  * Semantics match the HoF form for equal-length inputs: left-to-right
  * accumulation, zero-norm guard → 0.0. Elements must be non-null
  * (embedding vectors). DOCUMENTED DIVERGENCE for mismatched lengths: the
  * HoF form yields NULL (zip_with's null padding nulls the fold) while this
  * expression scores the common prefix with full-vector norms — the useful
  * answer for ANN; CatalystSpec pins the equal-length equivalence only.
  */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // array<double> only (either nullability): ArrayData.getDouble on any
  // other element type reads reinterpreted bytes instead of failing, so SQL
  // callers must be stopped at analysis time.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<double>, array<double>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // tail elements still count toward the norms (zip_with pads the
    // shorter side with null → HoF form would null out; equal-length in
    // practice, but keep norms over each full vector)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); ny += v * v; j += 1 }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $xv = $a.getDouble($i); $nx += $xv * $xv;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $yv = $b.getDouble($i); $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
