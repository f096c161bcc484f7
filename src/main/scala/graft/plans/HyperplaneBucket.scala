package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Murmur3HashFunction}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Shared kernel for [[HyperplaneBucket]].
  *
  * The plane weights are pure functions of (plane, dimension) — murmur3
  * chained over the two ints exactly like Spark's `hash(d, p)` builtin with
  * its fixed seed 42, then `pmod(·,2001)−1000` — so they are MEMOIZED in a
  * process-wide matrix instead of recomputed per row: the HoF formulation
  * pays 2 interpreted murmur3 calls per (row × plane × dimension); this
  * pays a multiply-add. The cache only ever grows (monotone in both axes)
  * and its content is deterministic, so racing rebuilds are idempotent.
  */
object HyperplaneBucketUtil {

  @volatile private var cache: Array[Array[Double]] = Array.empty // [p][d]

  private def weight(d: Int, p: Int): Double = {
    // bit-identical to `pmod(hash(d, lit(p)).cast("long"), 2001L) - 1000`:
    // murmur3 seed 42 folded over (d: int, p: int), result truncated to int
    // per HashExpression[Int], sign-extended by the long cast
    val h1 = Murmur3HashFunction.hash(d, IntegerType, 42L).toInt
    val h2 = Murmur3HashFunction.hash(p, IntegerType, h1.toLong).toInt
    java.lang.Math.floorMod(h2.toLong, 2001L).toDouble - 1000.0
  }

  private def weights(nPlanes: Int, dims: Int): Array[Array[Double]] = {
    val c = cache
    if (c.length >= nPlanes && (c.length == 0 || c(0).length >= dims)) c
    else synchronized {
      val c2 = cache
      if (c2.length >= nPlanes && (c2.length == 0 || c2(0).length >= dims)) c2
      else {
        val np = math.max(nPlanes, c2.length)
        val nd = math.max(dims, if (c2.isEmpty) 0 else c2(0).length)
        val w = Array.tabulate(np, nd)((p, d) => weight(d, p))
        cache = w
        w
      }
    }
  }

  def bucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    val w = weights(nPlanes, n)
    val proj = new Array[Double](nPlanes)
    var d = 0
    while (d < n) {
      val x = v.getDouble(d)
      var p = 0
      while (p < nPlanes) { proj(p) += x * w(p)(d); p += 1 }
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < nPlanes) { if (proj(p) > 0) out |= 1L << p; p += 1 }
    out
  }
}

/** Random-hyperplane LSH bucket id over an `array<double>` vector as a
  * native codegen expression — the bucket-hashing stage of ANN-LSH and
  * embedding near-dup, which runs once per corpus row (scan cost at
  * 100 TB). Replaces nPlanes interpreted `aggregate(zip_with(…, hash(…)))`
  * folds per row (CodegenFallback) with one fused multiply-add loop over a
  * memoized weight matrix. Per-plane accumulation order is element-
  * ascending in both forms, so results are bit-identical (CatalystSpec
  * pins it; the ann_lsh/embedding fixtures gate it end-to-end).
  */
case class HyperplaneBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane expects (array<double>, int literal), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HyperplaneBucketUtil.bucket(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HyperplaneBucketUtil.bucket($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
