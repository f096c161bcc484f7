package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Murmur3HashFunction}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Shared kernel for [[MinHashSig]]. */
object MinHashSigUtil {
  /** MinHash signature of a shingle array: h_i = min over shingles of
    * `hash(shingle, i)` — murmur3 seed 42 folded over (string, int),
    * bit-identical to Spark's `hash()` builtin chain, so the result equals
    * `groupBy(doc_id).agg(min(hash(shingle, lit(i))) …)` over the exploded
    * shingle table. The string is hashed ONCE and the per-seed variation
    * is the cheap int fold — the column form re-hashes the full string
    * bytes numHashes times per shingle. Caller guarantees ≥ 1 shingle
    * (empty docs are filtered out, matching the exploded form where they
    * simply produce no signature row). */
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Int.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val h1 = Murmur3HashFunction
        .hash(shingles.getUTF8String(j), StringType, 42L).toInt
      var i = 0
      while (i < numHashes) {
        val hi = Murmur3HashFunction.hash(i, IntegerType, h1.toLong).toInt
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** Map-side MinHash signature over a per-document shingle array as a
  * native codegen expression. Replaces the explode → shuffle →
  * 32-partial-min aggregation: the signature becomes a NARROW projection,
  * removing a corpus-sized exchange from the dedup pipeline (the exploded
  * shingle table is still built — lazily, from the cached array column —
  * but only where verification actually joins on shingles). At 100 TB the
  * signature+banding stages now run at scan speed with zero shuffles
  * before the bucket join.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects (array<string>, int literal), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashSigUtil.signature(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MinHashSigUtil.signature($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
