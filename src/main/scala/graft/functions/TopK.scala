package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** One (candidate, score) pair flowing through the top-k aggregation. */
case class Scored(cos: Double, cId: Long)

/** Size-bounded top-k typed Aggregator: keeps at most 2k candidates per
  * aggregation buffer (pruned back to k whenever it doubles), ordered by
  * score desc with id-asc tie-break.
  *
  * Why not `row_number().over(Window.partitionBy(q_id))`: the window form
  * shuffles EVERY scored pair (|Q|·|C| rows for brute-force ANN) into the
  * exchange before k survive. As a TypedImperativeAggregate this runs with
  * map-side partial aggregation — each mapper emits at most ~2k candidates
  * per query id, so the exchange carries O(|Q| · k · partitions) rows
  * regardless of corpus size. That is the difference between a plan that
  * survives a 100 TB corpus and one that doesn't.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def best(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.cos, s.cId)).take(k)
  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
    val nb = b :+ a
    if (nb.length >= 2 * k) best(nb) else nb
  }
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
  override def finish(b: Seq[Scored]): Seq[Scored] = best(b)
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {

  /** Ranks scored `(q_id, c_id, cos)` pairs down to the top k per `q_id`
    * and returns `(q_id, rank, c_id, cos)` with rank 1-based, cos rounded
    * to 6 places. The heavy lifting is the k-bounded [[TopKByScore]]
    * aggregation; the posexplode afterwards touches only |Q|·k rows.
    *
    * `c_id` may be any type. Integral ids flow through the aggregation
    * buffer directly (widened to long). Other types (string UUIDs etc.)
    * rank on a 64-bit `xxhash64` surrogate and join the original ids back
    * over the |Q|·k survivors — a keyed join AQE sizes itself, never a
    * corpus broadcast. Ties then break on the surrogate (deterministic,
    * not lexicographic), and a 64-bit hash collision between two candidate
    * ids could duplicate a rank row (~2⁻⁶⁴ per pair — documented, not
    * guarded). `q_id` passes through the groupBy untouched at any type.
    *
    * `candidateIds` (a frame with a `c_id` column, normally the corpus id
    * projection) supplies the surrogate→id mapping for the non-integral
    * path. Pass it whenever the scored pipeline is expensive or
    * nondeterministic: deriving the mapping from `scored` itself would
    * evaluate that whole pipeline a second time, and if it is
    * nondeterministic the second evaluation's ids can diverge from the
    * ranked rows. The join is `left` + a runtime assertion, so a surrogate
    * that lost its mapping fails the query loudly instead of silently
    * dropping a rank row.
    */
  def rankTopK(scored: DataFrame, k: Int,
      candidateIds: Option[DataFrame] = None): DataFrame = {
    val integral = scored.schema("c_id").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral)
      rankIntegral(scored.select(col("q_id"),
        col("c_id").cast("long").as("c_id"), col("cos")), k)
    else {
      val ranked = rankIntegral(scored.select(col("q_id"),
          xxhash64(col("c_id")).as("c_id"), col("cos")), k)
        .withColumnRenamed("c_id", "__cid")
      // distinct partial-aggregates map-side, so the mapping frame costs
      // one pass over candidate ids; the join touches |Q|·k ranked rows
      val mapping = candidateIds.getOrElse(scored).select(col("c_id")).distinct()
        .select(col("c_id"), xxhash64(col("c_id")).as("__cid"))
      ranked.join(mapping, Seq("__cid"), "left")
        .filter(coalesce(assert_true(col("c_id").isNotNull,
          lit("rankTopK: ranked surrogate has no id mapping — " +
            "nondeterministic scored pipeline? pass candidateIds")), lit(true)))
        .select(col("q_id"), col("rank"), col("c_id"), col("cos"))
    }
  }

  private def rankIntegral(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k), Encoders.product[Scored])
    scored
      .groupBy(col("q_id"))
      .agg(topk(col("cos"), col("c_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r", "s")))
      .select(col("q_id"), (col("r") + 1).cast("long").as("rank"),
        col("s.cId").as("c_id"), round(col("s.cos"), 6).as("cos"))
  }
}
