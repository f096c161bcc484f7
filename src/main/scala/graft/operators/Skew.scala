package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB tool kit the driver queries
  * exercise at small scale. AQE's skew-join split handles most cases at
  * runtime; these explicit forms are for pipelines that must bound task
  * size deterministically (e.g. a power-law `user_id` or a giant dedup
  * bucket).
  */
object Skew {

  /** Skew-resistant inner equi-join: scatter the big side's rows across
    * `salts` sub-keys and replicate the small side once per sub-key, so a
    * hot key's rows land in `salts` tasks instead of one. Result is
    * row-identical to the plain join (the salt only refines partitioning).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // The salt is a JOIN KEY, so it must be deterministic under task retry:
    // hash of the row's full content, never monotonically_increasing_id()
    // (which changes when a stage recomputes after a fetch failure and can
    // duplicate or drop rows). Identical duplicate rows share a salt — fine,
    // a hot key still spreads as long as payloads differ.
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: pre-aggregate
    * per (key, salt), then combine per key. Caps any single task's group
    * size at ~1/salts of the hot key. (Spark's partial aggregation already
    * does this map-side; the explicit form also bounds the REDUCE side when
    * one key dominates a partition's hash range.)
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      out: String = "sum"): DataFrame = {
    require(salts > 0)
    // content-derived salt: deterministic across retries (see saltedJoin)
    df.select(key.as("__k"), value.as("__v"))
      .withColumn("__salt", pmod(hash(col("__k"), col("__v")), lit(salts)))
      .groupBy(col("__k"), col("__salt"))
      .agg(sum(col("__v")).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as(out), sum(col("__n")).as("n"))
      .withColumnRenamed("__k", key.toString)
  }
}
