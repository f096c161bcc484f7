package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew mitigation for hot keys — the 100 TB tool kit the driver queries
  * exercise at small scale. AQE's skew-join split handles most cases at
  * runtime; these explicit forms are for pipelines that must bound task
  * size deterministically (e.g. a power-law `user_id` or a giant dedup
  * bucket).
  */
object Skew {

  /** Spark's `hash()` rejects MapType anywhere in the type tree at analysis
    * time (map iteration order makes the hash ill-defined) — such columns
    * must be excluded from content-derived salts. */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType    => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType  => containsMap(a.elementType)
    case _             => false
  }

  /** Salt for spreading one hot key's rows across sub-keys: hash of the
    * hashable content columns MIXED WITH `spark_partition_id()`. Content
    * alone collapses to a single salt when a hot key's payload is constant
    * (counting rows with `lit(1)` — the most common case), re-concentrating
    * exactly the skew the salt exists to spread; the partition id keeps
    * constant rows fanned out across at least one salt per upstream task.
    * (Test-visible: SkewStreamStateSpec asserts the constant-value spread.)
    */
  private[graft] def spreadSalt(content: Seq[Column], salts: Int): Column =
    pmod(hash(content :+ spark_partition_id(): _*), lit(salts))

  /** Skew-resistant inner equi-join: scatter the big side's rows across
    * `salts` sub-keys and replicate the small side once per sub-key, so a
    * hot key's rows land in `salts` tasks instead of one. Result is
    * row-identical to the plain join regardless of WHICH salt a row gets —
    * the small side carries every salt value, so the salt only refines
    * partitioning (task retries that re-salt differently still join).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val hashable = big.schema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => big(f.name)).toSeq
    val bigS = big.withColumn("__salt", spreadSalt(hashable, salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: pre-aggregate
    * per (key, salt), then combine per key. Caps any single task's group
    * size at ~1/salts of the hot key. (Spark's partial aggregation already
    * does this map-side; the explicit form also bounds the REDUCE side when
    * one key dominates a partition's hash range.) Salt values never affect
    * the result — phase 2 re-aggregates per key — so the partition-id mix
    * in [[spreadSalt]] is safe here by construction.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      out: String = "sum"): DataFrame = {
    require(salts > 0)
    df.select(key.as("__k"), value.as("__v"))
      .withColumn("__salt", spreadSalt(Seq(col("__k"), col("__v")), salts))
      .groupBy(col("__k"), col("__salt"))
      .agg(sum(col("__v")).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as(out), sum(col("__n")).as("n"))
      .withColumnRenamed("__k", key.toString)
  }
}
