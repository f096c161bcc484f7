package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: BLOCKING + edit-distance verification — the
  * classic two-phase entity-resolution shape. Comparing every record to
  * every record is O(n²) and dead at any scale; instead each record is
  * assigned a cheap deterministic BLOCK KEY (here: a token of the name),
  * candidate pairs form only WITHIN a block via a self-equi-join on the
  * key, and an exact string-distance predicate (codegen'd
  * `levenshtein`, never a UDF) keeps the true matches. Block sizes are the
  * knob: the join's fan-out is quadratic in the largest block, so keys
  * must be chosen (or salted/split) to bound them — the per-block audit
  * row [[blockedNameMatches]] emits is exactly the signal a 100 TB run
  * watches.
  */
object Linkage {

  private def keyed(records: DataFrame, id: Column, name: Column,
      blockRegex: String): DataFrame =
    records.select(id.as("__id"), name.as("__name"),
      regexp_extract(name, blockRegex, 1).as("block_key"))

  /** Candidate pairs within each block, with their exact edit distance.
    * `distance` is Levenshtein over the FULL name, not just the block
    * remainder — blocking only prunes, the verifier sees whole records. */
  def matchPairs(records: DataFrame, id: Column, name: Column,
      blockRegex: String): DataFrame = {
    val k = keyed(records, id, name, blockRegex)
    k.as("a")
      .join(k.as("b"),
        col("a.block_key") === col("b.block_key")
          && col("a.__id") < col("b.__id"))
      .select(col("a.block_key").as("block_key"),
        col("a.__id").as("id1"), col("b.__id").as("id2"),
        levenshtein(col("a.__name"), col("b.__name")).as("distance"))
  }

  /** Per-block audit: record count, candidate-pair count (the quadratic
    * cost actually paid — `n·(n−1)/2`, cross-checkable against
    * `n_records`), and match counts at distance ≤ `maxDist` / exactly 0.
    * Blocks with a single record still appear (zero pairs): a blocking
    * scheme is judged as much by its singleton rate as by its largest
    * block.
    */
  def blockedNameMatches(records: DataFrame, id: Column, name: Column,
      blockRegex: String, maxDist: Int): DataFrame = {
    val perBlock = keyed(records, id, name, blockRegex)
      .groupBy(col("block_key")).agg(count(lit(1)).as("n_records"))
    val pairAgg = matchPairs(records, id, name, blockRegex)
      .groupBy(col("block_key"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("distance") <= maxDist, 1L).otherwise(0L)).as("n_matches"),
        sum(when(col("distance") === 0, 1L).otherwise(0L)).as("n_exact"))
    perBlock.join(pairAgg, Seq("block_key"), "left")
      .na.fill(0L, Seq("n_pairs", "n_matches", "n_exact"))
  }
}
