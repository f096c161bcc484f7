package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftCaches.Persistable

/** Fuzzy record linkage: BLOCKING + edit-distance verification — the
  * classic two-phase entity-resolution shape. Comparing every record to
  * every record is O(n²) and dead at any scale; instead each record is
  * assigned a cheap deterministic BLOCK KEY (here: a token of the name),
  * candidate pairs form only WITHIN a block via a self-equi-join on the
  * key, and an exact string-distance predicate (codegen'd
  * `levenshtein`, never a UDF) keeps the true matches.
  *
  * The audit aggregate ([[blockedNameMatches]]) additionally applies the
  * AGGREGATE-BEFORE-PAIRING rewrite: roll records up to `(block, name,
  * count)` FIRST, run the quadratic join on DISTINCT names, and weight
  * each name pair by its count product. Record-pair semantics are
  * preserved exactly — `n` copies of name A against `m` of name B is
  * `n·m` record pairs at one levenshtein — but the join cost collapses
  * from O(records²) to O(distinct-names²) per block: measured 60× on the
  * driver's part-name query (2.5k-record blocks, 8 distinct names each).
  * When names are near-unique the rewrite degrades gracefully to the
  * record-level cost, and block-size selectivity (a composite key, a
  * second blocking pass) becomes the knob — which is why the audit emits
  * per-block pair counts: they ARE the quadratic cost actually paid.
  */
object Linkage {

  private def keyed(records: DataFrame, id: Column, name: Column,
      blockRegex: String): DataFrame =
    records.select(id.as("__id"), name.as("__name"),
      regexp_extract(name, blockRegex, 1).as("block_key"))

  /** Candidate RECORD pairs within each block, with their exact edit
    * distance. `distance` is Levenshtein over the FULL name, not just the
    * block remainder — blocking only prunes, the verifier sees whole
    * records. Use for pair-level output; the per-block audit uses the
    * distinct-name rewrite instead. */
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

  /** Per-block audit: record count, candidate-pair count (`n·(n−1)/2` —
    * the quadratic cost record-level pairing would pay), and match counts
    * at distance ≤ `maxDist` / exactly 0. Computed via the distinct-name
    * rewrite (see object doc) — identical values to aggregating
    * [[matchPairs]], pinned by spec. Blocks with a single record still
    * appear (zero pairs): a blocking scheme is judged as much by its
    * singleton rate as by its largest block.
    */
  def blockedNameMatches(records: DataFrame, id: Column, name: Column,
      blockRegex: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "negative edit distance")
    // exact halving of an always-even product, kept in integer arithmetic
    def half(x: Column): Column = ((x - pmod(x, lit(2L))) / 2).cast("long")
    val names = keyed(records, id, name, blockRegex)
      .groupBy(col("block_key"), col("__name"))
      .agg(count(lit(1)).as("__c"))
      .persistTracked() // feeds the per-block rollup AND the pair join
    // same-name pairs: C(c,2) per name, all at distance 0
    val perBlock = names.groupBy(col("block_key"))
      .agg(sum(col("__c")).as("n_records"),
        sum(half(col("__c") * (col("__c") - 1))).as("__n_same"))
    // distinct-name cross pairs: one levenshtein per NAME pair, weighted
    // by the count product it stands for
    val cross = names.as("a")
      .join(names.as("b"),
        col("a.block_key") === col("b.block_key")
          && col("a.__name") < col("b.__name"))
      .select(col("a.block_key").as("block_key"),
        (col("a.__c") * col("b.__c")).as("__w"),
        levenshtein(col("a.__name"), col("b.__name")).as("__d"))
      .groupBy(col("block_key"))
      .agg(sum(col("__w")).as("__n_cross"),
        sum(when(col("__d") <= maxDist, col("__w")).otherwise(0L))
          .as("__n_cross_match"))
    perBlock.join(cross, Seq("block_key"), "left")
      .na.fill(0L, Seq("__n_cross", "__n_cross_match"))
      .select(col("block_key"), col("n_records"),
        (col("__n_same") + col("__n_cross")).as("n_pairs"),
        (col("__n_same") + col("__n_cross_match")).as("n_matches"),
        col("__n_same").as("n_exact"))
  }
}
