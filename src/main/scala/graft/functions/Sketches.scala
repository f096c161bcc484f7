package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches. The COUNT-MIN SKETCH here answers "how
  * often does key x occur?" in `depth × width` integers REGARDLESS of input
  * size or key cardinality — the bounded-state complement to the exact
  * two-pass heavy-hitter operator ([[graft.operators.HeavyHitters]]) and
  * `approx_count_distinct`'s HLL. Its hash family is the engine's own
  * Rabin-Karp polynomial fingerprint (`graft_rolling_hash`, seeded by a
  * suffix), NOT a JVM-private hash — so a DuckDB oracle can rebuild the
  * identical counter table from scratch in SQL and gate construction,
  * merge, AND estimation end-to-end. Randomized-looking, fully
  * deterministic: the property every reproducible pipeline sketch needs.
  */
object Sketches {

  /** Build the CMS counter table `(j, bucket, counter)` for `0 ≤ j <
    * depth`, `0 ≤ bucket < width`, `counter = Σ count(x)` over keys x with
    * `h_j(x) = bucket`.
    *
    * Construction order: exact per-key counts FIRST (one partial-aggregated
    * hash aggregate — duplicate keys collapse map-side), then the ×depth
    * explode runs on the (distinct-key)-sized frame, never on raw rows,
    * and the counter aggregate re-combines to the fixed `depth × width`
    * grid. At 100 TB the counter table is still ≤ depth·width rows — it
    * broadcasts anywhere. Counters are EXACT (construction has no error;
    * only point estimates over-count, from collisions).
    *
    * `h_j(x) = poly31(x ⧺ "#" ⧺ j) mod width` — seeding by suffix keeps
    * one codegen hash kernel for every row of the family.
    */
  def cmsCounters(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"degenerate sketch: $depth x $width")
    graft.plans.GraftFunctions.register(df.sparkSession)
    perKey(df, key)
      .select(col("__k"), col("__n"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), bucketOf(col("__k"), col("j"), width), col("__n"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("__n")).as("counter"))
  }

  /** Point-estimate the frequency of each distinct key in `queries`:
    * `est(x) = min_j counter[j][h_j(x)]` — an upper bound on the true
    * count (never under), within `ε·N` of it with probability depending on
    * `depth`/`width`. The counter table is crossed in broadcast (it is
    * `depth × width` rows by construction); a missing bucket means no key
    * hashed there, i.e. counter 0.
    */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    graft.plans.GraftFunctions.register(queries.sparkSession)
    queries.select(key.as("__k")).distinct()
      .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("__k"), col("j"), bucketOf(col("__k"), col("j"), width))
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col("__k"))
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_est"))
  }

  /** JOIN-SIZE ESTIMATE from two sketches over the join key — the classic
    * planner use of CMS: `|A ⋈ B| = Σ_key cA(key)·cB(key)`, and the sketch
    * inner product `Σ_bucket counterA[j][b]·counterB[j][b]` equals that
    * sum PLUS nonnegative collision cross-terms, for every depth row j —
    * so `min_j` of the inner products is an upper bound that tightens with
    * width. Estimating a join's output size without running the join is
    * how an optimizer decides broadcast-vs-shuffle and detects fan-out
    * blowups BEFORE paying for them; two depth×width tables meet here,
    * nothing touches the inputs again.
    */
  def cmsJoinSizeEstimate(countersA: DataFrame, countersB: DataFrame): DataFrame =
    countersA.as("a")
      .join(countersB.as("b"), Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("a.counter") * col("b.counter")).as("__inner"))
      .agg(min(col("__inner")).as("est_join_rows"))

  private def perKey(df: DataFrame, key: Column): DataFrame =
    df.select(key.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__n"))

  private def bucketOf(k: Column, j: Column, width: Int): Column =
    pmod(call_function("graft_rolling_hash",
      concat(k, lit("#"), j.cast("string"))), lit(width.toLong)).as("bucket")
}
