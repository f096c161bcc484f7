package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for long-lived 100 TB datasets: CDC MERGE
  * (the upsert that keeps a snapshot current from a change feed) and
  * Z-order clustering (the layout that keeps multi-column box queries from
  * scanning everything). Complements the compaction / incremental-aggregate
  * / snapshot-diff passes defined at the query layer.
  */
object Maintenance {

  /** CDC MERGE — apply a change batch to a snapshot: `MERGE INTO target
    * USING source ON key WHEN MATCHED [AND op='d'] THEN DELETE / THEN
    * UPDATE WHEN NOT MATCHED THEN INSERT`, as a copy-on-write dataframe
    * transform (the engine owns plain parquet, not a txn log — the caller
    * writes the result as the next snapshot, same contract as
    * `small_file_compaction`).
    *
    * `source` must carry the key columns, the same payload columns as
    * `target`, and `opCol` ∈ {`"u"` upsert, `"d"` delete}; at most one row
    * per key (a CDC batch is already key-compacted — enforce upstream with
    * [[graft.functions.TopK]]-style latest-per-key, not here with a
    * window).
    *
    * Shape at scale: the asymmetry is the whole design. The target is the
    * 100 TB side; the change batch is millions of rows at most — so the
    * target is scanned ONCE, never shuffled: survivors come from a
    * BROADCAST anti-join (drop keys the batch touches), inserts+updates
    * come from the batch itself (upserts are full replacement rows — no
    * need to consult the old row), and the result unions map-side. A
    * shuffle-merge formulation (full outer join on key) would exchange
    * the entire snapshot to update 0.001% of it.
    */
  def mergeCdc(target: DataFrame, source: DataFrame, keys: Seq[String],
      opCol: String = "__op"): DataFrame = {
    require(keys.nonEmpty, "mergeCdc needs at least one key column")
    val payload = target.columns.toSeq
    require(payload.forall(source.columns.contains),
      s"source must carry every target column; missing " +
        payload.filterNot(source.columns.contains).mkString(","))
    val touched = source.select(keys.map(col): _*)
    val survivors = target.join(broadcast(touched), keys, "left_anti")
    val upserts = source.filter(col(opCol) === "u")
      .select(payload.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** SCD TYPE-2 APPLY — maintain a dimension's FULL HISTORY under a change
    * batch: each key's row set is a chain of versions with
    * `[valid_from, valid_to)` intervals, the open (current) version having
    * `valid_to IS NULL`. Applying a batch closes each touched key's open
    * version at the key's first change timestamp, and appends one version
    * per change, chained within the batch by `lead`.
    *
    * Contract: `changes` carries the key + payload columns and `effTs`;
    * timestamps in a batch are strictly after every `valid_from` the key
    * already has (change feeds are forward-in-time — enforce upstream, a
    * 100 TB validation join here would cost more than the apply).
    *
    * Shape at scale: the history side — the big side — is scanned once,
    * never shuffled, never windowed: closing the open versions is a
    * BROADCAST left join against the per-key first-change frame (one tiny
    * aggregate of the batch). Only the BATCH is windowed (per-key version
    * chaining), and a CDC batch is small by nature. Mirrors [[mergeCdc]]'s
    * asymmetry.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame, keys: Seq[String],
      effTs: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "scd2Apply needs at least one key column")
    val payload = history.columns.filterNot(c =>
      c == validFrom || c == validTo).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every history column except the validity pair; " +
        s"missing " + payload.filterNot(changes.columns.contains).mkString(","))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(effTs))
    val versioned = changes
      .withColumn(validFrom, col(effTs))
      .withColumn(validTo, lead(col(effTs), 1).over(w))
      .select((payload :+ validFrom :+ validTo).map(col): _*)
    val firstChange = changes.groupBy(keys.map(col): _*)
      .agg(min(col(effTs)).as("__first_chg"))
    history
      .join(broadcast(firstChange), keys, "left")
      .withColumn(validTo,
        when(col(validTo).isNull, col("__first_chg")).otherwise(col(validTo)))
      .drop("__first_chg")
      .unionByName(versioned)
  }

  /** Z-VALUE — interleave the low `bits` bits of two non-negative integer
    * columns (Morton order): bit i of x lands at 2i, bit i of y at 2i+1.
    * Rows close in z are close in BOTH x and y, so sorting/bucketing a
    * table by z gives every file a small x-range AND a small y-range —
    * min/max pruning then works for predicates on either column or both,
    * where a plain sort clusters only its leading column. This is the
    * whole mechanism of `OPTIMIZE ... ZORDER BY` in lakehouse engines.
    *
    * Pure column expression — the classic bit-spread ((v | v≪16) & mask,
    * halving the shift each round) composed from codegen'd bitwise
    * builtins; no UDF, stays inside whole-stage codegen. Caller maps
    * values into [0, 2^bits) first (modulo, quantile rank, epoch-day —
    * whatever fits the column); `bits` ≤ 31 keeps the result in a LONG.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    def spread(v: Column): Column = {
      // spread the low 32 bits of v one apart: ...b2 b1 b0 → ...b2 0 b1 0 b0
      val s16 = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s8 = s16.bitwiseOR(shiftleft(s16, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x3333333333333333L))
      s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    val mask = lit((1L << bits) - 1L)
    spread(x.cast("long").bitwiseAND(mask))
      .bitwiseOR(shiftleft(spread(y.cast("long").bitwiseAND(mask)), 1))
  }

  /** The file/bucket a z-value lands in when the keyspace splits into
    * 2^`bucketBits` equal z-ranges — the top bits of the z-value. This is
    * what a z-ordered WRITE does physically (range-split the sorted-by-z
    * stream into files); as a column it lets layout quality be measured
    * relationally: count DISTINCT buckets a predicate's rows occupy =
    * files a pruned scan would touch. */
  def zBucket(z: Column, bits: Int, bucketBits: Int): Column = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      "bucketBits must be in [1, 2*bits]")
    shiftright(z, 2 * bits - bucketBits)
  }

  /** INCREMENTAL JOIN MAINTENANCE — the join rows ADDED by insert-only
    * deltas on both sides of a materialized equi-join:
    * `Δ(A ⋈ B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB` (each new pair has its A-row
    * new, its B-row new, or both — exactly one of the three terms, so the
    * union is disjoint and needs no dedup). The point at 100 TB: refreshing
    * a materialized join touches the DELTAS joined against the other side
    * — never re-joins the two full inputs. With join keys as the
    * materialization's storage keys (bucketed layout), the two Δ⋈old terms
    * are one-sided shuffles of just the delta; the Δ⋈Δ term is usually
    * broadcast-sized.
    *
    * Deletes/updates need retraction rows (negative multiplicity) — out of
    * scope here by contract, matching the append-only ingest the CDC merge
    * ([[mergeCdc]]) upstreams handle first.
    */
  def incrementalJoinDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** ANTI-ENTROPY SEGMENT CHECKSUMS — the Merkle-style table-sync
    * primitive: hash-partition rows into `buckets` segments by key and
    * reduce each segment to `(n_rows, xor_sig, add_sig)`. Two replicas /
    * snapshots compare `buckets` tiny rows instead of the tables; only
    * segments whose triples differ need row-level re-transfer. At 100 TB
    * this is the difference between a sync that scans both sides always
    * and one that scans both sides ONCE to build checksums and then moves
    * just the damaged shards.
    *
    * Both reductions are order- and partition-independent: XOR is
    * commutative; the additive sum runs mod 2³¹−1 in exact decimal
    * arithmetic. They compensate each other's blind spots — XOR cancels a
    * row pair inserted twice (add+count catch it), the additive sum misses
    * swaps that conserve the total (XOR catches them). `rowSig` must be a
    * collision-resistant row digest (the driver query folds
    * md5(key ⧺ normalized content) through `graft_rolling_hash`, fully
    * replayable in the gate's oracle).
    */
  def segmentChecksums(df: DataFrame, bucketKey: Column, rowSig: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one segment")
    graft.plans.GraftFunctions.register(df.sparkSession)
    val P = 2147483647L // 2^31 − 1, prime
    df.select(
        pmod(call_function("graft_rolling_hash", bucketKey.cast("string")),
          lit(buckets.toLong)).as("bucket"),
        rowSig.as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_sig"),
        (sum((col("__h") % lit(P)).cast("decimal(28,0)")) % lit(P))
          .cast("long").as("add_sig"))
  }
}
