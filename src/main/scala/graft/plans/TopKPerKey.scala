package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** WHOLE-OPERATOR Catalyst extension: top-k rows per key as a first-class
  * plan node — logical node + planner [[SparkStrategy]] + two physical
  * operators, the (c)-tier of the extension ladder (compose < custom
  * Expression < custom plan node).
  *
  * Why a plan node instead of the typed-Aggregator formulation
  * ([[graft.functions.TopKByScore]]): the aggregator pays for generality —
  * every surviving row is serialized into an aggregation buffer object,
  * merged through Catalyst's ObjectHashAggregate, then re-exploded
  * (posexplode) and re-projected. The physical operator keeps rows as
  * UnsafeRows end to end: the PARTIAL operator runs inside each input
  * partition and forwards at most k rows per (key, partition) — the same
  * map-side bound that makes the aggregator scale (exchange carries
  * O(|keys|·k·partitions) rows, never the full scored set) — and the FINAL
  * operator declares `ClusteredDistribution(key)`, so `EnsureRequirements`
  * inserts exactly one hash exchange between them, merges the per-partition
  * survivors, and appends the 1-based `rank` column. No row ever leaves
  * Tungsten format; ranking needs no window and no object aggregation.
  *
  * Ordering is an arbitrary `Seq[SortOrder]` over the child's columns
  * (ties included), so the operator is not tied to ANN scoring — any
  * "top-k per group by some ordering" query can plan through it.
  */
case class GraftTopKPerKey(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan,
    flushRows: Int = 4 << 20) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(keys.nonEmpty, "need at least one key column")
  require(ordering.nonEmpty, "need an ordering")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftTopKPerKey =
    copy(child = newChild)
}

/** Planner rule: logical [[GraftTopKPerKey]] → partial + final physical
  * operators. The exchange between them is NOT planned here — the final
  * operator's required distribution lets `EnsureRequirements` (and AQE)
  * place and size it.
  */
object GraftTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftTopKPerKey(keys, ordering, k, rankAttr, child, flushRows) =>
      GraftTopKPerKeyFinalExec(keys, ordering, k, rankAttr,
        GraftTopKPerKeyPartialExec(keys, ordering, k, planLater(child), flushRows)) :: Nil
    case _ => Nil
  }
}

/** Shared per-key bounded-buffer logic: an open-addressed map from the
  * key's UnsafeRow to a buffer that is pruned back to k whenever it
  * doubles — amortized O(log k) per row, at most 2k row copies live per
  * key.
  */
private[plans] final class TopKBuffers(
    keyProj: UnsafeProjection,
    cmp: Ordering[InternalRow],
    k: Int) {
  private val map = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]]()
  private var rows = 0

  /** Rows currently buffered (≤ 2k per key) — the partial operator's
    * memory-bound flush trigger. */
  def bufferedRows: Int = rows

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    var buf = map.get(key)
    if (buf == null) {
      buf = new scala.collection.mutable.ArrayBuffer[InternalRow](k + 1)
      map.put(key.copy(), buf)
    }
    buf += row.copy()
    rows += 1
    if (buf.length >= 2 * k) {
      val pruned = buf.sortInPlace()(cmp).take(k)
      rows -= buf.length - pruned.length
      buf.clear()
      buf ++= pruned
    }
  }

  /** (key, top-k rows in order) pairs. */
  def drain(): Iterator[(InternalRow, Seq[InternalRow])] = {
    val it = map.entrySet().iterator()
    new Iterator[(InternalRow, Seq[InternalRow])] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (InternalRow, Seq[InternalRow]) = {
        val e = it.next()
        (e.getKey, e.getValue.sortInPlace()(cmp).take(k).toSeq)
      }
    }
  }
}

/** Map-side phase: forwards at most k rows per key per input partition,
  * in Tungsten format, with no required distribution — it runs where the
  * data already is. This is what bounds the exchange.
  *
  * MEMORY BOUND: the per-key buffers live in an in-process map whose size
  * is (distinct keys in this partition) × ≤2k rows. When the buffered row
  * count passes `flushRows`, the operator FLUSHES — emits the current
  * survivors downstream and starts a fresh map. Sound because the final
  * phase re-merges: any row in the partition's true per-key top-k is in
  * the top-k of every batch that contains it, so the union of batch
  * survivors is a superset of the partition's survivors and the final
  * merge recovers the exact result. A flush trades extra exchange rows
  * (≤k more per key per flush) for bounded memory — the same
  * degrade-gracefully contract hash aggregation gets from spilling, with
  * no disk involved.
  */
case class GraftTopKPerKeyPartialExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    flushRows: Int = 4 << 20) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val order = ordering
    val limit = k
    val flushAt = flushRows
    child.execute().mapPartitions({ iter =>
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def refill(): Unit = {
          val buffers = new TopKBuffers(
            UnsafeProjection.create(keyExprs, childOutput),
            RowOrdering.create(order, childOutput), limit)
          while (iter.hasNext && buffers.bufferedRows < flushAt)
            buffers.insert(iter.next())
          // forward survivors unranked; the final phase re-merges anyway
          out = buffers.drain().flatMap(_._2)
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) refill()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering by key (EnsureRequirements
  * inserts the one hash exchange), merges the per-partition survivors,
  * and emits each key's final top-k with a 1-based `rank` appended.
  * Memory here is inherently bounded by its own OUTPUT: the exchange
  * delivers ≤ k·(upstream partitions + flushes) rows per key, and the
  * buffers prune to ≤2k per key as they merge. */
case class GraftTopKPerKeyFinalExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val order = ordering
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val buffers = new TopKBuffers(
        UnsafeProjection.create(keyExprs, childOutput),
        RowOrdering.create(order, childOutput), limit)
      iter.foreach(buffers.insert)
      val project = UnsafeProjection.create(outAttrs, childOutput :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      buffers.drain().flatMap { case (_, rows) =>
        rows.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, (i + 1).toLong)
          project(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKPerKeyFinalExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. */
object TopKPerKey {

  /** Top-k rows per key group under `orderBy` (each `(column, ascending)`),
    * with a `rank` column appended (1-based within the key group).
    * Plans through the custom operator pair; requires
    * [[GraftFunctions.register]] (or `GraftExtensions` at builder time)
    * to have injected [[GraftTopKStrategy]] into the session.
    *
    * Float/double KEY columns are value-normalized first (-0.0 → 0.0, any
    * NaN → the canonical NaN bit pattern) — the custom operator groups by
    * UnsafeRow byte equality and hash-partitions on raw bits, so without
    * this a 0.0/-0.0 key would split into two groups, diverging from Spark
    * SQL's grouping semantics (Catalyst inserts NormalizeFloatingNumbers
    * under groupBy for exactly this reason; a custom strategy must do its
    * own). `x + 0.0` is the IEEE-exact -0.0 fix; the normalized value also
    * replaces the column in the OUTPUT, matching what groupBy emits.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      flushRows: Int = 4 << 20): DataFrame = {
    import org.apache.spark.sql.functions.{col, isnan, lit, when}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val input = df.schema.fields
      .filter(f => keyCols.contains(f.name) &&
        (f.dataType == FloatType || f.dataType == DoubleType))
      .foldLeft(df) { (d, f) =>
        val c = col(f.name)
        d.withColumn(f.name,
          when(isnan(c), lit(Double.NaN).cast(f.dataType))
            .otherwise(c + lit(0.0).cast(f.dataType)))
      }
    val analyzed = input.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val ordering = orderBy.map { case (name, asc) =>
      if (asc) SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val rankAttr = AttributeReference("rank", LongType, nullable = false)()
    GraftPlanBridge.ofRows(df.sparkSession,
      GraftTopKPerKey(keyCols.map(attr), ordering, k, rankAttr, analyzed, flushRows))
  }
}
