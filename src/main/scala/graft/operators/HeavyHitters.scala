package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SpaceSaving summary buffer: up to `capacity` (key, count, err) entries
  * in parallel arrays (arrays encode through the product encoder; a
  * hash-map buffer would not). Lookups are linear in `capacity` — O(k)
  * per row with k a few hundred, the classic cache-friendly SpaceSaving
  * layout; a 100-TB deployment that wants k in the tens of thousands
  * should swap the scan for an open-addressed index, the algorithm is
  * unchanged. */
case class SSBuf(capacity: Int, var keys: Array[String],
    var counts: Array[Long], var errs: Array[Long])

/** Wrapper so the candidate list rides a plain product encoder. */
case class SSItems(items: Seq[String])

/** SPACESAVING (Metwally et al. 2005) as a typed Spark `Aggregator`:
  * one-pass heavy-hitter CANDIDATES in O(capacity) memory per partition,
  * merged with the truncate-after-sum rule of Agarwal et al.'s mergeable
  * summaries. The guarantee that matters downstream: any key with true
  * frequency > n/capacity is ALWAYS present in the final summary
  * (per-partition and surviving merges), so with `capacity` sized to the
  * target threshold the candidate set is a SUPERSET of the true heavy
  * hitters. Estimated counts carry up to `err` overcount and are NOT
  * emitted — [[HeavyHitters.exactHeavyHitters]] recounts candidates
  * exactly instead, which is what makes the result deterministic and
  * engine-reproducible (a sketch-count gate would depend on merge order).
  */
class SpaceSavingAgg(capacity: Int) extends Aggregator[String, SSBuf, SSItems] {
  require(capacity > 0)

  override def zero: SSBuf =
    SSBuf(capacity, Array.empty, Array.empty, Array.empty)

  override def reduce(b: SSBuf, x: String): SSBuf = {
    if (x == null) return b
    var i = 0
    val n = b.keys.length
    while (i < n && b.keys(i) != x) i += 1
    if (i < n) {
      b.counts(i) += 1L
    } else if (n < b.capacity) {
      b.keys = b.keys :+ x
      b.counts = b.counts :+ 1L
      b.errs = b.errs :+ 0L
    } else {
      // evict the minimum-count entry: its count becomes the new key's
      // overcount bound (the SpaceSaving step)
      var m = 0
      i = 1
      while (i < n) { if (b.counts(i) < b.counts(m)) m = i; i += 1 }
      b.errs(m) = b.counts(m)
      b.counts(m) += 1L
      b.keys(m) = x
    }
    b
  }

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    if (b.keys.isEmpty) return a
    if (a.keys.isEmpty) return b.copy(capacity = math.max(a.capacity, b.capacity))
    val idx = a.keys.zipWithIndex.toMap
    val extraK = scala.collection.mutable.ArrayBuffer.empty[String]
    val extraC = scala.collection.mutable.ArrayBuffer.empty[Long]
    val extraE = scala.collection.mutable.ArrayBuffer.empty[Long]
    var j = 0
    while (j < b.keys.length) {
      idx.get(b.keys(j)) match {
        case Some(i) =>
          a.counts(i) += b.counts(j)
          a.errs(i) += b.errs(j)
        case None =>
          extraK += b.keys(j); extraC += b.counts(j); extraE += b.errs(j)
      }
      j += 1
    }
    var keys = a.keys ++ extraK
    var counts = a.counts ++ extraC
    var errs = a.errs ++ extraE
    val cap = math.max(a.capacity, b.capacity)
    if (keys.length > cap) {
      // truncate-after-sum: keep the cap largest counts (ties on key for
      // determinism of the CANDIDATE set across merge orders)
      val order = counts.indices.sortBy(i => (-counts(i), keys(i))).take(cap)
      keys = order.map(keys).toArray
      counts = order.map(counts).toArray
      errs = order.map(errs).toArray
    }
    SSBuf(cap, keys, counts, errs)
  }

  override def finish(b: SSBuf): SSItems = SSItems(b.keys.toSeq.sorted)

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[SSItems] = Encoders.product[SSItems]
}

/** Heavy hitters without a full distinct-key count table. */
object HeavyHitters {

  /** EXACT heavy hitters, two passes, bounded memory:
    *
    *  1. [[SpaceSavingAgg]] over the keys — O(capacity) state per
    *     partition, candidates collected to the driver (≤ `capacity`
    *     strings: a bounded summary like IVF centroids, NOT a data
    *     collect);
    *  2. exact recount of ONLY the candidates — the `isInCollection`
    *     filter runs map-side at the scan, so the groupBy's key space is
    *     ≤ `capacity` instead of the full vocabulary.
    *
    * With `minCount ≥ totalRows/capacity` the SpaceSaving superset
    * guarantee makes this EQUAL to the full `groupBy.count.filter` — at a
    * shuffle of ≤ capacity keys instead of every distinct key in 100 TB.
    * The result carries exact counts, so it is deterministic however the
    * sketch's merges ordered themselves.
    */
  def exactHeavyHitters(df: DataFrame, key: Column, minCount: Long,
      capacity: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("key"))
    val candidates = keyed.as[String]
      .select(new SpaceSavingAgg(capacity).toColumn)
      .head().items
    keyed.filter(col("key").isInCollection(candidates))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
