package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HeavyHitters, SpaceSavingAgg, SSBuf}

/** SpaceSaving sketch properties + the two-pass exact-heavy-hitter
  * contract: candidates are a superset of true heavy items, the recount
  * makes the final answer exact and partitioning-independent. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reduceAll(agg: SpaceSavingAgg, b: SSBuf, xs: Seq[String]): SSBuf =
    xs.foldLeft(b)(agg.reduce)

  test("SpaceSaving: capacity bound holds; >n/k item survives adversarial order") {
    val agg = new SpaceSavingAgg(4)
    // 40 items, 'hot' appears 15 times (> 40/4) — stream ordered so every
    // hot occurrence is followed by distinct cold keys fighting for slots
    val cold = (0 until 25).map(i => s"cold$i")
    val stream = (0 until 15).flatMap(i =>
      ("hot" +: cold.slice((i * 5) % 25, (i * 5) % 25 + 1)).toSeq) ++ cold.drop(15)
    val b = reduceAll(agg, agg.zero, stream)
    assert(b.keys.length <= 4, "capacity exceeded")
    assert(b.keys.contains("hot"), s"guaranteed heavy item evicted: ${b.keys.toSeq}")
  }

  test("SpaceSaving merge: truncate-after-sum keeps the globally heavy item") {
    val agg = new SpaceSavingAgg(3)
    // 'hot' is the plurality item in EVERY partition; merges must keep it
    val parts = (0 until 6).map(p =>
      Seq.fill(10)("hot") ++ (0 until 8).map(i => s"p${p}_$i"))
    val merged = parts.map(reduceAll(agg, agg.zero, _)).reduce(agg.merge)
    assert(merged.keys.length <= 3)
    assert(merged.keys.contains("hot"))
    val hotIdx = merged.keys.indexOf("hot")
    assert(merged.counts(hotIdx) >= 60L, "summed count must dominate")
  }

  test("exactHeavyHitters equals the full groupBy under any partitioning") {
    // zipfian-ish: term t_i appears (50 - i) times
    val rows = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"t$i"))
    val df = rows.toDF("term")
    val expected = df.groupBy("term").count().filter(col("count") >= 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (nPart <- Seq(1, 7)) {
      // capacity 64 >= n/minCount = 1275/30 ≈ 43 → guarantee applies
      val got = HeavyHitters.exactHeavyHitters(
          df.repartition(nPart), col("term"), minCount = 30L, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"nPart=$nPart: $got vs $expected")
    }
  }

  test("empty input and below-threshold input yield empty results") {
    assert(HeavyHitters.exactHeavyHitters(
      Seq.empty[String].toDF("t"), col("t"), 1L, 8).count() == 0L)
    assert(HeavyHitters.exactHeavyHitters(
      Seq("a", "b", "c").toDF("t"), col("t"), 2L, 8).count() == 0L)
  }
}
