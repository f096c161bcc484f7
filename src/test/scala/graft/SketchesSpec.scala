package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

/** Count-min sketch contracts: never undercounts, merges by counter
  * addition, stays within its fixed depth×width footprint, and hashes with
  * the engine's replayable poly31 family (pinned against a Scala fold).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 144115188075855859L
  private def poly31(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => Math.floorMod(h * 31L + b, M))

  private def skewed = (Seq.fill(40)("hot") ++ (0 until 60).map(i => s"k$i"))
    .toDF("key")

  test("cmsEstimate never undercounts any key; exact when width is collision-free") {
    val exact = skewed.groupBy(col("key")).agg(count(lit(1)).as("n"))
    // width 8: heavy collisions — estimates must still be upper bounds
    val tight = Sketches.cmsCounters(skewed, col("key"), depth = 3, width = 8)
    val est = Sketches.cmsEstimate(tight, skewed, col("key"), 3, 8)
      .join(exact, col("__k") === col("key"))
      .select(col("key"), col("cms_est"), col("n"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty && est.forall { case (_, e, n) => e >= n })
    assert(est.exists { case (_, e, n) => e > n },
      "width 8 over 61 keys must actually collide, or the test is vacuous")
    // width 4096 over 61 keys: every estimate should be exact
    val wide = Sketches.cmsCounters(skewed, col("key"), depth = 3, width = 4096)
    val exactEst = Sketches.cmsEstimate(wide, skewed, col("key"), 3, 4096)
      .join(exact, col("__k") === col("key"))
      .filter(col("cms_est") =!= col("n")).count()
    assert(exactEst === 0L)
  }

  test("counter table is bounded by depth×width and counts sum to depth×N") {
    val counters = Sketches.cmsCounters(skewed, col("key"), depth = 4, width = 8)
      .collect()
    assert(counters.length <= 4 * 8)
    // every row lands in exactly one bucket per depth row
    assert(counters.map(r => r.getLong(2)).sum === 4L * 100)
  }

  test("merge = counter addition: sketch(A∪B) equals sketch(A) + sketch(B)") {
    val a = (0 until 50).map(i => s"x$i").toDF("key")
    val b = (25 until 80).map(i => s"x$i").toDF("key")
    val merged = Sketches.cmsCounters(a, col("key"), 3, 16)
      .unionByName(Sketches.cmsCounters(b, col("key"), 3, 16))
      .groupBy(col("j"), col("bucket")).agg(sum(col("counter")).as("counter"))
    val direct = Sketches.cmsCounters(a.unionByName(b), col("key"), 3, 16)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("cmsJoinSizeEstimate: never under the true join size; exact when collision-free") {
    // A: key i appears i+1 times for i<5; B: each key once -> |A⋈B| = 15
    val a = (0 until 5).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("key")
    val b = (0 until 5).map(i => s"k$i").toDF("key")
    val trueSize = 15L
    // wide: 5 keys cannot collide in 4096 buckets under any of 3 hash rows
    val wide = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsCounters(a, col("key"), 3, 4096),
      Sketches.cmsCounters(b, col("key"), 3, 4096))
      .as[Long].head()
    assert(wide === trueSize)
    // narrow: collisions only ADD (cross terms are products of counts)
    val narrow = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsCounters(a, col("key"), 3, 2),
      Sketches.cmsCounters(b, col("key"), 3, 2))
      .as[Long].head()
    assert(narrow >= trueSize)
  }

  test("bucket hash is the replayable poly31 family, not a JVM-private hash") {
    val keys = Seq("alice", "bob", "42").toDF("key")
    val got = Sketches.cmsCounters(keys, col("key"), depth = 2, width = 64)
      .select(col("j"), col("bucket")).as[(Int, Long)].collect().toSet
    val expect = (for (k <- Seq("alice", "bob", "42"); j <- 0 until 2)
      yield (j, Math.floorMod(poly31(s"$k#$j"), 64L))).toSet
    assert(got === expect)
  }
}
