package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.RegionGrowing
import graft.operators.Relational

/** G1/G2 semantics incl. the reference's quirks
  * (`/root/reference/region_growing.py:6-147`), plus the exact-vs-distributed
  * cross-check required by SURVEY.md §5.4. */
class RegionGrowingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5x5: a bright plus-shape (200) on dark background (10), diagonal pixel at corner
  private val h = 5; private val w = 5
  private val img: Array[Int] = {
    val a = Array.fill(h * w)(10)
    Seq((1, 2), (2, 1), (2, 2), (2, 3), (3, 2)).foreach { case (y, x) => a(y * w + x) = 200 }
    a(0) = 200 // corner pixel, unreachable from the plus-shape by 4-connectivity
    a
  }

  test("seed always in mask; growth admits |v/255 - seed/255| <= threshold vs SEED") {
    val m = RegionGrowing.exact(img, h, w, 2, 2, threshold = 0.05,
      connectivity = 4, maxIterations = 1000, postProcess = false)
    val got = (for { y <- 0 until h; x <- 0 until w if m(y * w + x) == 1 } yield (y, x)).toSet
    assert(got == Set((1, 2), (2, 1), (2, 2), (2, 3), (3, 2))) // plus-shape, corner unreachable by 4-conn
  }

  test("8-connectivity reaches diagonals that 4-connectivity cannot") {
    val diag = Array.fill(9)(10)
    diag(0) = 200; diag(4) = 200 // (0,0) and (1,1)
    val m4 = RegionGrowing.exact(diag, 3, 3, 0, 0, 0.05, 4, 1000, postProcess = false)
    val m8 = RegionGrowing.exact(diag, 3, 3, 0, 0, 0.05, 8, 1000, postProcess = false)
    assert(m4.sum == 1 && m8.sum == 2)
  }

  test("max_iterations counts DEQUEUED pixels, not BFS depth (region_growing.py:67,92)") {
    // constant image: everything admissible. cap=1 → only the seed is dequeued,
    // its neighbors are admitted to the mask but never expanded.
    val flat = Array.fill(25)(100)
    val m = RegionGrowing.exact(flat, 5, 5, 2, 2, 0.1, 4, maxIterations = 1, postProcess = false)
    assert(m.sum == 5) // seed + its 4 admitted neighbors
  }

  test("out-of-bounds seed throws (region_growing.py:39-41)") {
    intercept[IllegalArgumentException] {
      RegionGrowing.exact(img, h, w, -1, 0)
    }
  }

  test("G2 adaptive: threshold grows until region >= 0.5% of pixels") {
    // seed=100 surrounded by a 150-ring (diff 50/255 ≈ 0.196) on a 255
    // background: θ=0.1 and 0.15 give a lone seed (wiped by open/close →
    // size 0 < 0.5%), θ=0.2 admits the 3x3 blob, which is in [0.5%, 30%].
    val a = Array.fill(100)(255)
    for { y <- 4 to 6; x <- 4 to 6 } a(y * 10 + x) = 150
    a(5 * 10 + 5) = 100
    val m = RegionGrowing.adaptive(a, 10, 10, 5, 5, initialThreshold = 0.1,
      maxThreshold = 0.5, maxIterations = 100000)
    assert(m.sum == 9) // escalated threshold captured the whole blob
  }

  test("G2 distributed adaptiveFrontier: per-image escalation and shrink phases") {
    // image 0: lone seed at θ=0.1/0.15, 3x3 blob admitted at θ=0.2 (escalates twice)
    // image 1: 5x5 region within [min,max] at θ=0.1 (no adaptation)
    // image 2: whole image at θ=0.1 (oversized) → shrink to θ=0.09 → lone seed
    val px = scala.collection.mutable.ArrayBuffer[(Long, Int, Int, Int)]()
    for { y <- 0 until 12; x <- 0 until 12 } {
      val v0 = if (y == 6 && x == 6) 100
        else if (y >= 5 && y <= 7 && x >= 5 && x <= 7) 150 else 240
      px += ((0L, y, x, v0))
      val v1 = if (y >= 4 && y <= 8 && x >= 4 && x <= 8) 110 else 230
      px += ((1L, y, x, if (y == 6 && x == 6) 100 else v1))
      px += ((2L, y, x, if (y == 6 && x == 6) 100 else 124))
    }
    val pixels = px.toSeq.toDF("image_id", "y", "x", "v")
    val seeds = Seq((0L, 6, 6), (1L, 6, 6), (2L, 6, 6)).toDF("image_id", "seed_y", "seed_x")
    val masks = RegionGrowing.adaptiveFrontier(pixels, seeds,
      initialThreshold = 0.1, maxThreshold = 0.3, connectivity = 4,
      minFrac = 0.05, maxFrac = 0.3)
    val counts = masks.groupBy("image_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(0L) == 9L, s"img0 escalated blob: $counts")   // 3x3 at θ=0.2
    assert(counts(1L) == 25L, s"img1 stable region: $counts")   // 5x5 at θ=0.1
    assert(counts(2L) == 1L, s"img2 shrunk to seed: $counts")   // lone seed at θ=0.09
  }

  test("adaptiveFrontier keeps oversized images' phase-1 masks when θ₀ ≤ 0.02 (zero-trip shrink loop)") {
    // constant 8x8 image: the whole image is admissible at ANY θ, so it is
    // oversized (64 > 0.3·64) and the shrink loop at θ₀=0.01 never admits a
    // pass (guard needs θ₀ > 0.02). The reference keeps the last grown mask
    // (region_growing.py:138-145) — the image must survive with its full
    // phase-1 mask, not vanish.
    val pixels = (for { y <- 0 until 8; x <- 0 until 8 } yield (0L, y, x, 100))
      .toDF("image_id", "y", "x", "v")
    val seeds = Seq((0L, 4, 4)).toDF("image_id", "seed_y", "seed_x")
    val masks = RegionGrowing.adaptiveFrontier(pixels, seeds,
      initialThreshold = 0.01, maxThreshold = 0.3, connectivity = 4,
      minFrac = 0.005, maxFrac = 0.3)
    assert(masks.count() == 64L, "oversized image dropped by the zero-trip shrink loop")
  }

  test("frontierJoin compacts the layer list (bounded plan width on long corridors)") {
    // 1x100 corridor, hops=2 → ~25 superlayer rounds; compactEvery=8 folds
    // the accumulator repeatedly, so the FINAL plan's union width stays
    // bounded instead of one branch per round.
    val pixels = (0 until 100).map(x => (0L, 0, x, 100)).toDF("image_id", "y", "x", "v")
    val seeds = Seq((0L, 0, 0)).toDF("image_id", "seed_y", "seed_x")
    val mask = RegionGrowing.frontierJoin(pixels, seeds, threshold = 0.05,
      connectivity = 4, hops = 2, compactEvery = 8)
    val leaves = mask.queryExecution.logical.collectLeaves().size
    assert(leaves <= 12, s"layer list not compacted: $leaves plan leaves")
    assert(mask.count() == 100L)
  }

  test("frontierJoin agrees with exact (no cap, no post-process) — SURVEY §5.4 cross-check") {
    val pixels = (for { y <- 0 until h; x <- 0 until w }
      yield (1L, y, x, img(y * w + x))).toDF("image_id", "y", "x", "v")
    val seeds = Seq((1L, 2, 2)).toDF("image_id", "seed_y", "seed_x")
    val dist = RegionGrowing.frontierJoin(pixels, seeds, threshold = 0.05, connectivity = 4)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val exact = RegionGrowing.exact(img, h, w, 2, 2, 0.05, 4, Int.MaxValue, postProcess = false)
    val exactSet = (for { y <- 0 until h; x <- 0 until w if exact(y * w + x) == 1 } yield (y, x)).toSet
    assert(dist == exactSet)
  }

  test("frontierJoin resumed from a narrower-band mask equals growing from the seed") {
    // the adaptiveFrontier escalation contract: band(θ) ⊆ band(θ'), so
    // BFS from the θ-mask inside band(θ') reaches exactly the θ'-region
    val pixels = Relational.gradientImage(spark, 1, 16, 16)
      .select(col("image_id"), col("y").cast("int").as("y"),
        col("x").cast("int").as("x"), col("v").cast("int").as("v"))
    val seeds = Seq((0L, 3, 3)).toDF("image_id", "seed_y", "seed_x")
    val narrow = RegionGrowing.frontierJoin(pixels, seeds, threshold = 0.04, connectivity = 4)
    val fromSeed = RegionGrowing.frontierJoin(pixels, seeds, threshold = 0.12, connectivity = 4)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val resumed = RegionGrowing.frontierJoin(pixels, seeds, threshold = 0.12,
        connectivity = 4, initial = Some(narrow.select(col("image_id"), col("y"), col("x"))))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(narrow.count() > 1, "narrow-band mask should exceed the bare seed")
    assert(resumed == fromSeed)
    assert(fromSeed.size > narrow.count(), "wider band must strictly grow in this fixture")
  }
}
