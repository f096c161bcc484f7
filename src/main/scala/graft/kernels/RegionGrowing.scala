package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1/G2 — region-growing segmentation (`/root/reference/region_growing.py`).
  *
  * Two implementations, cross-checked in tests (SURVEY.md §5.4):
  *
  *  1. [[exact]] — faithful per-image BFS including the reference's quirks:
  *     admission criterion vs the SEED value (not region mean,
  *     `region_growing.py:86-87`); `max_iterations` counts DEQUEUED pixels,
  *     not BFS depth (`:67,92`); seed always in mask (`:64`); out-of-bounds
  *     seed throws (`:39-41`); morphological open(3×3)+close(5×5) post-pass
  *     (`:95-96`). Runs inside a UDF — parallel ACROSS images.
  *  2. [[frontierJoin]] — distributed Pregel-style frontier iteration over
  *     long-format pixels, for segmenting images too large for one task.
  *     Converges to the full connected region (no dequeue cap — documented
  *     divergence; with maxIterations=∞ and no post-pass the two agree).
  */
object RegionGrowing {

  /** Exact BFS. `img` is grayscale 0..255 (row-major), returns 0/1 mask.
    * `postProcess=false` skips the open/close pass (for cross-checks). */
  def exact(img: Array[Int], h: Int, w: Int, seedY: Int, seedX: Int,
      threshold: Double = 0.1, connectivity: Int = 8, maxIterations: Int = 100,
      postProcess: Boolean = true): Array[Int] = {
    if (seedY < 0 || seedY >= h || seedX < 0 || seedX >= w)
      throw new IllegalArgumentException(
        s"Seed point ($seedY, $seedX) is outside image bounds (${h}x$w)")
    val offsets: Array[(Int, Int)] =
      if (connectivity == 4) Array((-1, 0), (0, 1), (1, 0), (0, -1))
      else Array((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))
    val seedNorm = img(seedY * w + seedX).toDouble / 255.0
    val mask = new Array[Int](h * w)
    val queue = new java.util.ArrayDeque[Int]()
    queue.add(seedY * w + seedX)
    mask(seedY * w + seedX) = 1
    var iterations = 0
    while (!queue.isEmpty && iterations < maxIterations) {
      val cur = queue.poll()
      val cy = cur / w; val cx = cur % w
      var i = 0
      while (i < offsets.length) {
        val ny = cy + offsets(i)._1; val nx = cx + offsets(i)._2
        if (ny >= 0 && ny < h && nx >= 0 && nx < w && mask(ny * w + nx) == 0) {
          val nv = img(ny * w + nx).toDouble / 255.0
          if (math.abs(nv - seedNorm) <= threshold) {
            mask(ny * w + nx) = 1
            queue.add(ny * w + nx)
          }
        }
        i += 1
      }
      iterations += 1
    }
    if (postProcess) ImageKernels.openClose(mask, h, w) else mask
  }

  /** G2 — adaptive thresholding loop (`region_growing.py:100-147`):
    * grow threshold by 0.05 while region < 0.5% of pixels (up to maxThreshold);
    * if region > 30%, reset and shrink by 0.01 while > 30% and θ > 0.01.
    * Pure driver-side control flow re-invoking G1.
    */
  def adaptive(img: Array[Int], h: Int, w: Int, seedY: Int, seedX: Int,
      initialThreshold: Double = 0.1, maxThreshold: Double = 0.3,
      connectivity: Int = 8, maxIterations: Int = 100): Array[Int] = {
    val minSize = h * w * 0.005
    val maxSize = h * w * 0.3
    var theta = initialThreshold
    var mask = exact(img, h, w, seedY, seedX, theta, connectivity, maxIterations)
    var size = mask.sum
    while (size < minSize && theta < maxThreshold) {
      theta += 0.05
      mask = exact(img, h, w, seedY, seedX, theta, connectivity, maxIterations)
      size = mask.sum
    }
    if (size > maxSize) {
      theta = initialThreshold
      while (size > maxSize && theta > 0.01) {
        theta -= 0.01
        mask = exact(img, h, w, seedY, seedX, theta, connectivity, maxIterations)
        size = mask.sum
      }
    }
    mask
  }

  /** Distributed frontier iteration over long-format pixels
    * `(image_id, y, x, v)` with per-image seeds `(image_id, seed_y, seed_x)`.
    *
    * Each round: frontier ⋈ admissible-neighbour pixels, minus visited.
    * The admissible set (|v/255 − seed/255| ≤ θ) is precomputed ONCE and
    * cached per loop — each iteration is one shuffle-join keyed by
    * coordinates. `localCheckpoint` after each round cuts the growing
    * lineage (SURVEY.md §4 "iterative frontier loop"). Scales to images far
    * beyond single-task memory; at 1000 executors the join partitions by
    * (image_id, y, x) so every image's frontier expands in parallel.
    *
    * Returns the converged mask `(image_id, y, x)` (no iteration cap, no
    * morphology — see class doc).
    */
  def frontierJoin(pixels: DataFrame, seeds: DataFrame, threshold: Double,
      connectivity: Int = 8, maxRounds: Int = 10000, hops: Int = 4,
      maxBroadcastRows: Long = 1000000L, compactEvery: Int = 64,
      initial: Option[DataFrame] = None,
      admissiblePool: Option[DataFrame] = None): DataFrame = {
    val offsets =
      if (connectivity == 4) Seq((-1, 0), (0, 1), (1, 0), (0, -1))
      else Seq((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))

    // Broadcast hints are CONDITIONAL on a measured row count: a 10⁹-pixel
    // image's threshold band can be GBs, which would OOM the driver if
    // force-broadcast. Under the cap the hop joins and layer anti-joins run
    // map-side; over it they degrade gracefully to shuffle joins (and AQE
    // may still choose broadcast from its own runtime estimate).
    def maybeBroadcast(df: DataFrame, rows: Long): DataFrame =
      if (rows <= maxBroadcastRows) broadcast(df) else df

    // The admissible set is the threshold band around each seed value —
    // typically a small fraction of the image. Each round pays ONE shuffle
    // (the candidate distinct) when the band broadcasts.
    // LAZY checkpoint + count: the count materializes the checkpoint blocks
    // in the same job, so every loop frame costs ONE action instead of an
    // eager-checkpoint job plus a count job. Iterative operators run
    // hundreds of rounds; halving the per-round action count halves the
    // scheduler overhead that dominates them between data-bound stages.
    // When the caller supplies `admissiblePool` — a precomputed
    // (image_id, y, x, delta) band superset (see [[adaptiveFrontier]]) —
    // the band is a filter over the pool instead of a fresh scan+join of
    // the pixel table: the whole θ schedule then reads pixels ONCE.
    val admissibleBase = admissiblePool
      .map(_.filter(col("delta") <= threshold)
        .select(col("image_id"), col("y"), col("x")))
      .getOrElse {
        // seed values → admissible pixel set per image (one broadcast join)
        val seedVals = seeds.join(pixels,
            seeds("image_id") === pixels("image_id") &&
            seeds("seed_y") === pixels("y") && seeds("seed_x") === pixels("x"))
          .select(pixels("image_id"), pixels("v").as("seed_v"))
        pixels.join(seedVals.hint("broadcast"), "image_id")
          .filter(abs(col("v") / 255.0 - col("seed_v") / 255.0) <= threshold)
          .select(col("image_id"), col("y"), col("x"))
      }
      .localCheckpoint(false)
    val admissible = maybeBroadcast(admissibleBase, admissibleBase.count())

    // BFS-layer invariant: a neighbour of a layer-k pixel has BFS distance
    // ≥ k−1, so dedup per round only needs the CURRENT and PREVIOUS layers
    // — not the whole visited set. The per-round anti-join stays
    // constant-size instead of growing with the region, and the full mask
    // is the (disjoint) union of layers, assembled once at the end.
    // BFS start: the seed pixel, or — when regrowing at a WIDER band — a
    // caller-provided already-grown mask (`initial`). Starting from a set S
    // is equivalent to starting from the seed whenever S is connected to
    // the seed inside the band and S ⊆ band; the escalation path in
    // [[adaptiveFrontier]] satisfies both (the band is monotone in θ), and
    // skips re-walking the region it already grew. The BFS-distance dedup
    // proof below is distance-from-set, so it is start-set agnostic.
    val seed0 = initial.getOrElse(
        seeds.select(col("image_id"), col("seed_y").as("y"), col("seed_x").as("x")))
      .localCheckpoint(false) // materialized by the frontier count below
    var layers = List(seed0)
    var prev = seed0.limit(0)
    var prevSize = 0L
    var frontier = seed0
    var round = 0
    var frontierSize = frontier.count()
    // `hops` admissibility-checked expansions are CHAINED INSIDE ONE PLAN
    // per round, so the fixed per-round costs (checkpoint + count jobs)
    // amortize over `hops` BFS levels. Each hop re-checks admissibility, so
    // multi-hop never jumps an inadmissible wall; the two-layer dedup proof
    // extends to width-`hops` superlayers (a candidate reached from
    // superlayer k has distance > (k−2)·hops, so anti-joining the current
    // and previous superlayers suffices).
    while (frontierSize > 0 && round < maxRounds) {
      var cur = frontier
      var acc: DataFrame = null
      for (_ <- 1 to hops) {
        cur = cur.select(col("image_id"),
            explode(array(offsets.map { case (dy, dx) =>
              struct((col("y") + dy).as("y"), (col("x") + dx).as("x"))
            }: _*)).as("n"))
          .select(col("image_id"), col("n.y"), col("n.x"))
          .join(admissible, Seq("image_id", "y", "x"), "left_semi")
        acc = if (acc == null) cur else acc.union(cur)
      }
      val newFrontier = acc.distinct()
        .join(maybeBroadcast(frontier, frontierSize), Seq("image_id", "y", "x"), "left_anti")
        .join(maybeBroadcast(prev, prevSize), Seq("image_id", "y", "x"), "left_anti")
        .localCheckpoint(false)
      prevSize = frontierSize
      frontierSize = newFrontier.count() // materializes the checkpoint
      if (frontierSize > 0) {
        layers ::= newFrontier
        // Compact the accumulated layer list every `compactEvery` rounds: a
        // thin 10⁹-pixel structure can take thousands of BFS rounds, and one
        // union branch per round would grow the FINAL plan without bound
        // (thousands-child Union → analyzer/codegen blow-up). Layers are
        // disjoint, so a plain union preserves the mask; the localCheckpoint
        // truncates the folded branch to one leaf.
        if (layers.length >= compactEvery)
          layers = List(layers.reduce(_.union(_)).localCheckpoint(false))
      }
      prev = frontier
      frontier = newFrontier
      round += 1
    }
    layers.reduce(_.union(_))
  }

  /** G2 distributed — the adaptive threshold loop (`region_growing.py:
    * 100-147`) over the frontier-join variant, adapted PER IMAGE like the
    * reference: undersized images (< minFrac·pixels) re-grow at θ+0.05 up
    * to maxThreshold; images oversized after that (> maxFrac·pixels)
    * restart from the initial θ stepping down 0.01 while still oversized
    * and θ > 0.01. The driver holds only (image_id → θ) metadata — one
    * frontierJoin job per adaptation round over the still-adapting subset,
    * never a per-pixel collect.
    *
    * Returns converged masks `(image_id, y, x)` (no morphology — the
    * frontier variant's documented divergence).
    */
  def adaptiveFrontier(pixels: DataFrame, seeds: DataFrame,
      initialThreshold: Double = 0.1, maxThreshold: Double = 0.3,
      connectivity: Int = 8, minFrac: Double = 0.005, maxFrac: Double = 0.3): DataFrame = {
    // Per-image state (pixel counts, mask sizes, pending/oversized sets)
    // lives in DATAFRAMES keyed by image_id — the driver holds only the
    // global θ scalar and bounded-round DataFrame handles, so plan size and
    // driver memory are independent of the image count. The θ schedule is
    // global (every still-adapting image re-grows at the same θ), so the
    // loop trip count is bounded by the θ grid (~(maxθ−θ₀)/0.05 + θ₀/0.01
    // rounds), never by the number of images.
    // every loop frame below is a LAZY checkpoint: the one loop-condition
    // action per round (`isEmpty` on the adapt set) materializes the whole
    // round's chain, instead of an eager-checkpoint job per frame
    val pxCounts = pixels.groupBy(col("image_id"))
      .agg(count(lit(1)).as("n_px")).localCheckpoint(false)

    // ONE pixel scan for the WHOLE θ schedule: precompute each pixel's
    // seed distance and keep the superset band at the largest θ any pass
    // can use (the escalation may overshoot maxθ by one 0.05 step — the
    // reference's own quirk). Every grow pass filters this pool instead
    // of re-scanning and re-joining the pixel table; at 10⁹ pixels that
    // turns ~8 full scans into one.
    val maxTheta = math.max(initialThreshold, maxThreshold + 0.05) + 1e-9
    val seedVals = seeds.join(pixels,
        seeds("image_id") === pixels("image_id") &&
        seeds("seed_y") === pixels("y") && seeds("seed_x") === pixels("x"))
      .select(pixels("image_id"), pixels("v").as("seed_v"))
    val pool = pixels.join(seedVals.hint("broadcast"), "image_id")
      .withColumn("delta", abs(col("v") / 255.0 - col("seed_v") / 255.0))
      .filter(col("delta") <= maxTheta)
      .select(col("image_id"), col("y"), col("x"), col("delta"))
      .localCheckpoint(false)

    // `from`: masks already grown at a NARROWER band — escalation resumes
    // the BFS from them instead of re-walking the whole region from the
    // seed (sound because the band is monotone in θ; see frontierJoin).
    // Phase 2's shrink passes never reuse (the band contracts there).
    def growSubset(ids: DataFrame, theta: Double,
        from: Option[DataFrame] = None): DataFrame =
      frontierJoin(
        pixels.join(ids, Seq("image_id"), "left_semi"),
        seeds.join(ids, Seq("image_id"), "left_semi"),
        theta, connectivity,
        initial = from.map(_.join(ids, Seq("image_id"), "left_semi")),
        admissiblePool = Some(pool.join(ids, Seq("image_id"), "left_semi")))
    // (image_id, n_mask, over/under flags) for one grown round
    def sized(grown: DataFrame): DataFrame =
      grown.groupBy(col("image_id")).agg(count(lit(1)).as("n_mask"))
        .join(pxCounts, "image_id")
        .select(col("image_id"), col("n_mask"),
          (col("n_mask") < col("n_px") * minFrac).as("under"),
          (col("n_mask") > col("n_px") * maxFrac).as("over"))

    // phase 1: initial grow, escalate undersized (`while size < minSize
    // and θ < maxθ: θ += 0.05; regrow`). An image settles the round it
    // stops being undersized — or the round θ tops out.
    var theta = initialThreshold
    var pending = pxCounts.select(col("image_id")).localCheckpoint(false)
    var settled: DataFrame = null
    var fromMasks: Option[DataFrame] = None
    var done = false
    while (!done) {
      val grown = growSubset(pending, theta, fromMasks).localCheckpoint(false)
      val sz = sized(grown).localCheckpoint(false)
      val undersizedIds = sz.filter(col("under")).select(col("image_id")).localCheckpoint(false)
      // reference checks θ < maxθ BEFORE incrementing, so θ may overshoot
      // maxθ by one step (region_growing.py:134-136) — preserved
      val escalate = theta < maxThreshold - 1e-9 && !undersizedIds.isEmpty
      val settleNow =
        if (escalate) grown.join(undersizedIds, Seq("image_id"), "left_anti")
        else grown
      settled = if (settled == null) settleNow else settled.union(settleNow)
      if (escalate) { theta += 0.05; pending = undersizedIds; fromMasks = Some(grown) }
      else done = true
    }
    settled = settled.localCheckpoint(false)

    // phase 2: shrink oversized, restarting from the initial threshold.
    // Still-oversized images when θ hits the floor keep their last grown
    // mask, exactly like the per-image reference loop.
    var shrinkTheta = initialThreshold
    var oversizedIds = sized(settled).filter(col("over"))
      .select(col("image_id")).localCheckpoint(false)
    var result = settled.join(oversizedIds, Seq("image_id"), "left_anti")
    // Seed the θ-floor fallback with the PHASE-1 masks: the per-image
    // reference keeps whatever mask the last grow produced when the shrink
    // loop admits no pass (`region_growing.py:138-145`). With θ₀ ≤ 0.02 the
    // while guard below is false on entry, `lastGrown` would stay empty,
    // and the oversized images — already anti-joined out of `result` —
    // would silently vanish from the output.
    var lastGrown: DataFrame = settled
    while (!oversizedIds.isEmpty && shrinkTheta - 0.01 > 0.01 - 1e-9) {
      shrinkTheta -= 0.01
      val grown = growSubset(oversizedIds, shrinkTheta).localCheckpoint(false)
      val stillOver = sized(grown).filter(col("over"))
        .select(col("image_id")).localCheckpoint(false)
      result = result.union(grown.join(stillOver, Seq("image_id"), "left_anti"))
      oversizedIds = stillOver
      lastGrown = grown
    }
    if (!oversizedIds.isEmpty)
      result = result.union(lastGrown.join(oversizedIds, Seq("image_id"), "left_semi"))
    result
  }
}
