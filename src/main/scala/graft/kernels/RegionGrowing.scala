package graft.kernels

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftCaches.Persistable

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
      .localCheckpointTracked(false)
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
      .localCheckpointTracked(false) // materialized by the frontier count below
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
        .localCheckpointTracked(false)
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
          layers = List(layers.reduce(_.union(_)).localCheckpointTracked(false))
      }
      prev = frontier
      frontier = newFrontier
      round += 1
    }
    layers.reduce(_.union(_))
  }

  /** G2 distributed — the adaptive threshold loop (`region_growing.py:
    * 100-147`) re-expressed as ONE labeled BFS instead of one grow pass
    * per θ step.
    *
    * Key identity: the reference's region at threshold θ is the connected
    * component of `{p : |v(p)−v(seed)|/255 ≤ θ}` containing the seed —
    * equivalently `{p : m(p) ≤ θ}` where `m(p)` is the MINIMAX PATH DELTA
    * (the minimum over seed→p paths of the maximum per-pixel delta along
    * the path, a bottleneck-shortest-path label). So a SINGLE
    * label-propagating BFS over the widest band computes the mask at
    * EVERY θ simultaneously, and the whole adaptation schedule —
    * per-image escalation `while size < minSize and θ < maxθ: θ += 0.05`
    * (checked before increment, so θ may overshoot maxθ by one step,
    * `region_growing.py:134-136`), the shrink restart stepping θ₀ down by
    * 0.01 while oversized, and the θ-floor keep-last-mask fallback
    * (`region_growing.py:138-145`) — collapses to a per-image θ selection
    * over an (images × |θ grid|)-row size table. Selection equivalence
    * rests on mask(θ) ⊆ mask(θ′) for θ ≤ θ′ (band monotonicity): "first
    * not-undersized ascending" = min such θ, "first not-oversized
    * descending" = max such θ.
    *
    * Labels are exact (max of per-pixel deltas — no accumulation), so
    * `m(p) ≤ θ` reproduces the per-pass `delta ≤ θ` filters bit-for-bit.
    * A round expands only last round's IMPROVED labels (delta iteration);
    * a label can improve after first assignment (a longer path with a
    * smaller bottleneck), which plain visited-set BFS would miss. The
    * driver holds only the θ grids and loop counters; per round ONE
    * action (the improved count) materializes the lazy checkpoints.
    * Replaces the former ~(escalation + shrink)-pass frontierJoin
    * schedule: ~10× fewer Spark jobs, one pixel scan either way.
    *
    * Returns converged masks `(image_id, y, x)` (no morphology — the
    * frontier variant's documented divergence).
    */
  def adaptiveFrontier(pixels: DataFrame, seeds: DataFrame,
      initialThreshold: Double = 0.1, maxThreshold: Double = 0.3,
      connectivity: Int = 8, minFrac: Double = 0.005, maxFrac: Double = 0.3,
      hops: Int = 4, maxRounds: Int = 10000,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val offsets =
      if (connectivity == 4) Seq((-1, 0), (0, 1), (1, 0), (0, -1))
      else Seq((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))

    // θ grids built by the SAME repeated float additions as the reference's
    // sequential loops, so grid values (and every m ≤ θ comparison) are
    // bit-identical to what the pass-per-θ form would have used.
    val escGrid = {
      val b = scala.collection.mutable.ArrayBuffer(initialThreshold)
      var t = initialThreshold
      while (t < maxThreshold - 1e-9) { t += 0.05; b += t }
      b.toSeq
    }
    val shrinkGrid = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      var t = initialThreshold
      while (t - 0.01 > 0.01 - 1e-9) { t -= 0.01; b += t }
      b.toSeq
    }
    val thetaGrid = (escGrid ++ shrinkGrid).distinct

    // Per-image state lives in DATAFRAMES keyed by image_id — the driver
    // holds only θ grids and loop counters, so plan size and driver memory
    // are independent of the image count. Lazy checkpoints throughout: the
    // one action per round (improved count) materializes the round's chain.
    val pxCounts = pixels.groupBy(col("image_id"))
      .agg(count(lit(1)).as("n_px")).localCheckpointTracked(false)

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
      .localCheckpointTracked(false)
    val poolBc =
      if (pool.count() <= maxBroadcastRows) broadcast(pool) else pool

    // ---- minimax-label BFS: best(p) converges to m(p) over the pool.
    // Seeds start at m = 0 (delta(seed) = 0 by construction) and — like
    // the layer-BFS form — appear in the output even when the seed
    // coordinate is missing from the pixel table.
    val seed0 = seeds.select(col("image_id"), col("seed_y").as("y"),
        col("seed_x").as("x"), lit(0.0).as("m"))
      .localCheckpointTracked(false)
    var best = seed0
    var frontier = seed0
    var frontierSize = frontier.count()
    var round = 0
    while (frontierSize > 0 && round < maxRounds) {
      // `hops` label expansions chained in ONE plan per round (same fixed-
      // cost amortization as frontierJoin): each hop joins the candidate
      // neighbours against the band pool and extends the bottleneck label
      // with the hop pixel's delta; a per-hop min-combine keeps the chain
      // from widening multiplicatively.
      var cur = frontier
      var acc: DataFrame = null
      for (_ <- 1 to hops) {
        cur = cur.select(col("image_id"), col("m"),
            explode(array(offsets.map { case (dy, dx) =>
              struct((col("y") + dy).as("y"), (col("x") + dx).as("x"))
            }: _*)).as("n"))
          .select(col("image_id"), col("n.y").as("y"), col("n.x").as("x"), col("m"))
          .join(poolBc, Seq("image_id", "y", "x"))
          .select(col("image_id"), col("y"), col("x"),
            greatest(col("m"), col("delta")).as("m"))
        acc = if (acc == null) cur else acc.union(cur)
      }
      // ONE min-combine per round (the hop joins above are map-side under
      // the broadcast cap, so the round pays a single exchange here)
      val candidate = acc.groupBy(col("image_id"), col("y"), col("x"))
        .agg(min(col("m")).as("m"))
      // delta iteration: only pixels whose label IMPROVED feed next round
      val improved = candidate
        .join(best.withColumnRenamed("m", "__bm"), Seq("image_id", "y", "x"), "left")
        .filter(col("__bm").isNull || col("m") < col("__bm"))
        .select(col("image_id"), col("y"), col("x"), col("m"))
        .localCheckpointTracked(false)
      frontierSize = improved.count() // the round's ONE action
      if (frontierSize > 0) {
        best = best.join(improved, Seq("image_id", "y", "x"), "left_anti")
          .union(improved)
          .localCheckpointTracked(false) // lazy; materialized by next round's count
        frontier = improved
      }
      round += 1
    }

    // ---- size table: |mask(θ)| per (image, grid θ). Each labeled pixel
    // buckets to the SMALLEST grid θ admitting it (map-side CASE chain),
    // so the cumulative sums below run on an (images × |grid|)-row frame,
    // never the pixel stream.
    val bucketExpr = thetaGrid.sorted.reverse
      .foldLeft(lit(null).cast("double")) { (acc, t) =>
        when(col("m") <= t, lit(t)).otherwise(acc)
      }
    val perBucket = best.select(col("image_id"), bucketExpr.as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("image_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val thetaLit = array(thetaGrid.map(lit): _*)
    val sizeTable = pxCounts
      .select(col("image_id"), col("n_px"), explode(thetaLit).as("theta"))
      .join(perBucket, Seq("image_id"), "left")
      .groupBy(col("image_id"), col("n_px"), col("theta"))
      .agg(sum(when(col("bucket") <= col("theta"), col("cnt")).otherwise(0L))
        .as("n_mask"))
      .select(col("image_id"), col("theta"),
        (coalesce(col("n_mask"), lit(0L)) < col("n_px") * minFrac).as("under"),
        (coalesce(col("n_mask"), lit(0L)) > col("n_px") * maxFrac).as("over"))
      .localCheckpointTracked(false)

    // ---- phase-1 selection: settle at the FIRST escalation θ that is not
    // undersized (= min, by band monotonicity), else the schedule's last θ
    // (which may overshoot maxθ by one step — the reference's quirk).
    val theta1 = sizeTable.filter(col("theta").isInCollection(escGrid))
      .groupBy(col("image_id"))
      .agg(coalesce(min(when(!col("under"), col("theta"))), lit(escGrid.last))
        .as("theta1"))
    // ---- phase-2 selection, for images oversized at their settle θ:
    // largest shrink-grid θ not oversized (= first not-over descending);
    // all-over keeps the floor θ's mask, exactly the keep-last-grown
    // fallback; an EMPTY shrink grid (θ₀ ≤ 0.02) keeps the phase-1 mask.
    val withOver1 = theta1.join(sizeTable, Seq("image_id"))
      .filter(col("theta") === col("theta1"))
      .select(col("image_id"), col("theta1"), col("over").as("over1"))
    val thetaStar =
      if (shrinkGrid.isEmpty) withOver1.select(col("image_id"), col("theta1").as("theta_star"))
      else {
        val theta2 = sizeTable.filter(col("theta").isInCollection(shrinkGrid))
          .groupBy(col("image_id"))
          .agg(coalesce(max(when(!col("over"), col("theta"))), lit(shrinkGrid.min))
            .as("theta2"))
        withOver1.join(theta2, Seq("image_id"), "left")
          .select(col("image_id"),
            when(col("over1"), col("theta2")).otherwise(col("theta1")).as("theta_star"))
      }

    best.join(thetaStar.hint("broadcast"), "image_id")
      .filter(col("m") <= col("theta_star"))
      .select(col("image_id"), col("y"), col("x"))
  }
}
