package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mask set-algebra and segmentation metrics (SURVEY.md §2.E/F).
  *
  * The reference treats a binary mask as a set of pixel coordinates and
  * computes every metric with element-wise logical ops
  * (`/root/reference/evaluation.py:62-157`). We carry masks in two shapes:
  *
  *  - '''aligned long format''' `(group, ..., p, g)` with p,g ∈ {0,1}: one
  *    row per pixel, both masks as indicator columns. All metrics become a
  *    SINGLE hash-aggregate pass (partial/final, map-side combined) — at
  *    100 TB this is one shuffle of tiny partial buffers, no join at all.
  *  - '''coordinate sets''' `(group, y, x)` holding only in-mask pixels:
  *    set algebra = joins (F1 inner, F3 anti, F2 union). Used when masks
  *    are sparse; the smaller side broadcasts.
  */
object MaskAlgebra {

  /** All confusion-derived metrics in one aggregation pass over aligned
    * indicator columns. Semantics (with reference line numbers):
    *  - area  = Σp                    (E4, `evaluation.py:23`)
    *  - Dice  = 2|P∩G|/(|P|+|G|), both-empty → 1.0 (E6, `:88-91`)
    *  - Jaccard = |P∩G|/|P∪G|, union-empty → 1.0 (E7, `:120-123`)
    *  - sensitivity = TP/(TP+FN), 0 on zero denominator (E9, `:154`)
    *  - specificity = TN/(TN+FP), 0 on zero denominator (E9, `:155`)
    */
  def confusionMetrics(df: DataFrame, group: Seq[Column], p: Column, g: Column): DataFrame = {
    val pl = p.cast("long"); val gl = g.cast("long")
    df.groupBy(group: _*)
      .agg(
        sum(pl * gl).as("tp"),
        sum((lit(1L) - pl) * gl).as("fn"),
        sum(pl * (lit(1L) - gl)).as("fp"),
        sum((lit(1L) - pl) * (lit(1L) - gl)).as("tn"),
        sum(pl).as("area_p"),
        sum(gl).as("area_g"))
      .withColumn("dice",
        when(col("area_p") + col("area_g") === 0, lit(1.0))
          .otherwise(lit(2.0) * col("tp") / (col("area_p") + col("area_g"))))
      .withColumn("jaccard",
        when(col("tp") + col("fn") + col("fp") === 0, lit(1.0))
          .otherwise(col("tp") / (col("tp") + col("fn") + col("fp")).cast("double")))
      .withColumn("sensitivity",
        coalesce(col("tp") / nullif(col("tp") + col("fn"), lit(0)).cast("double"), lit(0.0)))
      .withColumn("specificity",
        coalesce(col("tn") / nullif(col("tn") + col("fp"), lit(0)).cast("double"), lit(0.0)))
  }

  /** F1 — mask intersection as an inner equi-join of coordinate sets
    * (`np.logical_and`, `/root/reference/evaluation.py:83`). */
  def intersect(pred: DataFrame, gt: DataFrame, keys: Seq[String]): DataFrame =
    pred.join(gt, keys, "inner").select(keys.map(col): _*)

  /** F2 — mask union (`np.logical_or`, `evaluation.py:117`). */
  def union(pred: DataFrame, gt: DataFrame, keys: Seq[String]): DataFrame =
    pred.select(keys.map(col): _*).union(gt.select(keys.map(col): _*)).distinct()

  /** F3 — mask difference pred∖gt (`np.logical_and(pred, ~gt)`,
    * `evaluation.py:150`) as an anti-join. */
  def diff(pred: DataFrame, gt: DataFrame, keys: Seq[String]): DataFrame =
    pred.join(gt, keys, "left_anti").select(keys.map(col): _*)

  /** Boundary pixels of a mask held as a coordinate set: in-mask pixels with
    * at least one 4-neighbour NOT in the mask. Relational stand-in for the
    * contour-based perimeter (E15, `/root/reference/evaluation.py:26-32`) —
    * documented as a different (pixel-count) perimeter measure; the exact
    * OpenCV arcLength lives in [[graft.kernels.Contours]].
    *
    * Implementation: expand each pixel to its 4 neighbours (explode — 4×
    * row blow-up, narrow), then LEFT ANTI join back against the mask and
    * count distinct source pixels with a missing neighbour. Both sides hash
    * on (group,y,x); skew-free since images are uniform.
    */
  def boundaryPixels(mask: DataFrame, group: String, y: String, x: String): DataFrame = {
    val offsets = Seq((-1, 0), (1, 0), (0, -1), (0, 1))
    val nbrs = mask.select(
      col(group), col(y), col(x),
      explode(array(offsets.map { case (dy, dx) =>
        struct((col(y) + dy).as("ny"), (col(x) + dx).as("nx"))
      }: _*)).as("nbr"))
      .select(col(group), col(y), col(x), col("nbr.ny"), col("nbr.nx"))
    // neighbour not in mask (or out of image — absent rows cover both)
    nbrs.join(
        mask.select(col(group).as("g2"), col(y).as("y2"), col(x).as("x2")),
        col(group) === col("g2") && col("ny") === col("y2") && col("nx") === col("x2"),
        "left_anti")
      .select(col(group), col(y), col(x))
      .distinct()
  }

  /** E10+E11 — masked-region means and the tumor-probability score
    * (`/root/reference/utils.py:105-161`). Input: aligned pixels
    * `(group, v, in_mask, perimeter)` where perimeter is the per-group
    * perimeter measure to use for compactness. One aggregate pass:
    *   contrast = μ_in/(μ_out+1e-6); size_ratio = |mask|/N;
    *   compactness = 4π·area/(perim²+1e-6);
    *   score = min(1, 0.4·min(contrast/2,1) + 0.3·max(0,1−|size−0.05|/0.1)
    *                 + 0.3·min(compactness,1));  empty mask → 0.0 (`:136-137`).
    */
  def tumorProbability(df: DataFrame, group: Seq[Column], v: Column, inMask: Column,
      perimeter: Column): DataFrame = {
    val m = inMask.cast("long")
    df.groupBy(group: _*)
      .agg(
        sum(m).as("tumor_area"),
        count(lit(1)).as("n_pixels"),
        avg(when(m === 1, v.cast("double"))).as("tumor_mean_raw"),
        avg(when(m === 0, v.cast("double"))).as("non_tumor_mean"),
        first(perimeter).as("perimeter"))
      .withColumn("tumor_mean", coalesce(col("tumor_mean_raw"), lit(0.0))).drop("tumor_mean_raw")
      .withColumn("contrast_ratio", col("tumor_mean") / (col("non_tumor_mean") + lit(1e-6)))
      .withColumn("size_ratio", col("tumor_area") / col("n_pixels").cast("double"))
      .withColumn("compactness",
        lit(4.0 * math.Pi) * col("tumor_area") /
          (col("perimeter") * col("perimeter") + lit(1e-6)))
      .withColumn("probability",
        when(col("tumor_area") === 0, lit(0.0)).otherwise(
          least(lit(1.0),
            lit(0.4) * least(col("contrast_ratio") / 2.0, lit(1.0)) +
            lit(0.3) * greatest(lit(0.0), lit(1.0) - abs(col("size_ratio") - 0.05) / lit(0.1)) +
            lit(0.3) * least(col("compactness"), lit(1.0)))))
  }

  /** E16 — circularity `4π·area/perimeter²`, 0 when perimeter = 0
    * (`/root/reference/evaluation.py:34-38`). */
  def circularity(area: Column, perimeter: Column): Column =
    when(perimeter > 0, lit(4.0 * math.Pi) * area / (perimeter * perimeter))
      .otherwise(lit(0.0))

  /** E14 (partial) — ellipse second-moment properties from a coordinate-set
    * mask, the moments-based part of `skimage.measure.regionprops`
    * (`/root/reference/evaluation.py:41-58`): centroid, central second
    * moments, major/minor axis lengths and eccentricity via the moments
    * eigenvalues. Solidity (convex hull) stays a kernel (`graft.kernels`).
    * Pure aggregates — one pass, no joins.
    *
    * skimage formulas: mu20' = mu20 + 1/12 (pixel self-covariance),
    * axes = 4·sqrt(eigenvalue), ecc = sqrt(1 − λ2/λ1).
    */
  def regionEllipse(mask: DataFrame, group: Seq[Column], y: Column, x: Column): DataFrame = {
    mask.groupBy(group: _*)
      .agg(
        count(lit(1)).cast("double").as("area"),
        avg(y.cast("double")).as("cy"),
        avg(x.cast("double")).as("cx"),
        covar_pop(y.cast("double"), y.cast("double")).as("mu20"),
        covar_pop(x.cast("double"), x.cast("double")).as("mu02"),
        covar_pop(y.cast("double"), x.cast("double")).as("mu11"))
      .withColumn("m20", col("mu20") + lit(1.0 / 12.0))
      .withColumn("m02", col("mu02") + lit(1.0 / 12.0))
      .withColumn("common",
        sqrt(pow(col("m20") - col("m02"), 2) + lit(4.0) * pow(col("mu11"), 2)))
      .withColumn("l1", (col("m20") + col("m02") + col("common")) / 2.0)
      .withColumn("l2", (col("m20") + col("m02") - col("common")) / 2.0)
      .withColumn("major_axis_length", lit(4.0) * sqrt(col("l1")))
      .withColumn("minor_axis_length", lit(4.0) * sqrt(greatest(col("l2"), lit(0.0))))
      .withColumn("eccentricity",
        when(col("l1") > 0, sqrt(lit(1.0) - greatest(col("l2"), lit(0.0)) / col("l1")))
          .otherwise(lit(0.0)))
      .drop("mu20", "mu02", "m20", "m02", "common")
  }
}
