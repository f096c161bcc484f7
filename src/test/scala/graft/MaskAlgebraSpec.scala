package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaskAlgebra

/** E4/E6/E7/E9 mask-metric semantics against the FIXTURES.md §4 cases
  * (reference: `/root/reference/evaluation.py:62-157`). */
class MaskAlgebraSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def metrics(pairs: Seq[(Int, Int)]): (Double, Double, Double, Double) = {
    val df = pairs.zipWithIndex.map { case ((p, g), i) => (i, p, g) }.toDF("i", "p", "g")
    val r = MaskAlgebra.confusionMetrics(df, Seq(lit(1).as("k")), col("p"), col("g")).head()
    (r.getAs[Double]("dice"), r.getAs[Double]("jaccard"),
      r.getAs[Double]("sensitivity"), r.getAs[Double]("specificity"))
  }

  test("both masks empty → Dice = Jaccard = 1.0 (evaluation.py:88-93,120-125)") {
    val (d, j, _, spec) = metrics(Seq((0, 0), (0, 0), (0, 0)))
    assert(d == 1.0 && j == 1.0 && spec == 1.0)
  }

  test("disjoint non-empty → Dice = Jaccard = sensitivity = 0") {
    val (d, j, sens, _) = metrics(Seq((1, 0), (0, 1), (0, 0)))
    assert(d == 0.0 && j == 0.0 && sens == 0.0)
  }

  test("identical masks → all 1.0") {
    val (d, j, sens, spec) = metrics(Seq((1, 1), (1, 1), (0, 0)))
    assert(d == 1.0 && j == 1.0 && sens == 1.0 && spec == 1.0)
  }

  test("half-overlap: Dice = 1/2, Jaccard = 1/3, and J = D/(2−D)") {
    // pred = {a,b}, gt = {b,c}: ∩=1, sizes 2+2 → D=2/4=0.5, J=1/3
    val (d, j, _, _) = metrics(Seq((1, 0), (1, 1), (0, 1)))
    assert(d == 0.5 && math.abs(j - 1.0 / 3) < 1e-12)
    assert(math.abs(j - d / (2 - d)) < 1e-12)
  }

  test("gt empty, pred non-empty → sensitivity 0 (zero-denominator rule)") {
    val (_, _, sens, _) = metrics(Seq((1, 0), (1, 0)))
    assert(sens == 0.0)
  }

  test("pred full, gt full → specificity 0 (TN+FP = 0 → 0)") {
    val (_, _, _, spec) = metrics(Seq((1, 1), (1, 1)))
    assert(spec == 0.0)
  }

  test("F1/F2/F3 coordinate-set algebra matches indicator-column counts") {
    val pred = Seq((1L, 0, 0), (1L, 0, 1), (1L, 1, 0)).toDF("image_id", "y", "x")
    val gt = Seq((1L, 0, 1), (1L, 1, 0), (1L, 1, 1)).toDF("image_id", "y", "x")
    val keys = Seq("image_id", "y", "x")
    assert(MaskAlgebra.intersect(pred, gt, keys).count() == 2)
    assert(MaskAlgebra.union(pred, gt, keys).count() == 4)
    assert(MaskAlgebra.diff(pred, gt, keys).count() == 1)
  }

  test("boundary pixels of a solid 3x3 block = 8 (interior pixel excluded)") {
    val mask = (for { y <- 0 until 3; x <- 0 until 3 } yield (1L, y, x))
      .toDF("image_id", "y", "x")
    assert(MaskAlgebra.boundaryPixels(mask, "image_id", "y", "x").count() == 8)
  }

  test("E16 circularity: perfect-square approximation and zero-perimeter guard") {
    val df = Seq((100L, 0L)).toDF("a", "p")
      .select(MaskAlgebra.circularity(col("a"), col("p")).as("c"))
    assert(df.as[Double].head() == 0.0)
  }
}
