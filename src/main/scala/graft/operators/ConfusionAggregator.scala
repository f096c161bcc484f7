package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass typed aggregator over paired mask indicators — the
  * Catalyst-native form of SURVEY §7.1 flourish (1): one traversal of
  * `(pred, gt)` pairs produces every confusion-derived metric, with the
  * reference's exact edge rules (`/root/reference/evaluation.py:88-91,
  * 120-123, 154-155`): both-empty → Dice = Jaccard = 1, zero denominators
  * → 0. Partial buffers are 4 longs — map-side combine ships 32 bytes per
  * partition regardless of data size.
  */
case class ConfusionBuf(var tp: Long, var fn: Long, var fp: Long, var tn: Long)

case class ConfusionResult(
    tp: Long, fn: Long, fp: Long, tn: Long,
    dice: Double, jaccard: Double, sensitivity: Double, specificity: Double)

class ConfusionAggregator extends Aggregator[(Boolean, Boolean), ConfusionBuf, ConfusionResult] {

  override def zero: ConfusionBuf = ConfusionBuf(0L, 0L, 0L, 0L)

  override def reduce(b: ConfusionBuf, a: (Boolean, Boolean)): ConfusionBuf = {
    val (p, g) = a
    if (p && g) b.tp += 1
    else if (!p && g) b.fn += 1
    else if (p && !g) b.fp += 1
    else b.tn += 1
    b
  }

  override def merge(a: ConfusionBuf, b: ConfusionBuf): ConfusionBuf =
    ConfusionBuf(a.tp + b.tp, a.fn + b.fn, a.fp + b.fp, a.tn + b.tn)

  override def finish(b: ConfusionBuf): ConfusionResult = {
    val areaP = b.tp + b.fp
    val areaG = b.tp + b.fn
    val dice = if (areaP + areaG == 0) 1.0 else 2.0 * b.tp / (areaP + areaG)
    val union = b.tp + b.fn + b.fp
    val jaccard = if (union == 0) 1.0 else b.tp.toDouble / union
    val sens = if (b.tp + b.fn == 0) 0.0 else b.tp.toDouble / (b.tp + b.fn)
    val spec = if (b.tn + b.fp == 0) 0.0 else b.tn.toDouble / (b.tn + b.fp)
    ConfusionResult(b.tp, b.fn, b.fp, b.tn, dice, jaccard, sens, spec)
  }

  override def bufferEncoder: Encoder[ConfusionBuf] = Encoders.product[ConfusionBuf]
  override def outputEncoder: Encoder[ConfusionResult] = Encoders.product[ConfusionResult]
}
