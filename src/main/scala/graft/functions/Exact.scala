package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer column arithmetic shared across operators. */
object Exact {

  /** Portable exact floor division for NON-NEGATIVE 64-bit operands:
    * `(a - a mod b) / b` stays in integer arithmetic end to end (the
    * final double division is exact because the numerator is a multiple
    * of b and both fit 53-bit mantissas at the magnitudes the operators
    * quantize to). Yields NULL on b = 0 — callers own that edge
    * (coalesce where a zero-divisor is reachable). One definition so
    * the division semantics cannot drift between operators. */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")
}
