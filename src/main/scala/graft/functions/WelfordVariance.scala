package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing sample variance with
  * Welford/Chan's parallel update — the sketch-style aggregation surface
  * (SURVEY §7: custom `Aggregator` where built-ins don't reach). The merge
  * is the pairwise-combine form, so partial aggregation distributes: each
  * partition folds locally, partials merge associatively — exactly the
  * map-side-combine contract a 100 TB aggregation needs. Numerically this
  * beats the naive E[x²]−E[x]² form the moment means dwarf deviations.
  *
  * Registered as a UDAF via `functions.udaf`; result matches `var_samp`
  * bit-for-bit on the same partition fold order, and to rounding across
  * engines (the oracle check).
  */
object WelfordVariance extends Aggregator[Double, WelfordBuf, Double] {

  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }
  }

  override def finish(r: WelfordBuf): Double =
    if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

final case class WelfordBuf(n: Long, mean: Double, m2: Double)
