package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-edge quantile binning — the 100 TB replacement for
  * `ntile(n).over(Window.partitionBy(stratum).orderBy(value))`, whose
  * per-stratum TOTAL sort puts each stratum's full corpus slice on one
  * task (with ~5 languages that is the whole corpus across ~5 tasks).
  *
  * Scale shape: ONE pass of map-side-mergeable percentile sketches
  * (`approx_percentile` — Greenwald-Khanna summaries, partials combine in
  * the aggregate exchange exactly like a sum), one tiny edge row per
  * stratum broadcast back, and a STATELESS per-row bin assignment
  * (`1 + #edges strictly below the value`) that stays inside
  * WholeStageCodegen. No window, no per-stratum sort, no skew cliff: a
  * stratum 1000× larger than its siblings costs proportional sketch
  * merges, not a single 1000×-sized sort task.
  *
  * Determinism contract (what the DuckDB oracle reproduces): at stratum
  * cardinalities below `accuracy`, the GK summary never compresses, so
  * `approx_percentile(v, p)` is EXACTLY the value at rank ⌈p·n⌉ (1-based,
  * value-ordered) — the oracle computes that rank formula directly. Above
  * `accuracy` the edges are rank-approximate within the published
  * GK ε = 1/accuracy bound; bin assignment stays exact w.r.t. the edges.
  * Ties: equal values always land in the same bin (edges compare by
  * VALUE), unlike `ntile`, which splits ties across bins by position —
  * the sketch contract is the one that is stable under re-partitioning.
  */
object Binning {

  /** Evenly spaced interior quantile probabilities: i/numBins for
    * i ∈ [1, numBins). Exposed so oracles can interpolate the exact same
    * IEEE-double probabilities (correctly-rounded division == literal). */
  def probs(numBins: Int): Seq[Double] =
    (1 until numBins).map(_.toDouble / numBins)

  /** Per-stratum quantile edges: (stratum, __edges array<valueType>),
    * one row per stratum — broadcast-sized for any realistic stratum
    * count (languages, domains, sources). */
  def quantileEdges(
      df: DataFrame, valueCol: String, strataCol: String,
      numBins: Int, accuracy: Int = 1000000): DataFrame = {
    require(numBins >= 2, s"numBins=$numBins needs at least 2 bins")
    require(accuracy > 0, s"accuracy=$accuracy must be positive")
    df.groupBy(col(strataCol))
      .agg(percentile_approx(
        col(valueCol), lit(probs(numBins).toArray), lit(accuracy)).as("__edges"))
  }

  /** Assign every row its quantile bin (1-based): bin = 1 + number of
    * stratum edges strictly below the value. Edges arrive by broadcast
    * equi-join on the stratum; the assignment itself is codegen'd array
    * algebra. Rows whose value is NULL get a NULL bin (no rank position),
    * mirroring `ntile` input semantics. The join is LEFT so a NULL
    * stratum never drops rows: NULL never equi-matches its own edges
    * group, so those rows keep a NULL bin — the same rows-preserved,
    * bin-NULL shape the DuckDB oracle's LEFT JOIN produces. */
  def quantileBins(
      df: DataFrame, valueCol: String, strataCol: String,
      numBins: Int, binCol: String = "bin", accuracy: Int = 1000000): DataFrame = {
    require(!df.columns.contains("__edges"),
      "quantileBins input must not contain reserved column '__edges'")
    require(!df.columns.contains(binCol),
      s"quantileBins input already contains bin column '$binCol'")
    val edges = quantileEdges(df, valueCol, strataCol, numBins, accuracy)
    df.join(broadcast(edges), Seq(strataCol), "left")
      .withColumn(binCol,
        when(col(valueCol).isNotNull && col("__edges").isNotNull,
          lit(1) + size(filter(col("__edges"), e => col(valueCol) > e))))
      .drop("__edges")
  }

  /** Exact rank-based deciles via `ntile` — the SMALL-DATA cross-check
    * twin of [[quantileBins]] (per-stratum total sort; do not run at
    * corpus scale). Kept so specs can pin the sketch path against the
    * exact path where the contract says they agree. */
  def ntileBins(
      df: DataFrame, valueCol: String, strataCol: String,
      numBins: Int, tieBreak: Column, binCol: String = "bin"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(valueCol), tieBreak)
    df.withColumn(binCol, ntile(numBins).over(w))
  }
}
