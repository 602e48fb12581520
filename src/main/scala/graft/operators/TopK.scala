package graft.operators

import graft.plans.{TopKPerKey, TopKPerKeyStrategy}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, SortOrder}

/** DataFrame-facing API of the custom top-k-per-key operator
  * ([[graft.plans.TopKPerKey]]): exact top `k` rows for every key under
  * the given ordering, executed as bounded heaps (partial map-side phase,
  * one exchange of keys×k rows, final phase) — no per-key sort anywhere.
  * See the plan node's scaladoc for the scale argument. */
object TopK {

  /** @param orderCols ranking order, e.g. `col("score").desc,
    *                  col("id").asc` — make it TOTAL (add a tie-break)
    *                  for deterministic results */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    // Non-classic sessions (Spark Connect) cannot take planner strategies
    // at runtime; fall back to the row_number window formulation — same
    // rows (Window.orderBy defaults directionless columns to ascending,
    // exactly like the SortOrder default below), sort-based instead of
    // heap-based. `spark.graft.topk.forceWindowed` picks the same fallback
    // on demand — the A/B dial SpillProof uses to prove heap ≡ window
    // under memory pressure.
    if (!GraftSqlBridge.supportsStrategies(spark) ||
        spark.conf.get("spark.graft.topk.forceWindowed", "false").toBoolean)
      return windowed(df, keyCols, orderCols, k)
    GraftSqlBridge.addStrategy(spark, TopKPerKeyStrategy)
    val lp = df.queryExecution.analyzed
    // Resolve through df.col — Spark's own resolver — so case sensitivity,
    // duplicate-name ambiguity errors, and nested-field paths behave
    // exactly like every other DataFrame API (a name→attribute map would
    // silently bind duplicates to one side and break case-insensitivity).
    def named(n: String): Expression =
      try GraftSqlBridge.expression(spark, df.col(n))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"cannot resolve column '$n' against ${lp.output.map(_.name).mkString(", ")}", e)
      }
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute => named(u.name)
    }
    val order = orderCols.map(c => resolve(GraftSqlBridge.expression(spark, c)) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftSqlBridge.ofRows(spark, TopKPerKey(keyCols.map(named), order, k, lp))
  }

  /** Strategy-free formulation of the same contract. */
  private[graft] def windowed(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val rn = "__topk_rn"
    require(!df.columns.contains(rn), s"input must not contain reserved column '$rn'")
    df.withColumn(rn,
        row_number().over(Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
