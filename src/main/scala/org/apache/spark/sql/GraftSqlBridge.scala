package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** The two `private[sql]` touch points a library-defined physical operator
  * needs, isolated in one place: wrapping a custom resolved `LogicalPlan`
  * into a `DataFrame`, and registering a planner strategy on a live
  * session (the `SparkSessionExtensions` path covers
  * `spark.sql.extensions`-configured clusters; this covers sessions the
  * library does not construct). Nothing else in graft reaches into the
  * `org.apache.spark.sql` package namespace.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression through the SESSION's converter: the
    * static `ExpressionUtils.expression` wraps the column node lazily
    * (`ColumnNodeExpression`), which neither resolves under transformUp
    * nor serializes into a task. */
  def expression(spark: SparkSession, c: Column): catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Expression → Column (the inverse of [[expression]]): lets operators
    * build columns from library-defined catalyst expressions that carry
    * constructor state no FunctionRegistry builder can thread through
    * (e.g. a driver-collected PQ codebook reference). */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Whether this session can take planner strategies at runtime (a
    * classic JVM-backed session; e.g. Spark Connect sessions cannot). */
  def supportsStrategies(spark: SparkSession): Boolean =
    spark.isInstanceOf[classic.SparkSession]

  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy)) {
        exp.extraStrategies = exp.extraStrategies :+ strategy
      }
    }
  }
}
