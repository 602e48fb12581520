package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis (view → click → purchase): for each
  * entity, stage i qualifies only with an event of stage i's type at or
  * after the entity's chosen stage-(i−1) event, using
  * earliest-qualifying-event semantics at every stage (the standard
  * unwindowed product-analytics funnel — greedy, order-respecting).
  *
  * Shape at 100 TB: stage i is one equi-join (events of that type ×
  * stage-(i−1) survivors) and one min-aggregate, BOTH keyed on the
  * entity — after the first exchange every subsequent join and groupBy
  * reuses the same hash partitioning, so the chain costs one shuffle of
  * each stage's event slice, never a window over an entity's full
  * history and never a cross-stage sort. Survivor frames shrink
  * monotonically (stage k+1 joins against stage k's output), so later
  * stages get cheaper, not wider.
  */
object Funnel {

  /** Per-entity funnel timestamps: one row per entity that completed
    * stage 0, with `stage_i_ts` = the entity's earliest qualifying
    * stage-i event time (null once a stage is missed; later stages of a
    * missed stage are null by construction).
    *
    * @param stageTypes ordered `typeCol` values defining the funnel */
  def stages(
      events: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      stageTypes: Seq[String]): DataFrame = {
    require(stageTypes.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(entityCol), col(typeCol), col(tsCol))
    var acc = ev.filter(col(typeCol) === stageTypes.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("stage_0_ts"))
    stageTypes.zipWithIndex.drop(1).foreach { case (t, i) =>
      val prev = s"stage_${i - 1}_ts"
      val next = ev.filter(col(typeCol) === t)
        .join(acc.select(col(entityCol), col(prev)), Seq(entityCol))
        .filter(col(tsCol) >= col(prev))
        .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"stage_${i}_ts"))
      acc = acc.join(next, Seq(entityCol), "left")
    }
    acc
  }

  /** Windowed funnel: like [[stages]], but every later stage must also
    * land within `windowLen` of the entity's stage-0 event (the standard
    * product-analytics "converted within T" funnel). Identical join +
    * min-aggregate shape — the conversion window is ONE extra residual
    * predicate on each stage join, evaluated before the aggregate, so the
    * 100 TB cost argument of [[stages]] carries over unchanged (and the
    * window makes each stage's join slice strictly smaller).
    *
    * @param windowLen max `tsCol` distance from the stage-0 event, in the
    *                  column's own unit (inclusive) */
  def stagesWindowed(
      events: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      stageTypes: Seq[String], windowLen: Long): DataFrame = {
    require(stageTypes.nonEmpty, "funnel needs at least one stage")
    require(windowLen >= 0, s"windowLen=$windowLen must be non-negative")
    val ev = events.select(col(entityCol), col(typeCol), col(tsCol))
    var acc = ev.filter(col(typeCol) === stageTypes.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("stage_0_ts"))
    stageTypes.zipWithIndex.drop(1).foreach { case (t, i) =>
      val prev = s"stage_${i - 1}_ts"
      val carry =
        if (i == 1) Seq(col(entityCol), col("stage_0_ts"))
        else Seq(col(entityCol), col("stage_0_ts"), col(prev))
      val next = ev.filter(col(typeCol) === t)
        .join(acc.select(carry: _*), Seq(entityCol))
        .filter(col(tsCol) >= col(prev) &&
          col(tsCol) <= col("stage_0_ts") + lit(windowLen))
        .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"stage_${i}_ts"))
      acc = acc.join(next, Seq(entityCol), "left")
    }
    acc
  }

  /** Funnel census: entities reaching each stage plus the step conversion
    * rate — the one-row summary a dashboard reads. */
  def census(perEntity: DataFrame, stageTypes: Seq[String]): DataFrame = {
    val counts: Seq[Column] = stageTypes.indices.map(i =>
      count(col(s"stage_${i}_ts")).as(s"n_${stageTypes(i)}"))
    val rates: Seq[Column] = stageTypes.indices.drop(1).map(i =>
      round(count(col(s"stage_${i}_ts")).cast("double") /
        count(col(s"stage_${i - 1}_ts")), 4).as(s"rate_${stageTypes(i)}"))
    perEntity.agg((counts ++ rates).head, (counts ++ rates).tail: _*)
  }
}
