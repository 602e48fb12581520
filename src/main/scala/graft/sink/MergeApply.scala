package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed upsert/delete application semantics (SURVEY §2 W1/W2/O1) as
  * pure DataFrame algebra. The reference applies ops one at a time on a
  * single goroutine (`run.go:301-322`), which gives it global order for
  * free; at scale, order only matters *per key*, so we reduce each key to
  * its last image with a window over `(ts, tieBreak)` and apply once per
  * key per batch — one shuffle on the key, no serialized consumer.
  */
object MergeApply {

  /** O1: per-key last-write-wins reduction. Keeps exactly the latest row
    * per `key` ordered by `ordering` (e.g. ts, then a unique tiebreaker so
    * the result is deterministic under equal timestamps). */
  def lastImage(changes: DataFrame, key: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(ordering.map(_.desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1+W2: apply a changelog (with an `op` column ∈ insert|update|delete…)
    * onto a base snapshot. Semantics mirror the reference's idempotent
    * upsert (`mysql.go:357-374`) + delete (`mysql.go:507-534`):
    *   - latest op per key wins (per-key `ts` order, O1);
    *   - latest op = delete  → row absent from result;
    *   - latest op = upsert  → change row's values win over base's,
    *     column-wise coalesce so partial images preserve untouched columns
    *     (`mysql.go:456-459`: absent field → column omitted from SET).
    *
    * `valueCols` are the data columns shared by both sides. Base rows
    * untouched by any change pass through. Plan shape: one shuffle for the
    * window, one for the full-outer join — both on `key`, so AQE can
    * co-locate them; at 100 TB the base side should be bucketed by `key`.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String,
      ordering: Seq[Column],
      valueCols: Seq[String],
      deleteOp: String = "delete"): DataFrame = {
    val last = lastImage(changes, Seq(key), ordering)
    val c = last.select((col(key) +: col(opCol).as("__op") +: valueCols.map(v => col(v).as(s"__c_$v"))): _*)
    base.join(c, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(col(key) +: valueCols.map(v => coalesce(col(s"__c_$v"), col(v)).as(v)): _*)
  }

  /** J1: delete-reconciliation — every key present in the sink but absent
    * from the source must be deleted. The reference does one `FindOne` per
    * sink row (`run.go:256-279`, O(n) round-trips); here it is a single
    * broadcast-or-shuffle left-anti join. */
  def deleteReconcile(sinkIds: DataFrame, sourceIds: DataFrame, key: String): DataFrame =
    sinkIds.join(sourceIds, Seq(key), "left_anti")
}
