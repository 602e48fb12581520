package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single most recent
  * right row with `right.ts <= left.ts` on the same key — the
  * trades-to-quotes / feature-to-snapshot operator Spark has no built-in
  * for. A naive formulation is a range theta-join (planned as a broadcast
  * nested loop, quadratic per key); the scalable formulation used here is
  * the UNION trick:
  *
  *   tag both sides → union → ONE window per key ordered by
  *   (ts, side, tie-break) → `last(right-payload, ignoreNulls)` over
  *   rows-unbounded-preceding → keep left rows.
  *
  * Cost at 100 TB: a single exchange on the key (both inputs shuffle once,
  * exactly like a shuffle join would) and a per-key sort — the same cost
  * class as sessionization, with NO join build and no per-row range scan.
  * Skewed keys sort within Spark's spillable window operator; tolerance
  * filtering is a post-hoc null-out, not a second pass.
  */
object AsOf {

  /** @param keyCols     equi-join keys present on both sides
    * @param tsCol       ordering column present on both sides (numeric;
    *                    forward mode and tolerance negate/subtract it)
    * @param rightOrder  extra right-side tie-break columns: among right
    *                    rows sharing (key, ts) the LARGEST tuple wins,
    *                    making the match deterministic
    * @param tolerance   max allowed `|left.ts - right.ts|`; matches
    *                    farther away are nulled out
    * @param direction   "backward" (default): latest right with
    *                    `right.ts <= left.ts`; "forward": earliest right
    *                    with `right.ts >= left.ts` (next-event
    *                    attribution) — implemented by running the
    *                    backward join over negated timestamps, so both
    *                    directions share one code path
    * @return left rows with the matched right payload columns (null when
    *         no match) plus `<tsCol>_right`, the matched right timestamp
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightOrder: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = direction match {
    case "forward" =>
      val out = asofBackward(
        left.withColumn(tsCol, -col(tsCol)),
        right.withColumn(tsCol, -col(tsCol)),
        keyCols, tsCol, rightOrder, tolerance)
      out.withColumn(tsCol, -col(tsCol))
        .withColumn(s"${tsCol}_right", -col(s"${tsCol}_right"))
    case "backward" =>
      asofBackward(left, right, keyCols, tsCol, rightOrder, tolerance)
    case other =>
      throw new IllegalArgumentException(
        s"direction must be 'backward' or 'forward', got '$other'")
  }

  private def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightOrder: Seq[String],
      tolerance: Option[Long]): DataFrame = {
    // A null-ts right row has no position in time — left in, it would sort
    // FIRST (nulls-first ascending) and become a phantom fallback match
    // for every otherwise-unmatched left row. Null-ts LEFT rows need no
    // guard: they sort before every right row, so they match nothing.
    val reserved = Seq("__side", "__r", "__lr", "__rts", s"${tsCol}_right")
    val reservedClash = (left.columns ++ right.columns).intersect(reserved)
    require(reservedClash.isEmpty,
      s"asofJoin inputs must not contain reserved column(s): ${reservedClash.distinct.mkString(",")}")
    val right0 = right.filter(col(tsCol).isNotNull)
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rightPayload = right0.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val clash = rightPayload.intersect(left.columns)
    require(clash.isEmpty, s"right payload columns collide with left: ${clash.mkString(",")}")
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val rStruct = struct(col(tsCol).as("__rts") +: rightPayload.toSeq.map(col): _*)
    val rStructType = right0.select(rStruct.as("__r")).schema.head.dataType
    val l2 = left.select(
      keyCols.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rStructType).as("__r")): _*)
    val r2 = right0.select(
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        leftPayload.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(lit(0).as("__side"), rStruct.as("__r")): _*)

    // Right rows (side 0) sort BEFORE left rows (side 1) at equal ts, so
    // the match is inclusive: right.ts == left.ts counts as "prior".
    val order: Seq[Column] =
      col(tsCol) +: col("__side") +: rightOrder.map(o => col(s"__r.$o"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(tol) =>
        when(matchedRaw.isNotNull && matchedRaw.getField("__rts") >= col(tsCol) - lit(tol),
          matchedRaw)
      case None => matchedRaw
    }
    l2.unionByName(r2)
      .withColumn("__lr", matched)
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
          (col("__lr.__rts").as(s"${tsCol}_right") +:
            rightPayload.map(c => col(s"__lr.$c").as(c))): _*)
  }
}
