package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: point rows matched to interval rows with
  * `start <= point <= end`, plus optional equi-keys. Spark plans a pure
  * range predicate as a broadcast nested-loop join — per-key quadratic,
  * a scale killer — and even with equi-keys the range residual rides on a
  * key-only shuffle that collapses a hot key's full history onto one task.
  *
  * The scalable formulation BINS the domain: every interval explodes into
  * the coarse bins it covers, every point maps to its single bin, and the
  * join becomes an EQUI-join on (keys…, bin) with the exact BETWEEN as a
  * cheap residual filter. Each matching pair meets in exactly ONE bin
  * (the point's), so no post-join dedup is needed. `binWidth` is the
  * replication/selectivity dial: intervals explode into
  * `len/binWidth + 1` rows, and the shuffle key gains a time component —
  * which also shards hot equi-keys across tasks (temporal salting for
  * free). Pick binWidth ≈ the typical interval length.
  */
object RangeJoin {

  /** @param points    rows with a numeric `pointCol`
    * @param intervals rows with numeric `startCol`/`endCol` (inclusive)
    * @param keyCols   equi-keys present on both sides (may be empty, but
    *                  at scale an equi-key or a selective bin is what
    *                  keeps the join from being all-pairs)
    * @return matched pairs: all point columns + all interval columns
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = intervals.columns.intersect(points.columns).diff(keyCols)
    require(clash.isEmpty, s"interval columns collide with point columns: ${clash.mkString(",")}")
    // floor(x / w) is computed in double, which rounds above 2^53 (e.g.
    // nanosecond timestamps) — harmless here: the map is MONOTONE and
    // applied identically to point, start, and end, so bin(start) <=
    // bin(point) <= bin(end) whenever start <= point <= end, the interval
    // explodes to every bin in that range, and the exact BETWEEN residual
    // below removes any rounding-misaligned pairing. floor (not integral
    // div) keeps fractional domains and negative values working.
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pairs of intervals with
    * `a.start <= b.end && b.start <= a.end` (inclusive on both ends),
    * plus optional equi-keys — the attribution-window / availability-
    * calendar operator, and the general case [[pointInInterval]] is the
    * degenerate (zero-length left interval) instance of.
    *
    * Same binning scheme, but BOTH sides explode into covered bins, so an
    * overlapping pair can meet in every bin their spans share. Instead of
    * a post-join `distinct` (a full shuffle of the matched pairs), each
    * pair is kept only in its CANONICAL bin — `bin(max(a.start, b.start))`,
    * the first bin where both intervals are present. One surviving row per
    * pair, zero dedup cost. The canonical-bin equality is computed on the
    * exact start values, so double-rounding above 2^53 cannot double- or
    * zero-count a pair (the same monotone `bin` is applied everywhere). */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = right.columns.intersect(left.columns).diff(keyCols)
    require(clash.isEmpty, s"right columns collide with left columns: ${clash.mkString(",")}")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(leftStart)), bin(col(leftEnd)))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rightStart)), bin(col(rightEnd)))))
    l.join(r, keyCols :+ "__bin")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bin") === bin(greatest(col(leftStart), col(rightStart))))
      .drop("__bin")
  }
}
