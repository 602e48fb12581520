package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval resampling with forward fill — the gap-fill shape of
  * metrics/IoT/feature pipelines (absent from the reference, which has no
  * temporal surface at all): an irregular timestamped stream becomes one
  * row per (key, bucket) over each key's observed span, carrying the last
  * observation at or before the bucket's end. The downstream consumer —
  * a feature join, a charting layer, a training-window builder — reads a
  * dense regular grid instead of coping with gaps.
  *
  * Scale shape: the per-bucket last observation is the library's OWN
  * bounded-heap operator ([[TopK.perKey]] with k = 1, keyed (key,
  * bucket)) — the raw stream collapses map-side through per-partition
  * heaps and ships one row per bucket through one exchange, with no
  * sort and no SortAggregate anywhere (a `max_by` over a (ts, tiebreak)
  * struct would plan exactly that); spans are key-sized; the dense grid
  * explodes `sequence(lo, hi)` per key (bounded by span/width, the
  * caller's dial); the forward-fill window runs per key over BUCKET
  * rows, not observations.
  *
  * Determinism: ranking is (ts desc, tiebreak desc…) — callers pass
  * tiebreak columns that make the order total (e.g. an event id),
  * exactly like [[graft.sink.MergeApply.lastImage]]; values pass
  * through untouched (no float arithmetic), so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object Resample {

  /** @param bucketWidth bucket width in `tsCol`'s own unit (e.g. ns)
    * @param tiebreak    extra ordering columns making (ts, …) total
    * @param maxBuckets  per-key dense-grid cap: a key whose observed span
    *                    exceeds `maxBuckets` bucket widths would build one
    *                    enormous `sequence` array in a single row before
    *                    the explode — the query fails fast with the key
    *                    and its span instead of OOMing an executor. Raise
    *                    the dial (or widen `bucketWidth`) deliberately. */
  def forwardFill(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long, tiebreak: Seq[Column] = Nil,
      maxBuckets: Long = 4L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    require(maxBuckets > 0, s"maxBuckets=$maxBuckets must be positive")
    // floor division (not `div`-truncation), matching DuckDB's `//`: a
    // negative timestamp buckets toward -inf on both engines. pmod makes
    // the numerator an exact multiple, so the truncating div IS the floor.
    val bucketed = df.withColumn("bucket",
      expr(s"(${qq(tsCol)} - pmod(${qq(tsCol)}, ${bucketWidth}L)) div ${bucketWidth}L"))
    val lastRows =
      if (org.apache.spark.sql.GraftSqlBridge.supportsStrategies(df.sparkSession))
        TopK.perKey(bucketed, Seq(keyCol, "bucket"),
          (col(tsCol) +: tiebreak).map(_.desc), 1)
      else TopK.windowed(bucketed, Seq(keyCol, "bucket"),
        (col(tsCol) +: tiebreak).map(_.desc), 1)
    // used twice (span derivation + the grid join) — materialize the
    // bucket-sized collapse once so the raw-stream TopK pass doesn't
    // re-run per consumer (the lshCandidates/Lloyd precedent)
    val perBucket = lastRows.select(col(keyCol), col("bucket"),
      col(valueCol).as("__last")).localCheckpoint()
    val dense = perBucket.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      // span guard BEFORE the sequence is built: the offending key and its
      // span surface in the error instead of an executor OOM
      .withColumn("__hi",
        when(col("__hi") - col("__lo") < lit(maxBuckets), col("__hi"))
          .otherwise(raise_error(concat(
            lit("Resample.forwardFill: key "), col(keyCol).cast("string"),
            lit(" spans "), (col("__hi") - col("__lo") + 1).cast("string"),
            lit(s" buckets > maxBuckets=$maxBuckets; widen bucketWidth or raise maxBuckets")))
            .cast("long")))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    dense.join(perBucket, Seq(keyCol, "bucket"), "left")
      .withColumn("value",
        last(col("__last"), ignoreNulls = true).over(
          Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(keyCol), col("bucket"), col("value"))
  }

  /** Backtick-quote an identifier for use inside `expr(...)`. */
  private def qq(name: String): String = "`" + name.replace("`", "``") + "`"
}
