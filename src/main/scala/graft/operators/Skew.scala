package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins/aggregations. AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles
  * most cases at runtime; explicit salting remains necessary when a single
  * build-side key is hot enough that even a split partition overwhelms one
  * task, or for aggregations (AQE does not split skewed aggregates).
  */
object Skew {

  /** Salted equi-join: the skewed (probe) side gets a deterministic salt in
    * [0, buckets); the small (build) side is replicated `buckets` times so
    * every (key, salt) pair finds its match. Correct for inner and
    * left-outer joins on `key`. Salt is a hash of the whole row's key plus
    * a spread column when provided — deterministic, no rand() (replays and
    * retries must produce identical partitioning).
    */
  def saltedJoin(
      skewed: DataFrame, small: DataFrame, key: String, buckets: Int,
      joinType: String = "inner", spread: Option[Column] = None): DataFrame = {
    val saltExpr = pmod(
      spread.map(c => hash(col(key), c)).getOrElse(hash(col(key), monotonically_increasing_id())),
      lit(buckets))
    val l = skewed.withColumn("__salt", saltExpr)
    val r = small
      .withColumn("__salt", explode(lit((0 until buckets).toArray)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate on (key, salt) first — spreading a hot key over `buckets`
    * reducers — then combine the partials per key. The caller supplies the
    * same aggregation at both levels via commutative-associative pairs,
    * e.g. count: (count, sum), sum: (sum, sum), max: (max, max).
    */
  def twoPhaseAgg(
      df: DataFrame, key: String, buckets: Int,
      partial: Seq[(String, Column)],      // name -> agg over raw rows
      combine: Seq[(String, Column)]): DataFrame = {  // name -> agg over partials
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    val p = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p.groupBy(col(key))
      .agg(combine.head._2.as(combine.head._1),
        combine.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
