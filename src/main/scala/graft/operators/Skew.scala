package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Skew-mitigation utilities for 100 TB joins/aggregations. AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles
  * most cases at runtime; explicit salting remains necessary when a single
  * build-side key is hot enough that even a split partition overwhelms one
  * task, or for aggregations (AQE does not split skewed aggregates).
  *
  * All salts are DETERMINISTIC functions of row content — never rand() or
  * monotonically_increasing_id(), which change under task recomputation
  * and corrupt retried shuffles (the SPARK-23207 class of bug). Caveat of
  * content hashing: IDENTICAL duplicate rows share a salt, so a hot key
  * made of exact duplicates still lands on one reducer — pass `spread`
  * (any roughly-unique column) for that shape. MapType columns are
  * excluded from the default hash (not hashable in Spark).
  */
object Skew {

  /** Salted equi-join: the skewed (probe) side gets a deterministic salt in
    * [0, buckets); the small (build) side is replicated `buckets` times so
    * every (key, salt) pair finds its match. Correct for inner and
    * left-outer joins on `key`. */
  def saltedJoin(
      skewed: DataFrame, small: DataFrame, key: String, buckets: Int,
      joinType: String = "inner", spread: Option[Column] = None): DataFrame = {
    val saltExpr = pmod(
      spread.map(c => hash(col(key), c)).getOrElse(contentHash(skewed)),
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
      combine: Seq[(String, Column)],      // name -> agg over partials
      spread: Option[Column] = None): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spread.map(c => hash(col(key), c)).getOrElse(contentHash(df)), lit(buckets)))
    val p = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p.groupBy(col(key))
      .agg(combine.head._2.as(combine.head._1),
        combine.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Deterministic per-row salt source: hash of all hashable columns. */
  private def contentHash(df: DataFrame): Column = {
    val hashable = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[MapType])
      .map(f => col(f.name))
    hash(hashable.toSeq: _*)
  }
}
