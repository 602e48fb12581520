package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed `Aggregator[Long, Array[Long], Array[Long]]`
  * — the frequency-sketch counterpart to the HLL distinct sketch
  * (`approx_distinct_users`): a fixed `depth × width` counter matrix where
  * every input increments one counter per row, chosen by an independent
  * universal hash. Estimates never UNDER-count, and over-count by at most
  * `⌈N/width⌉ · depth`-ish collisions (classic bound: ε = e/width with
  * probability 1−e^−depth) — so heavy hitters survive with tight bounds
  * while the state is a few KB regardless of cardinality.
  *
  * Scale shape: `reduce` is a per-partition in-place array update, `merge`
  * is element-wise sum — the associative map-side-combine contract, so a
  * 100 TB aggregation ships `depth·width` longs per task, never rows. The
  * finished sketch is a plain `Array[Long]` column, so ESTIMATION is also
  * in-query ([[CountMinSketch.estimate]] is pure Column algebra over the
  * broadcast sketch row — no driver round-trip, no UDF).
  *
  * Inputs are pre-hashed 60-bit digests (`TextAnalysis.tokenHash60` /
  * `Dedup`'s universal-hash family) so the per-row hash constants are
  * shared, engine-reproducible values.
  */
final class CountMinSketch(val depth: Int, val width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  import CountMinSketch._
  require(depth <= MaxDepth,
    s"depth=$depth exceeds $MaxDepth: seed indices ≥ 211 are reserved for the Bloom family")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + slot(h, i, width)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {

  /** Prime modulus shared with the MinHash universal-hash family. */
  val Mod: Long = graft.operators.Dedup.MinhashMod

  /** Row-i multiplier/offset — same Knuth-constant family as MinHash but
    * offset by 101 so the two sketches never share a permutation (seed
    * ranges: MinHash [0,101), count-min [101,211), Bloom [211,∞) — see
    * [[graft.operators.Dedup.minhashA]]). */
  def hashA(i: Int): Long = graft.operators.Dedup.minhashA(i + 101)
  def hashB(i: Int): Long = graft.operators.Dedup.minhashB(i + 101)

  /** Depth cap keeping count-min seeds below the Bloom family's offset. */
  val MaxDepth = 110

  /** Counter slot of digest `h` in sketch row `i` (JVM-side). floorMod
    * keeps a negative digest (signed `hash`/`xxhash64` callers) in range;
    * Java `%` would go negative and index out of the counter array. */
  def slot(h: Long, i: Int, width: Int): Int =
    (Math.floorMod(hashA(i) * Math.floorMod(h, Mod) + hashB(i), Mod) % width).toInt

  /** Grade a sketch against exact counts — the shared tail of the batch
    * (`cms_heavy_hitters`) and streaming (`stream_cms`) queries, so the
    * guarantee formula has ONE source of truth. Contract: `exact` carries
    * the key and an exact `n_events` column; `sketch` is one row with the
    * aggregator output as `__cms` and the total input count as `__n`;
    * `digest` recomputes the build-side digest from the key. `slack` is
    * the overcount tolerance in units of mean collision mass (N/width) —
    * an empirical safety factor (verified to hold at every test SF), not
    * the analytic e/width bound. Output adds the two guarantee verdicts:
    * a count-min estimate can never under-count, and the overcount is
    * collision-bounded. Reserved names: `exact` must not carry `est`,
    * `__cms`, or `__n` (the probe/sketch columns this helper adds). */
  def grade(exact: DataFrame, sketch: DataFrame, digest: Column,
      depth: Int, width: Int, slack: Double = 4.0): DataFrame = {
    val reserved = exact.columns.intersect(Seq("est", "__cms", "__n"))
    require(reserved.isEmpty,
      s"grade() reserves column names ${reserved.mkString(", ")} — rename them in `exact`")
    val passThrough = exact.columns.map(col).toSeq
    exact.crossJoin(broadcast(sketch))
      .withColumn("est", estimate(col("__cms"), digest, depth, width))
      .select(passThrough :+
        (col("est") >= col("n_events")).as("no_undercount") :+
        (col("est") <= col("n_events") + ceil(lit(slack) * col("__n") / width))
          .as("bounded_overcount"): _*)
  }

  /** In-query estimate: `min` over the depth rows of the counter each row
    * hashes `digest` into. `sketch` is the Array[Long] column produced by
    * the aggregator (one row, broadcast by the join that carries it);
    * `digest` is the same 60-bit digest the build side used. Pure Column
    * algebra — stays in codegen. */
  def estimate(sketch: Column, digest: Column, depth: Int, width: Int): Column =
    (0 until depth).map { i =>
      element_at(sketch,
        (lit(i * width) +
          (pmod(lit(hashA(i)) * pmod(digest, lit(Mod)) + lit(hashB(i)), lit(Mod)) % width)
            .cast("int") + 1))
    }.reduce(least(_, _))
}
