package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter as a typed `Aggregator[Long, Array[Long], Array[Long]]` —
  * the membership sketch completing the family (HLL = distinct count,
  * count-min = frequency, Bloom = membership): `numBits` bits packed into
  * longs, `numHashes` independent universal hashes set one bit each per
  * input. No false negatives ever; false positives at the classic
  * `(1 − e^(−kn/m))^k` rate.
  *
  * Scale shape: `reduce` sets bits in a per-partition array, `merge` is
  * bitwise OR — associative and map-side combinable, so building the
  * filter over a 100 TB key column ships `numBits/64` longs per task.
  * [[BloomFilter.mightContain]] probes the finished sketch with pure
  * Column algebra (stays in codegen), which is what makes
  * [[BloomFilter.prunedJoin]] a *runtime filter*: the big side is cut to
  * probable matches BEFORE its shuffle, the classic semi-join pruning a
  * 1000-executor join wants when the build side is selective but too big
  * to broadcast as a hash relation.
  */
final class BloomFilter(val numBits: Int, val numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  import BloomFilter._
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val bit = bitOf(h, i, numBits)
      buf(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BloomFilter {

  /** Prime modulus shared with the MinHash/CMS universal-hash family. */
  val Mod: Long = graft.operators.Dedup.MinhashMod

  /** Hash constants offset by 211 so Bloom never shares a permutation
    * with MinHash (offset 0, capped at 101) or count-min (offset 101,
    * depth capped at 110) — Bloom owns [211, ∞); see
    * [[graft.operators.Dedup.minhashA]] for the partition. */
  def hashA(i: Int): Long = graft.operators.Dedup.minhashA(i + 211)
  def hashB(i: Int): Long = graft.operators.Dedup.minhashB(i + 211)

  /** Bit index of digest `h` under hash `i` (JVM-side). floorMod keeps a
    * NEGATIVE digest (e.g. from Spark's signed `hash`/`xxhash64` instead
    * of tokenHash60) in range — Java `%` would go negative and index out
    * of (or silently from the end of) the bit array. */
  def bitOf(h: Long, i: Int, numBits: Int): Int =
    (Math.floorMod(hashA(i) * Math.floorMod(h, Mod) + hashB(i), Mod) % numBits).toInt

  /** In-query membership probe: every one of the `numHashes` bits set —
    * pure Column algebra over the broadcast sketch row. pmod (not `%`)
    * mirrors [[bitOf]]'s floorMod: a negative digest must not reach
    * `element_at`, whose negative indices read from the array END —
    * a silent wrong answer, not an error. */
  def mightContain(sketch: Column, digest: Column, numBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val bit = (pmod(lit(hashA(i)) * pmod(digest, lit(Mod)) + lit(hashB(i)), lit(Mod)) % numBits).cast("int")
      val word = ((bit - (bit % 64)) / 64).cast("int") + 1
      (call_function("shiftright", element_at(sketch, word),
        (bit % 64).cast("int")).bitwiseAND(1L)) === 1L
    }.reduce(_ && _)

  /** Runtime-filtered equi-join: build a Bloom filter over `small`'s join
    * keys (one narrow aggregation — the only full pass over `small` before
    * the join), broadcast the single sketch row, cut `large` to probable
    * matches, then run the real join, which removes the false positives.
    * Result is EXACTLY `large ⋈ small`; the filter only shrinks the rows
    * `large` ships into the join's exchange. `digestOf` maps the key
    * column into the digest domain (applied identically to both sides);
    * the default digests the key's STRING RENDERING, so both sides must
    * carry the same key type — an int 1 and a double 1.0 render (and so
    * digest) differently, which would prune true matches. The type-equality
    * require below enforces this. */
  def prunedJoin(
      large: DataFrame, small: DataFrame, key: String,
      numBits: Int = 1 << 20, numHashes: Int = 4,
      digestOf: Column => Column =
        c => graft.operators.TextAnalysis.tokenHash60(c.cast("string"))): DataFrame = {
    require(!large.columns.contains("__bloom"),
      "prunedJoin input must not contain reserved column '__bloom' " +
        "(the broadcast sketch column would bind ambiguously)")
    require(large.schema(key).dataType == small.schema(key).dataType,
      s"prunedJoin key '$key' must have the same type on both sides " +
        s"(${large.schema(key).dataType} vs ${small.schema(key).dataType}): " +
        "the digest is computed from the key's string rendering")
    val bloom = udaf(new BloomFilter(numBits, numHashes))
    val digest = digestOf(col(key))
    val sketch = small.agg(bloom(digest).as("__bloom"))
    large
      .crossJoin(broadcast(sketch))
      .filter(mightContain(col("__bloom"), digest, numBits, numHashes))
      .drop("__bloom")
      .join(small, key)
  }
}
