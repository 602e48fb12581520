package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer-DCT perceptual hash — the classic pHash recipe (an 8×8
  * grayscale tile → 2-D DCT-II → sign-of-coefficient-vs-mean bits) in
  * ALL-INTEGER arithmetic so the 64-bit hash replays bit-exactly in the
  * DuckDB oracle:
  *
  *  - TILE: 64 "pixels" sampled from the payload bytes at stride 131
  *    (coprime to every realistic payload length, so the samples spread
  *    across the whole payload instead of reading a 64-byte prefix) —
  *    `p[k] = payload[(k·131) mod len]`, unsigned. In production the
  *    tile is the decoded-and-downscaled luminance plane; the sampling
  *    stands in for the codec stage this container can't run, while the
  *    DCT/threshold machinery below is the real published algorithm.
  *  - DCT: `C[u][v] = Σ_{x,y} p[8x+y]·T[u][x]·T[v][y]` with the integer
  *    basis `T[u][x] = round(cos((2x+1)·u·π/16)·1000)` — pure Long
  *    arithmetic (|C| ≤ 255·10⁶·64 ≈ 1.6e10, far inside Long).
  *  - BITS: the 63 AC coefficients compare against their own mean
  *    WITHOUT division — bit for AC index k (row-major, k = 8u+v ≥ 1)
  *    is set iff `63·C[u][v] > Σ_AC` — and pack into bit position k−1,
  *    so the hash is always non-negative (< 2⁶³). The DC coefficient
  *    (overall brightness) is excluded, per the published recipe.
  *
  * Hamming distance between two hashes = perceptual distance; the
  * banded join in [[graft.operators.Dedup.phashPairs]] finds all pairs
  * within distance 3 exactly (pigeonhole over 4 disjoint 16-bit bands).
  */
object PHashKernel {

  /** Integer DCT-II basis, `round(cos((2x+1)·u·π/16)·1000)` — public via
    * [[basisRows]] so the oracle interpolates the same table. */
  val Basis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 16.0) * 1000.0)
  }

  /** `(u, x, t)` rows for the oracle's VALUES list. */
  def basisRows: Seq[(Int, Int, Long)] =
    for (u <- 0 until 8; x <- 0 until 8) yield (u, x, Basis(u)(x))

  val SampleStride = 131

  /** 64-bit perceptual hash; MIN_VALUE marks "no pixels" (empty payload)
    * and surfaces as SQL NULL through the expression. */
  def hash(b: Array[Byte]): Long = {
    if (b == null || b.length == 0) return Long.MinValue
    val p = new Array[Long](64)
    var k = 0
    while (k < 64) {
      p(k) = (b(((k.toLong * SampleStride) % b.length).toInt) & 0xff).toLong
      k += 1
    }
    hashTile(p)
  }

  /** DCT + threshold + pack over an 8×8 tile (row-major, 64 values) —
    * the format-independent half of the recipe, shared by the
    * stride-sample path above and the real-pixel BMP path
    * ([[BmpKernel.lumaTile]]): both produce a luminance-like tile, this
    * turns it into the 63-AC-bit hash. */
  def hashTile(p: Array[Long]): Long = {
    val c = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) {
          val tu = Basis(u)(x)
          if (tu != 0L) {
            var y = 0
            while (y < 8) {
              acc += p(8 * x + y) * tu * Basis(v)(y)
              y += 1
            }
          }
          x += 1
        }
        c(8 * u + v) = acc
        v += 1
      }
      u += 1
    }
    var s = 0L
    var k = 1
    while (k < 64) { s += c(k); k += 1 }
    var h = 0L
    k = 1
    while (k < 64) {
      if (63L * c(k) > s) h |= 1L << (k - 1)
      k += 1
    }
    h
  }
}

/** `binary` payload → 64-bit perceptual hash (NULL for empty payloads —
  * nothing to hash). A zero-shuffle codegen projection: a lake-wide
  * near-dup fingerprint pass is one scan. */
case class PHash64(child: Expression)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phash"

  override protected def nullSafeEval(input: Any): Any = {
    val h = PHashKernel.hash(input.asInstanceOf[Array[Byte]])
    if (h == Long.MinValue) null else java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PHashKernel.hash($c);
      ${ev.isNull} = ${ev.value} == Long.MIN_VALUE;
    """)

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}
