package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Driver-collected centroid set, embedded by reference in the IVF
  * assignment/probe expressions. Centroids are broadcast-small BY
  * CONTRACT (the [[graft.operators.Similarity.ivfTopK]] centroid
  * contract), so shipping them as expression state costs what a
  * broadcast build side costs — and turns nearest-centroid assignment
  * from `crossJoin + max_by` (which plans as a SortAggregate pair: a
  * full map-side sort of the N×C scored rows) into a pure per-row
  * projection: NO Generate, no join, no aggregate, NO SHUFFLE.
  *
  * `ids` are sorted ascending (the tie-break order); `flat(c·dim + i)`
  * is element i of centroid c; `norm2(c)` is its self-dot accumulated
  * with the same fold the cosine loop uses. */
final class CentroidsRef(
    val n: Int, val dim: Int,
    val ids: Array[Long], val flat: Array[Float], val norm2: Array[Double])
  extends Serializable

object CentroidsRef {

  /** Collect an (idCol: integral, vecCol: array&lt;float&gt;) frame —
    * callers dispatch non-integral id types to the composed twins. */
  def fromDataFrame(centroids: DataFrame, idCol: String, vecCol: String): CentroidsRef = {
    val rows = centroids.select(col(idCol).cast("long"), col(vecCol)).collect()
    require(rows.nonEmpty, "centroid set is empty")
    val sorted = rows.map { r =>
      require(!r.isNullAt(0), s"centroid id column '$idCol' must be non-null")
      require(!r.isNullAt(1), s"centroid vector column '$vecCol' must be non-null")
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }.sortBy(_._1)
    require(sorted.map(_._1).distinct.length == sorted.length, "duplicate centroid ids")
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "centroid dimensions are not uniform")
    val n = sorted.length
    val flat = new Array[Float](n * dim)
    val norm2 = new Array[Double](n)
    var c = 0
    while (c < n) {
      val v = sorted(c)._2
      var nb = 0.0
      var i = 0
      while (i < dim) {
        flat(c * dim + i) = v(i)
        val yi = v(i).toDouble
        nb += yi * yi
        i += 1
      }
      norm2(c) = nb
      c += 1
    }
    new CentroidsRef(n, dim, sorted.map(_._1), flat, norm2)
  }
}

/** Shared eval body for the interpreted and generated paths. The cosine
  * per centroid replicates `round(graft_cosine(vec, cw), 6)` EXACTLY:
  * the fused dot/na/nb fold of [[CosineSimilarity]] over
  * `min(|vec|, dim)` elements (na is xi² partial sums — independent of
  * the centroid, hoisted out of the C loop; nb likewise precomputed per
  * centroid, recomputed only on a length mismatch), `dot/(√na·√nb)`,
  * then [[PqKernel.round6]]. Ranking is (rounded cosine DESC, centroid
  * id ASC) with Spark's double ordering (NaN above all values — a
  * zero-norm side yields NaN, and `Double.compare` reproduces how
  * `max_by`/`row_number` rank it). */
object CentroidKernel {

  private def better(sim: Double, id: Long, bestSim: Double, bestId: Long): Boolean = {
    val c = java.lang.Double.compare(sim, bestSim)
    c > 0 || (c == 0 && id < bestId)
  }

  private def rawCosineAt(
      vec: ArrayData, n: Int, na: Double, ref: CentroidsRef, c: Int): Double = {
    var dot = 0.0
    var i = 0
    val base = c * ref.dim
    if (n == ref.dim) {
      while (i < n) { dot += vec.getFloat(i).toDouble * ref.flat(base + i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(ref.norm2(c)))
    } else {
      // length-mismatch slow path: the fused twin folds nb only over the
      // common prefix, so the precomputed full-dim norm does not apply;
      // na is already the common-prefix fold (identical elements, same
      // left-to-right order), so it carries over unchanged
      var nb = 0.0
      while (i < n) {
        val yi = ref.flat(base + i).toDouble
        dot += vec.getFloat(i).toDouble * yi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  private def cosineAt(
      vec: ArrayData, n: Int, na: Double, ref: CentroidsRef, c: Int): Double =
    PqKernel.round6(rawCosineAt(vec, n, na, ref, c))

  /** The shared argmax body of [[nearest]]/[[nearestWithSim]] —
    * (best id, best rounded cosine).
    *
    * r20: [[PqKernel.round6]] builds a BigDecimal through
    * `Double.toString` (~µs) and the original loop paid it per
    * CANDIDATE — rows × C constructions, the dominant cost of every
    * assignment scan. The rounded argmax is recovered EXACTLY from a
    * raw two-pass margin screen: rounding moves a value at most half a
    * bucket (5e-7), so a candidate more than one bucket (1e-6) below
    * the raw maximum rounds strictly below it and can never win or
    * tie; pass 2 rounds only candidates inside a 2e-6 margin (slack
    * for the shortest-decimal ULP wobble) and replays the original
    * scan order + (rounded DESC, id ASC) tie rule on them. NaN raw
    * cosines (zero-norm sides) rank above everything under
    * Double.compare exactly as before: pass 1 tracks the max with the
    * same comparator, and a NaN raw maximum disables the cut (NaN
    * comparisons are false), so every candidate is rounded — the
    * original scan verbatim. */
  private def argmax(vec: ArrayData, ref: CentroidsRef): (Long, Double) = {
    val n = math.min(vec.numElements(), ref.dim)
    var na = 0.0
    var i = 0
    while (i < n) { val xi = vec.getFloat(i).toDouble; na += xi * xi; i += 1 }
    var rawMax = Double.NegativeInfinity
    var c = 0
    while (c < ref.n) {
      val r = rawCosineAt(vec, n, na, ref, c)
      if (java.lang.Double.compare(r, rawMax) > 0) rawMax = r
      c += 1
    }
    val cut = rawMax - 2e-6
    var bestSim = Double.NegativeInfinity
    var bestId = ref.ids(0)
    c = 0
    while (c < ref.n) {
      val r = rawCosineAt(vec, n, na, ref, c)
      if (!(r < cut)) { // NaN r passes (never-false-negative inclusion)
        val sim = PqKernel.round6(r)
        if (better(sim, ref.ids(c), bestSim, bestId)) {
          bestSim = sim; bestId = ref.ids(c)
        }
      }
      c += 1
    }
    (bestId, bestSim)
  }

  /** Id of the argmax-cosine centroid (ties → lower id). */
  def nearest(vec: ArrayData, ref: CentroidsRef): Long =
    argmax(vec, ref)._1

  /** [[nearest]] returning BOTH halves of the argmax — (best id, best
    * rounded cosine) as one struct row. The loop already computes the
    * winning similarity; callers that need it (SemDeDup's and prototype
    * pruning's centroid_sim column) previously re-derived it with a
    * broadcast join back to the centroid frame, which (a) paid the
    * cosine twice and (b) let constraint propagation infer the centroid
    * side's filters onto the join key — re-evaluating the whole argmax
    * kernel per corpus row inside a Filter. One struct projection, no
    * join, nothing to infer. */
  def nearestWithSim(
      vec: ArrayData, ref: CentroidsRef): org.apache.spark.sql.catalyst.InternalRow = {
    val (bestId, bestSim) = argmax(vec, ref)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, bestSim))
  }

  /** The `min(nProbe, C)` nearest centroid ids in rank order (cosine
    * DESC, id ASC) — bounded insertion, nProbe is small by contract. */
  def probes(vec: ArrayData, ref: CentroidsRef, nProbe: Int): UnsafeArrayData = {
    val kEff = math.min(nProbe, ref.n)
    val n = math.min(vec.numElements(), ref.dim)
    var na = 0.0
    var i = 0
    while (i < n) { val xi = vec.getFloat(i).toDouble; na += xi * xi; i += 1 }
    val topSim = new Array[Double](kEff)
    val topId = new Array[Long](kEff)
    var filled = 0
    var c = 0
    while (c < ref.n) {
      val sim = cosineAt(vec, n, na, ref, c)
      val id = ref.ids(c)
      if (filled < kEff || better(sim, id, topSim(filled - 1), topId(filled - 1))) {
        var pos = math.min(filled, kEff - 1)
        while (pos > 0 && better(sim, id, topSim(pos - 1), topId(pos - 1))) {
          topSim(pos) = topSim(pos - 1); topId(pos) = topId(pos - 1); pos -= 1
        }
        topSim(pos) = sim; topId(pos) = id
        if (filled < kEff) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topId, filled))
  }
}

/** `array<float>` vector → nearest centroid id (the IVF assignment) —
  * a zero-shuffle projection against the embedded centroid set. */
case class NearestCentroid(child: Expression, centroids: CentroidsRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    CentroidKernel.nearest(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, classOf[CentroidsRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidKernel.nearest($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `array<float>` vector → `struct(cluster: long, centroid_sim: double)`:
  * the nearest centroid id AND its round-6 cosine in one argmax pass —
  * the assignment shape for operators that score by prototypicality
  * ([[graft.operators.Dedup.semDedup]],
  * [[graft.operators.Curation.prototypePrune]]). */
case class NearestCentroidSim(child: Expression, centroids: CentroidsRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("centroid_sim", DoubleType, nullable = false)))
  override def prettyName: String = "graft_nearest_centroid_sim"

  override protected def nullSafeEval(input: Any): Any =
    CentroidKernel.nearestWithSim(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, classOf[CentroidsRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidKernel.nearestWithSim($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidSim =
    copy(child = newChild)
}

/** `array<float>` query vector → its `min(nProbe, C)` nearest centroid
  * ids in probe-rank order (the multi-probe IVF probe list). */
case class ProbeCentroids(child: Expression, centroids: CentroidsRef, nProbe: Int)
    extends UnaryExpression with NullIntolerantKernel {

  require(nProbe > 0, s"nProbe=$nProbe must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_probe_centroids"

  override protected def nullSafeEval(input: Any): Any =
    CentroidKernel.probes(input.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, classOf[CentroidsRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidKernel.probes($c, $ref, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCentroids =
    copy(child = newChild)
}
