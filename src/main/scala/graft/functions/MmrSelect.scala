package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The greedy MMR selection over ONE query's candidate pool, fused into
  * a single kernel pass (r20 optimization).
  *
  * The original [[graft.operators.Similarity.mmrGreedy]] cascade runs
  * k−1 sequential Spark jobs (anti-join + broadcast + aggregate + window
  * + localCheckpoint per greedy step) over a frame that is only
  * queries×poolSize rows; measured on the bench host, ~5 jobs per step
  * and more driver gap than task time — ~2 s of the 3 s
  * `retrieval_mmr_served` median was the cascade. The pool is per-query
  * data by construction (every step keys on `query_id`), so the whole
  * selection folds into one aggregate: `collect_list` the pool structs
  * per query, run this kernel once per query row, explode the picks —
  * one exchange, one job, identical output.
  *
  * Bit-equivalence contract with the cascade (spec-locked by
  * MmrKernelSpec, and transitively by the mmr oracle rows):
  *   - pair similarity replays `round(graft_cosine(cv_i, cv_j), 6)`:
  *     the [[CosineSimilarity]] fold over the common prefix, then
  *     [[PqKernel.round6]];
  *   - `ms` is the Spark `max` of those round-6 doubles (NaN above all
  *     values, nulls ignored, all-null → null);
  *   - the objective replays `dec(rel)·λn − dec(ms)·(λd−λn)` with
  *     `dec = cast(decimal(38,6))` EXACTLY: round-6 doubles convert to
  *     scaled-micros longs via the same HALF_UP scale-6 conversion the
  *     decimal cast performs, and the integer arithmetic that follows is
  *     exact — a NaN on either side casts to decimal NULL, and a null
  *     objective sorts after every non-null one (Spark's NULLS LAST
  *     under DESC);
  *   - the per-step argmax replays `row_number over (mmr DESC,
  *     neighbor_id ASC)`;
  *   - seeding replays `filter(rank === 1)` (every rank-1 row seeds with
  *     mmr_rank = 1; no rank-1 row → the query selects nothing);
  *   - a selected neighbor_id excludes ALL pool rows carrying that id
  *     (the cascade's anti-join on (query_id, neighbor_id)), while the
  *     redundancy term compares against the PICKED row's vector only.
  *
  * Input: `array<struct<neighbor_id: long, rel: double, rank: int,
  * cv: array<float>>>` (field POSITIONS are the contract — the caller
  * builds the struct). Output: `array<struct<neighbor_id: long,
  * rel: double, mmr_rank: int>>` in selection order. */
case class MmrSelect(child: Expression, k: Int, lambdaNum: Int, lambdaDen: Int)
    extends UnaryExpression with NullIntolerantKernel {

  require(k >= 1, s"k=$k must be at least 1")
  require(lambdaNum >= 0 && lambdaDen > 0 && lambdaNum <= lambdaDen,
    s"lambda=$lambdaNum/$lambdaDen must be in [0, 1]")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rel", DoubleType, nullable = true),
    StructField("mmr_rank", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_mmr_select"

  override protected def nullSafeEval(input: Any): Any =
    MmrKernel.select(input.asInstanceOf[ArrayData], k, lambdaNum, lambdaDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MmrKernel.select($c, $k, $lambdaNum, $lambdaDen)")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrKernel {

  /** `cast(round-6 double AS decimal(38,6))` as scaled micros. Spark's
    * cast goes `BigDecimal.valueOf(d)` → `changePrecision(38, 6)`
    * (HALF_UP); for the round-6 inputs this path sees, setScale is a
    * no-op and the conversion is exact. */
  private def micros(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** `round(graft_cosine(a, b), 6)` — the [[CosineSimilarity]] fold
    * (same element order, same accumulation) then [[PqKernel.round6]].
    * Replicated here the way [[CentroidKernel.cosineAt]] replicates it:
    * the kernel classes inline their loops, so the fold lives once per
    * kernel with the spec pinning the agreement. */
  private def cosine6(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getFloat(i).toDouble
      val yi = b.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    PqKernel.round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Greedy selection over one pool; see [[MmrSelect]] for the exact
    * semantics replayed. */
  def select(pool: ArrayData, k: Int, lambdaNum: Int, lambdaDen: Int): GenericArrayData = {
    val n = pool.numElements()
    // unpack once — the greedy revisits rows k times
    val neighbor = new Array[Long](n)
    val rel = new Array[Double](n)
    val relNull = new Array[Boolean](n)
    val seed = new Array[Boolean](n)
    val cv = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = pool.getStruct(i, 4)
      neighbor(i) = row.getLong(0)
      relNull(i) = row.isNullAt(1)
      rel(i) = if (relNull(i)) 0.0 else row.getDouble(1)
      seed(i) = !row.isNullAt(2) && row.getInt(2) == 1
      cv(i) = if (row.isNullAt(3)) null else row.getArray(3)
      i += 1
    }
    val taken = new Array[Boolean](n) // row excluded (its neighbor_id selected)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (row, mmr_rank)
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[ArrayData] // picked rows' vectors
    def exclude(id: Long): Unit = {
      var j = 0
      while (j < n) { if (neighbor(j) == id) taken(j) = true; j += 1 }
    }
    // step 1: every rank-1 row (cascade: filter(rank === 1))
    i = 0
    while (i < n) {
      if (seed(i) && !taken(i)) {
        picks += ((i, 1)); selVecs += cv(i); exclude(neighbor(i))
      }
      i += 1
    }
    var t = 2
    var exhausted = picks.isEmpty // no seed → the query selects nothing
    while (t <= k && !exhausted) {
      // argmax of (mmr DESC NULLS LAST, neighbor_id ASC) over the rest
      var best = -1
      var bestNull = true
      var bestVal = 0L
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // ms = max over picked vectors of round-6 cosine (nulls ignored,
          // NaN above all values; no non-null pair → null)
          var msNull = true
          var ms = 0.0
          if (cv(i) != null) {
            var s = 0
            while (s < selVecs.length) {
              val sv = selVecs(s)
              if (sv != null) {
                val sim = cosine6(cv(i), sv)
                if (msNull || java.lang.Double.compare(sim, ms) > 0) {
                  ms = sim; msNull = false
                }
              }
              s += 1
            }
          }
          val isNull = relNull(i) || rel(i).isNaN || msNull || ms.isNaN
          val v =
            if (isNull) 0L
            else micros(rel(i)) * lambdaNum - micros(ms) * (lambdaDen - lambdaNum)
          val better =
            if (best < 0) true
            else if (bestNull != isNull) bestNull // non-null beats null
            else if (!isNull && v != bestVal) v > bestVal
            else neighbor(i) < neighbor(best)
          if (better) { best = i; bestNull = isNull; bestVal = v }
        }
        i += 1
      }
      if (best < 0) exhausted = true
      else {
        picks += ((best, t)); selVecs += cv(best); exclude(neighbor(best))
        t += 1
      }
    }
    new GenericArrayData(picks.map { case (row, rank) =>
      new GenericInternalRow(Array[Any](
        neighbor(row), if (relNull(row)) null else rel(row), rank))
    }.toArray[Any])
  }
}
