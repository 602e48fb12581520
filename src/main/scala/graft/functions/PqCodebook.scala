package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Driver-collected PQ codebook, embedded by reference in the encode/LUT
  * expressions. A PQ codebook is broadcast-small BY CONTRACT (m·K
  * codewords of dsub floats — kilobytes for any real index), so shipping
  * it as expression state via the task closure is the same cost class as
  * a broadcast join build side, and it buys the plan shape that matters
  * at 100 TB: encoding and LUT construction become pure per-row
  * projections — no Generate, no join, no aggregation, NO SHUFFLE — where
  * the equivalent DataFrame formulation plans a broadcast join feeding a
  * SortAggregate pair (a full map-side sort of the N×m×K scored rows).
  *
  * Layout: `flatCw(((j·K)+c)·dsub + i)` = element i of subspace j's
  * codeword c; `cw2(j·K+c)` = that codeword's self-dot, precomputed with
  * the same left-to-right double fold the expressions use.
  */
final class PqCodebookRef(
    val m: Int, val dsub: Int, val k: Int,
    val flatCw: Array[Float], val cw2: Array[Double]) extends Serializable

object PqCodebookRef {

  /** Collect a [[graft.operators.Similarity.pqCodebook]]-shaped frame
    * (columns `subspace`, `code`, `__cw`, `__cw2`) into a kernel
    * reference. Validates the dense-code contract: every (subspace, code)
    * slot in [0,m)×[0,K) present exactly once, uniform K. */
  def fromCodebook(codebook: DataFrame, m: Int, dsub: Int): PqCodebookRef = {
    val rows = codebook.select(
      col("subspace").cast("int"), col("code").cast("int"), col("__cw"), col("__cw2"))
      .collect()
    require(rows.nonEmpty, "PQ codebook is empty")
    require(rows.length % m == 0,
      s"codebook has ${rows.length} codewords, not a multiple of m=$m")
    val k = rows.length / m
    val flatCw = new Array[Float](m * k * dsub)
    val cw2 = new Array[Double](m * k)
    val seen = new Array[Boolean](m * k)
    rows.foreach { r =>
      val j = r.getInt(0); val c = r.getInt(1)
      require(j >= 0 && j < m && c >= 0 && c < k,
        s"codebook slot (subspace=$j, code=$c) outside [0,$m)x[0,$k)")
      require(!seen(j * k + c), s"duplicate codebook slot (subspace=$j, code=$c)")
      seen(j * k + c) = true
      val cw = r.getSeq[Float](2)
      require(cw.length == dsub,
        s"codeword (subspace=$j, code=$c) has ${cw.length} dims, expected $dsub")
      var i = 0
      while (i < dsub) { flatCw((j * k + c) * dsub + i) = cw(i); i += 1 }
      cw2(j * k + c) = r.getDouble(3)
    }
    new PqCodebookRef(m, dsub, k, flatCw, cw2)
  }
}

/** Shared eval body for interpreted eval and generated Java. Arithmetic
  * is the EXACT fold of the DataFrame twins ([[graft.operators.Similarity
  * .pqEncode]]/`pqLut`, spec-pinned equivalent): every dot widens floats
  * to double and folds left-to-right, L2² composes as
  * `(x² − 2·dot) + cw²`, and rounding is Spark `round(_, 6)`'s own
  * `BigDecimal.setScale(6, HALF_UP)` path — so the kernel, the composed
  * form, and the DuckDB oracle agree bit-for-bit. */
object PqKernel {

  /** Spark's `round(x, 6)` exactly: NaN/Infinity pass through (catalyst's
    * RoundBase short-circuits them — `BigDecimal(NaN)` would throw), and
    * finite values go through `BigDecimal(double)`'s `valueOf`/`toString`
    * path, matching RoundBase's scale-down. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Argmin-L2 code per subspace; ties (equal rounded d²) break to the
    * lower code because the scan keeps the FIRST strict improvement.
    *
    * r20: [[round6]] builds a BigDecimal through `Double.toString` —
    * ~µs-scale — and the original loop paid it per CANDIDATE (rows × m
    * × K constructions; measured as the dominant cost of the whole
    * encode scan). The rounded argmin is recovered EXACTLY from a raw
    * two-pass margin screen: round-to-nearest moves a value by at most
    * half a bucket (5e-7), so any candidate whose raw d² exceeds the
    * raw minimum by MORE than one bucket (1e-6) rounds strictly above
    * the minimum's rounded value and can never win or tie. Pass 1
    * finds the raw minimum with plain double compares; pass 2 rounds
    * only candidates inside a 2e-6 margin (double the bound — slack
    * for the shortest-decimal ULP wobble) and replays the original
    * first-strict-improvement scan on them. The final (rounded min,
    * first index) is a pure function of the rounded sequence and every
    * excluded candidate is strictly above the winner, so the result is
    * bit-identical; NaN d² (degenerate inputs) never beat +∞-seeded
    * bestD in the original and are excluded by the same comparison
    * here (an all-NaN subspace keeps code 0 on both paths). */
  def encode(vec: ArrayData, cb: PqCodebookRef): UnsafeArrayData = {
    if (vec.numElements() != cb.m * cb.dsub) return null
    val out = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.dsub
      var x2 = 0.0
      var i = 0
      while (i < cb.dsub) {
        val v = vec.getFloat(base + i).toDouble; x2 += v * v; i += 1
      }
      def rawD2(c: Int): Double = {
        val cwBase = (j * cb.k + c) * cb.dsub
        var dot = 0.0
        var i2 = 0
        while (i2 < cb.dsub) {
          dot += vec.getFloat(base + i2).toDouble * cb.flatCw(cwBase + i2); i2 += 1
        }
        (x2 - 2.0 * dot) + cb.cw2(j * cb.k + c)
      }
      var rawMin = Double.PositiveInfinity
      var c = 0
      while (c < cb.k) {
        val r = rawD2(c)
        if (r < rawMin) rawMin = r
        c += 1
      }
      // Magnitude-aware margin (r21, ADVICE): round6 goes through
      // Double.toString, whose shortest-decimal wobble is half an ULP of
      // the VALUE — for raw d² above ~4.5e9 (unnormalized large
      // vectors) that wobble exceeds the fixed 1e-6 slack, so the cut
      // widens by 2·ulp(rawMin); never narrower than the proven 2e-6.
      val cut = rawMin + 1e-6 + math.max(1e-6, 2.0 * Math.ulp(rawMin))
      var bestD = Double.PositiveInfinity
      var bestC = 0
      c = 0
      while (c < cb.k) {
        val r = rawD2(c)
        if (r <= cut) { // NaN r fails this test, as it failed `< bestD`
          val d2 = round6(r)
          if (d2 < bestD) { bestD = d2; bestC = c }
        }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Flat subspace-major ADC table: `lut(j·K+c) = round6(q_j · cw_{j,c})`. */
  def lut(vec: ArrayData, cb: PqCodebookRef): UnsafeArrayData = {
    if (vec.numElements() != cb.m * cb.dsub) return null
    val out = new Array[Double](cb.m * cb.k)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.dsub
      var c = 0
      while (c < cb.k) {
        val cwBase = (j * cb.k + c) * cb.dsub
        var dot = 0.0
        var i = 0
        while (i < cb.dsub) {
          dot += vec.getFloat(base + i).toDouble * cb.flatCw(cwBase + i); i += 1
        }
        out(j * cb.k + c) = round6(dot)
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `array<float>` vector → `array<int>` PQ codes against the embedded
  * codebook — the zero-shuffle production encode path. NULL on a
  * dimension mismatch (m·dsub contract). */
case class PqEncodeCodes(child: Expression, codebook: PqCodebookRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, classOf[PqCodebookRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqKernel.encode($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** `array<float>` query vector → flat `array<double>` ADC lookup table
  * against the embedded codebook. NULL on a dimension mismatch. */
case class PqBuildLut(child: Expression, codebook: PqCodebookRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.lut(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, classOf[PqCodebookRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqKernel.lut($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqBuildLut =
    copy(child = newChild)
}
