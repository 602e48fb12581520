package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic ±1 Johnson–Lindenstrauss sign matrix, generated from the
  * engine's shared 60-bit digest primitive and embedded by reference in
  * the projection expression ([[JlProject]]) — the [[CentroidsRef]]
  * pattern, except nothing is collected: the matrix is a pure function of
  * `(m, d)`, so the driver builds it in microseconds and BOTH engines can
  * regenerate it independently (the DuckDB oracle rebuilds it from
  * `md5('jl:'||i||':'||j)` — the digest60 twin — and replays the
  * projection exactly).
  *
  * `flat(i·d + j)` is the sign applied to input coordinate `j` of output
  * coordinate `i`: `+1` when `digest60("jl:i:j")` is even, `−1` odd. The
  * dense-±1 matrix is Achlioptas's database-friendly JL construction
  * (Achlioptas 2001, "Database-friendly random projections"): E[⟨Px,Py⟩]
  * ∝ ⟨x,y⟩ with variance shrinking as 1/m, so cosine ranking in the
  * projected space approximates the exact ranking at m ≪ d. The 1/√m
  * normalization is intentionally DROPPED: cosine is scale-invariant, so
  * the ranking downstream is identical with or without it and omitting
  * it saves m multiplies per row on both engines. */
final class JlSignsRef(val m: Int, val d: Int, val flat: Array[Double])
  extends Serializable

object JlSignsRef {

  /** Pure function of (m, d): sign(i, j) = parity of the shared digest of
    * `"jl:i:j"` — the exact string the oracle feeds `md5`. */
  def generate(m: Int, d: Int): JlSignsRef = {
    require(m > 0, s"projected dimension m=$m must be positive")
    require(d > 0, s"input dimension d=$d must be positive")
    val flat = new Array[Double](m * d)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < d) {
        val h = Digest60.digest60(UTF8String.fromString(s"jl:$i:$j"))
        flat(i * d + j) = if ((h & 1L) == 0L) 1.0 else -1.0
        j += 1
      }
      i += 1
    }
    new JlSignsRef(m, d, flat)
  }
}

/** Shared eval body for the interpreted and generated paths: each output
  * coordinate folds `vec(j) · sign(i, j)` over j ASCENDING in double —
  * the same left-to-right fold shape as the composed
  * `aggregate(zip_with(...))` twin and DuckDB's `list_dot_product`, so
  * the projected values are bit-identical across all three. A vector
  * shorter than `d` folds its common prefix (the CosineSimilarity
  * length-mismatch contract); longer vectors ignore the tail. */
object JlKernel {
  def project(vec: ArrayData, ref: JlSignsRef): UnsafeArrayData = {
    val n = math.min(vec.numElements(), ref.d)
    val out = new Array[Double](ref.m)
    var i = 0
    while (i < ref.m) {
      val base = i * ref.d
      var s = 0.0
      var j = 0
      while (j < n) { s += vec.getFloat(j).toDouble * ref.flat(base + j); j += 1 }
      out(i) = s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `array<float>` vector → its m-dimensional JL projection
  * (`array<double>`) — a zero-shuffle, WholeStageCodegen projection
  * against the embedded sign matrix. The scale story is bandwidth, the
  * SQ8 argument one step further: downstream pair scoring reads m
  * doubles instead of d floats (m=16 vs d=64 is a 2× byte and 4× FLOP
  * cut per pair), and the projected corpus can be persisted once and
  * re-scanned by every query batch. */
case class JlProject(child: Expression, signs: JlSignsRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_jl_project"

  override protected def nullSafeEval(input: Any): Any =
    JlKernel.project(input.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, classOf[JlSignsRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.JlKernel.project($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
