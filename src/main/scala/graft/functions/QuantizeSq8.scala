package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SQ8 quantization: `array<float>` → `array<int>` codes
  * `floor(x·127/max|x|+ 0.5)` ∈ [−127, 127] (symmetric per-vector
  * max-abs scaling; the all-zero vector quantizes to all-zero codes).
  *
  * One pass, two tight loops (max-abs scan, then scale) — O(d) per
  * vector. The composed-builtins form
  * (`transform(vec, x -> floor(x·127/array_max(transform(vec, abs))+0.5))`)
  * nests the max-reduction INSIDE the per-element lambda, so the
  * interpreted evaluator recomputes it for every element — O(d²)
  * lambda-tree walks per vector, which at sf0.1 costs more than the
  * whole ANN search it feeds. Arithmetic is identical IEEE double ops in
  * the same order, so codes are bit-for-bit equal to the composed form
  * and to the DuckDB oracle twin (`sim_topk_sq8`).
  */
case class QuantizeSq8(child: Expression) extends UnaryExpression with NullIntolerantKernel {

  // Input contract: child evaluates to array<float> (enforced by the
  // operator callers — ExpectsInputTypes is private[sql], cf. CosineSimilarity).
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_quantize_sq8"

  override protected def nullSafeEval(input: Any): Any =
    Sq8Kernel.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sq8Kernel.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeSq8 =
    copy(child = newChild)
}

/** Shared bytes-in/codes-out body for interpreted eval and generated Java. */
object Sq8Kernel {
  def quantize(vec: ArrayData): UnsafeArrayData = {
    val n = vec.numElements()
    val out = new Array[Int](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      // NaN-sticky, mirroring the composed twin: array_max's ordering
      // ranks NaN above everything, so any NaN element makes the scale
      // NaN and every code 0 (NaN.toInt) — same here, bit-for-bit.
      if (a > s || java.lang.Double.isNaN(a)) s = a
      i += 1
    }
    if (s != 0.0) {
      var j = 0
      while (j < n) {
        out(j) = math.floor(vec.getFloat(j).toDouble * 127.0 / s + 0.5).toInt
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
