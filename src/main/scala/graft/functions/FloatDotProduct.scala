package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dot product of two `array<float>`
  * columns, each element widened to double BEFORE multiplying and the
  * products folded left-to-right — exactly the arithmetic of the composed
  * form `aggregate(zip_with(a, b, (p,q) -> double(p)*double(q)), 0d, +)`
  * and of DuckDB's `list_dot_product(a::double[], b::double[])`, so
  * results are bit-for-bit reproducible across all three.
  *
  * This is the building block of PQ encoding and LUT construction
  * ([[graft.operators.Similarity.pqTopK]]): L2² distances compose from
  * three dots (`x·x − 2x·c + c·c`), and the asymmetric-distance lookup
  * table is one dot per (query-subvector, codeword). Those loops run
  * N×m×K times at corpus scale, so they must stay inside
  * WholeStageCodegen; the interpreted HOF form walks two lambda
  * evaluators and allocates an intermediate array per pair.
  * A dimension mismatch yields NULL — what `zip_with`'s null padding
  * produces through the composed aggregate (cf. [[IntDotProduct]]).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with NullIntolerantKernel {

  // Input contract: both children evaluate to array<float> (enforced by the
  // operator callers — ExpectsInputTypes is private[sql], cf. CosineSimilarity).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_float_dot"
  // Nullable even over non-null children: mismatched dims return NULL.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}
