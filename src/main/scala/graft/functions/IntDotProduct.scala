package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the exact integer dot product of two
  * `array<int>` columns (SQ8 code vectors), accumulated in long.
  *
  * This is the scoring loop of int8 ANN ([[graft.operators.Similarity
  * .sq8TopK]]): it runs once per (query, candidate) pair, i.e. billions
  * of times at corpus scale, so it must stay inside WholeStageCodegen.
  * The composed-builtins form (`aggregate(zip_with(...))`) walks two
  * interpreted lambda evaluators and allocates an intermediate array PER
  * PAIR; this expression generates a tight int-multiply/long-add loop —
  * the JVM shape of the SIMD kernel a native SQ8 scorer compiles to.
  * Bit-for-bit identical results: int products accumulate into a long
  * left-to-right (no overflow for |codes| ≤ 127 and realistic dims), and
  * a dimension mismatch yields NULL — exactly what the composed form
  * produces (`zip_with` pads the shorter array with nulls, which
  * null-poisons the aggregate), so the equivalence holds for ALL inputs,
  * not just the equal-dimension happy path.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with NullIntolerantKernel {

  // Input contract: both children evaluate to array<int> (enforced by the
  // operator callers — ExpectsInputTypes is private[sql], cf. CosineSimilarity).
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"
  // Nullable even over non-null children: mismatched dims return NULL.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i)
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
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
