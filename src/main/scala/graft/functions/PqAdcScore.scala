package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance PQ scoring (the ADC inner loop of FAISS/ScaNN-class
  * product-quantized indexes): given a query's flat lookup table
  * `lut: array<double>` laid out `[subspace-major] lut(j·K + c) =
  * round(q_j · codeword_{j,c}, 6)` and a candidate's code vector
  * `codes: array<int>` (one dense code per subspace, each in `[0, K)`),
  * the approximate dot product is `Σ_j lut(j·K + codes(j))` — m array
  * reads and adds per candidate instead of d float multiplies: the
  * scoring loop reads NOTHING of the candidate but its m-byte-class code
  * row, which is the whole point of PQ at 100 TB (corpus scan bandwidth
  * shrinks d·4 → m·4 bytes per vector; d=64, m=4 is 16×).
  *
  * Runs once per (query, candidate) pair — billions of times at corpus
  * scale — so it is a codegen'd tight loop, not a HOF chain (the composed
  * `aggregate(zip_with(codes, sequence(...)))` form walks interpreted
  * lambda evaluators per pair; spec-pinned equivalent, SimilaritySpec).
  *
  * Determinism contract: LUT entries are pre-rounded to 6 dp by the LUT
  * builder, so every partial sum sits within ~1e-16 of a multiple of
  * 1e-6 and the final `round(·, 6)` lands on the same decimal no matter
  * the summation order — which is what lets the DuckDB oracle replay
  * the score with an UNORDERED `sum(term)` and still hash-match.
  *
  * NULL on malformed input (a code outside `[0, K)`, or a LUT whose
  * length is not exactly m·K — a dimension-count mismatch between the
  * index and the query LUT) rather than a wrong score or an exception
  * mid-codegen.
  */
case class PqAdcScore(left: Expression, right: Expression, codebookSize: Int)
    extends BinaryExpression with NullIntolerantKernel {

  require(codebookSize > 0, s"codebookSize=$codebookSize must be positive")

  // Input contract: left = array<double> LUT, right = array<int> codes
  // (enforced by the operator callers — ExpectsInputTypes is private[sql]).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  // Nullable even over non-null children: malformed codes return NULL.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // exact, not >=: a code row encoded with fewer subspaces than the LUT
    // was built for would otherwise sum a silent partial score
    if (lut.numElements() != m * codebookSize) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= codebookSize) return null
      acc += lut.getDouble(j * codebookSize + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |final int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $codebookSize) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    final int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $codebookSize) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += $lut.getDouble($j * $codebookSize + $c);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
