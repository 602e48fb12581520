package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built unigram-LM piece table, embedded by reference in the
  * tokenize kernel (the [[PqCodebookRef]]/[[BpeMergeTableRef]] pattern).
  * A production piece vocabulary is a fixed artifact (sentencepiece:
  * 32k pieces — a few MB), the same cost class as a broadcast build
  * side. Log-probabilities are MICRO-LOG integers (`round(ln p · 10⁶)`,
  * half away from zero — the round-6 grid as a Long), so the Viterbi
  * comparisons below are exact integer arithmetic that replays
  * bit-for-bit in the DuckDB oracle. */
final class UnigramPieceTableRef(
    val pieces: Array[String], val llkMicro: Array[Long],
    val maxPieceLen: Int) extends Serializable {
  require(pieces.length == llkMicro.length,
    s"piece table sides disagree: ${pieces.length} vs ${llkMicro.length}")
  require(maxPieceLen > 0, s"maxPieceLen=$maxPieceLen must be positive")

  @transient lazy val llk: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), llkMicro(i)); i += 1 }
    m
  }
}

/** Shared eval body for interpreted eval and generated Java.
  *
  * Viterbi segmentation of one word under the embedded piece table:
  * dp[i] = the best segmentation of the first i CODEPOINTS, maximizing
  * total micro-log-likelihood; ties break to FEWER pieces, then to the
  * LONGEST last piece (the largest candidate length) — a locally
  * composable rule both engines implement identically, so the count is
  * deterministic under any partitioning and replays in the oracle's
  * recursive-CTE DP. A single codepoint absent from the vocabulary
  * scores the fixed [[UnigramKernel.UnkLlkMicro]] penalty as its own
  * piece (sentencepiece's UNK treatment), so every word segments. */
object UnigramKernel {

  /** The unknown-codepoint penalty (micro-log): ln p ≈ −20, far below
    * any trained piece, so UNK pieces appear only where the vocabulary
    * truly has no cover. A CONSTANT, not a trained value — both engines
    * and the oracle inline the same literal. */
  val UnkLlkMicro: Long = -20000000L

  /** Token count of the best segmentation — called from generated code,
    * so it must be a public static-reachable method. */
  def tokenCount(word: UTF8String, pt: UnigramPieceTableRef): Int =
    viterbi(word.toString, pt, null)

  /** Codepoint boundaries of `w`: `starts(i)` = the char offset of
    * codepoint i, with `starts(n)` = w.length. Shared by the DP below
    * and the trainer's substring seeding ([[graft.operators.Unigram]])
    * so both always agree on piece boundaries. */
  def cpStarts(w: String): Array[Int] = {
    val nCp = w.codePointCount(0, w.length)
    val start = new Array[Int](nCp + 1)
    var ci = 0
    var off = 0
    while (ci < nCp) {
      start(ci) = off
      off += Character.charCount(w.codePointAt(off))
      ci += 1
    }
    start(nCp) = w.length
    start
  }

  /** The DP, shared by the count kernel and the driver-side trainer:
    * when `outPieces` is non-null the winning segmentation's pieces are
    * appended to it (the E-step's need); the return value is the piece
    * count either way. Empty word → 0. */
  def viterbi(
      w: String, pt: UnigramPieceTableRef,
      outPieces: java.util.ArrayList[String]): Int = {
    val nCp = w.codePointCount(0, w.length)
    if (nCp == 0) return 0
    val start = cpStarts(w)
    val cost = new Array[Long](nCp + 1)
    val cnt = new Array[Int](nCp + 1)
    val back = new Array[Int](nCp + 1) // winning piece length at i
    var i = 1
    while (i <= nCp) {
      var bestCost = Long.MinValue
      var bestCnt = Int.MaxValue
      var bestL = 0
      var l = 1
      val lMax = if (pt.maxPieceLen < i) pt.maxPieceLen else i
      while (l <= lMax) {
        val piece = w.substring(start(i - l), start(i))
        var llk = pt.llk.get(piece)
        if (llk == null && l == 1) llk = UnkLlkMicro
        if (llk != null) {
          val c = cost(i - l) + llk.longValue()
          val k = cnt(i - l) + 1
          // (cost DESC, pieces ASC, length DESC) — the strict `l > bestL`
          // comparison implements the length-DESC leg because the l-loop
          // ascends: a later (longer) l displaces an equal (cost, pieces)
          // entry, so the longest length wins
          if (c > bestCost || (c == bestCost &&
              (k < bestCnt || (k == bestCnt && l > bestL)))) {
            bestCost = c; bestCnt = k; bestL = l
          }
        }
        l += 1
      }
      cost(i) = bestCost
      cnt(i) = bestCnt
      back(i) = bestL
      i += 1
    }
    if (outPieces != null) {
      // walk back, then reverse in place for left-to-right order
      val tmp = new java.util.ArrayList[String]()
      var j = nCp
      while (j > 0) {
        val l = back(j)
        tmp.add(w.substring(start(j - l), start(j)))
        j -= l
      }
      var r = tmp.size() - 1
      while (r >= 0) { outPieces.add(tmp.get(r)); r -= 1 }
    }
    cnt(nCp)
  }
}

/** `string` word → `int` unigram-LM token count against the embedded
  * piece table — the zero-shuffle production tokenize path: a pure
  * per-row projection, O(len × maxPieceLen) per word regardless of
  * vocabulary size. */
case class UnigramTokenCount(child: Expression, pieces: UnigramPieceTableRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_unigram_token_count"

  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.tokenCount(input.asInstanceOf[UTF8String], pieces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramPieces", pieces,
      classOf[UnigramPieceTableRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramKernel.tokenCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}
