package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle digests: (tokens, text) → `array<long>` of the
  * 60-bit content digests of every n-token shingle — bit-identical to
  * `transform(sequence(...), i -> digest60(concat_ws(" ", slice(toks, i,
  * n))))` with NO intermediate shingle strings: each window streams its
  * token bytes (with single-space separators) straight through MD5.
  * Documents shorter than `n` tokens digest the whole text, exactly like
  * [[graft.operators.Dedup.shingles]].
  *
  * This is the front of every shingle-consuming chain (exact Jaccard,
  * MinHash/LSH, estimated Jaccard, decontamination): at 100 TB it runs
  * once per shingle occurrence, and the composed form walks an
  * interpreted lambda per window, allocating a token-slice array and a
  * joined string per shingle — ~half the cost of the heaviest dedup
  * queries at sf0.1. The DuckDB oracles are unchanged: they digest the
  * same bytes (`('0x' || substr(md5(shingle), 1, 15))::bigint` over the
  * string-built shingle).
  */
case class ShingleDigests(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with NullIntolerantKernel {

  require(n >= 1, s"shingle width n=$n must be at least 1")

  // Input contract: left is array<string> (the pre-split tokens), right
  // is the raw text (enforced by the operator callers — ExpectsInputTypes
  // is private[sql], cf. CosineSimilarity).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_digests"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.digests(a.asInstanceOf[ArrayData], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleKernel.digests($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleDigests =
    copy(left = newLeft, right = newRight)
}

/** Shared windows-in/digests-out body for interpreted eval and generated
  * Java. */
object ShingleKernel {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Space = Array(' '.toByte)

  /** First 60 bits of the digest bytes — same assembly as
    * [[Digest60.digest60]]. */
  private def first60(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4

  def digests(toks: ArrayData, text: UTF8String, n: Int): UnsafeArrayData = {
    val len = toks.numElements()
    val md = md5Local.get()
    if (len >= n) {
      val out = new Array[Long](len - n + 1)
      var i = 0
      while (i < out.length) {
        md.reset()
        var j = 0
        while (j < n) {
          if (j > 0) md.update(Space)
          md.update(toks.getUTF8String(i + j).getBytes)
          j += 1
        }
        out(i) = first60(md.digest())
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      md.reset()
      UnsafeArrayData.fromPrimitiveArray(Array(first60(md.digest(text.getBytes))))
    }
  }
}
