package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the exact-substring dedup gram stream: ALL
  * `gramChars`-char sliding-window [[Digest60]] values of a document in
  * one call — element i (0-based) is the digest of the character window
  * starting at 1-based position i+1, so `posexplode` yields the
  * (position, digest) stream [[graft.operators.Dedup.repeatedSpans]]
  * consumes.
  *
  * Why a whole-document kernel instead of the one-liner
  * `transform(sequence(...), i -> digest60(substring(text, i, L)))`:
  * higher-order functions (`ArrayTransform`) are CodegenFallback — every
  * element pays an interpreted-eval round trip plus a boxed substring
  * allocation, which made the gram scan the dominant cost of the span
  * chain (measured ~2 s per pass at sf0.1 against ~0.2 s of actual md5
  * work). This expression runs inside WholeStageCodegen, walks the
  * document's UTF-8 bytes ONCE to find codepoint boundaries, and md5s
  * byte slices in place — zero per-gram string allocation. Values are
  * bit-identical to the composed form (md5 over the same UTF-8 bytes of
  * the same character windows; GramDigestsParitySpec pins it), so the
  * DuckDB oracle twin `('0x' || substr(md5(substr(text, pos, L)), 1,
  * 15))::bigint` is unchanged.
  */
case class GramDigests(child: Expression, gramChars: Int) extends UnaryExpression with NullIntolerantKernel {
  require(gramChars > 0, s"gramChars=$gramChars must be positive")

  // Input contract: child evaluates to string (enforced by callers, as
  // with Digest60 — ExpectsInputTypes is private[sql]).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_digests"

  override protected def nullSafeEval(input: Any): Any =
    GramDigests.gramDigests(input.asInstanceOf[UTF8String], gramChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramDigests.gramDigests($c, $gramChars)")

  override protected def withNewChildInternal(newChild: Expression): GramDigests =
    copy(child = newChild)
}

object GramDigests {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(Array.empty[Long])

  /** Digest60 of every L-char sliding window of `s` — called from
    * generated code, so it must be a public static (Java-visible) method.
    * Character = Unicode codepoint, exactly like `substring`/DuckDB
    * `substr`, so a supplementary character counts once and the md5 runs
    * over the window's UTF-8 bytes. */
  def gramDigests(s: UTF8String, gramChars: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // codepoint start offsets: off(k) = byte offset of the k-th character;
    // off(nChars) = total bytes (sentinel). UTF-8 continuation bytes have
    // the top two bits 10xxxxxx — everything else starts a character.
    val off = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xc0) != 0x80) { off(nChars) = b; nChars += 1 }
      b += 1
    }
    off(nChars) = nBytes
    val n = nChars - gramChars + 1
    if (n <= 0) return Empty
    val out = new Array[Long](n)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, off(i), off(i + gramChars) - off(i))
      val d = md.digest()
      out(i) =
        (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}
