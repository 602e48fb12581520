package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-aware sibling of [[GramDigests]]: one element per sliding
  * window of `gramTokens` consecutive TOKENS (tokens = the single-space
  * split, exactly Spark's `split(text, " ")` / DuckDB
  * `string_split(text, ' ')` — consecutive spaces yield empty tokens,
  * keeping offsets exact), carrying the 1-based CHARACTER range the
  * window covers plus the [[Digest60]] of that exact substring
  * (separators included). Discovery is token-granular — the published
  * suffix-array pipelines count 50-TOKEN windows, not char windows — but
  * the emitted spans stay char-ranged, so they feed
  * [[graft.operators.Dedup.stripSpans]] unchanged.
  *
  * Same rationale as [[GramDigests]] for being a whole-document kernel:
  * the composed higher-order-function form is CodegenFallback and pays
  * an interpreted round trip per window. This expression walks the
  * document's UTF-8 bytes once (a space is the single byte 0x20 and
  * never a continuation byte, so token boundaries fall out of the same
  * scan that counts codepoints) and md5s byte slices in place. Digests
  * are md5 over the window's UTF-8 bytes, so the DuckDB twin
  * `('0x' || substr(md5(substr(text, s, e - s + 1)), 1, 15))::bigint`
  * over the same token-offset arithmetic replays them exactly.
  */
case class TokenGramDigests(child: Expression, gramTokens: Int) extends UnaryExpression with NullIntolerantKernel {
  require(gramTokens > 0, s"gramTokens=$gramTokens must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_gram_digests"

  override protected def nullSafeEval(input: Any): Any =
    TokenGramDigests.tokenGramDigests(input.asInstanceOf[UTF8String], gramTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenGramDigests.tokenGramDigests($c, $gramTokens)")

  override protected def withNewChildInternal(newChild: Expression): TokenGramDigests =
    copy(child = newChild)
}

object TokenGramDigests {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** (s, e, digest60) of every `gramTokens`-token sliding window of `s`,
    * with s/e 1-based inclusive character offsets — called from generated
    * code, so it must be a public static (Java-visible) method. */
  def tokenGramDigests(str: UTF8String, gramTokens: Int): ArrayData = {
    val bytes = str.getBytes
    val nBytes = bytes.length
    // Token k (0-based) spans bytes [startByte(k), endByte(k)) and chars
    // [startChar(k), endChar(k)) (0-based exclusive ends; the bounding
    // spaces excluded). nTok = spaces + 1 — split semantics, empty
    // tokens included.
    var spaces = 0
    var b = 0
    while (b < nBytes) { if (bytes(b) == 0x20) spaces += 1; b += 1 }
    val nTok = spaces + 1
    val n = nTok - gramTokens + 1
    if (n <= 0) return Empty
    val startByte = new Array[Int](nTok)
    val startChar = new Array[Int](nTok)
    val endByte = new Array[Int](nTok)
    val endChar = new Array[Int](nTok)
    var t = 0
    var c = 0
    b = 0
    while (b < nBytes) {
      if (bytes(b) == 0x20) {
        endByte(t) = b; endChar(t) = c
        t += 1
        startByte(t) = b + 1; startChar(t) = c + 1
      }
      if ((bytes(b) & 0xc0) != 0x80) c += 1
      b += 1
    }
    endByte(t) = nBytes; endChar(t) = c
    val out = new Array[Any](n)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      val sB = startByte(i)
      val eB = endByte(i + gramTokens - 1)
      md.reset()
      md.update(bytes, sB, eB - sB)
      val d = md.digest()
      val h =
        (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      // 1-based inclusive char range: start = 0-based start + 1; end =
      // 0-based exclusive end (== 1-based inclusive end).
      out(i) = new GenericInternalRow(
        Array[Any](startChar(i) + 1, endChar(i + gramTokens - 1), h))
      i += 1
    }
    new GenericArrayData(out)
  }
}
