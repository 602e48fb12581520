package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's shared 60-bit content
  * digest — the value of `conv(substring(md5(x), 1, 15), 16, 10)` (DuckDB
  * twin `('0x' || substr(md5(x), 1, 15))::bigint`) computed straight from
  * the MD5 bytes: the first 15 hex characters are the first 60 bits of
  * the digest, i.e. the big-endian first-8-bytes long shifted right by a
  * nibble.
  *
  * This digest sits under every shingle/token hash in the dedup,
  * curation, and sketch families — at 100 TB it runs once per shingle
  * occurrence, making it the second-hottest instruction stream after
  * `graft_cosine`. The composed form allocates a 32-char hex string,
  * substrings it, and re-parses it base-16 per row; this expression hashes
  * the UTF8 bytes and assembles the long with zero intermediate
  * allocation. Bit-identical by construction (spec-proven against the
  * composed form), so every oracle stays valid.
  */
case class Digest60(child: Expression) extends UnaryExpression with NullIntolerantKernel {

  // Input contract: child evaluates to string (enforced by callers, as
  // with CosineSimilarity — ExpectsInputTypes is private[sql]).
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_digest60"

  override protected def nullSafeEval(input: Any): Any =
    Digest60.digest60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Digest60.digest60($c)")

  override protected def withNewChildInternal(newChild: Expression): Digest60 =
    copy(child = newChild)
}

object Digest60 {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long — called from
    * generated code, so it must be a public static (Java-visible) method. */
  def digest60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian first 8 bytes, dropped low nibble = first 15 hex chars
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
