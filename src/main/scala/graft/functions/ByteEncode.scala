package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-to-unicode encoding — the layer below a BYTE-LEVEL
  * BPE tokenizer (Radford et al. 2019, the released GPT-2 encoder's
  * `bytes_to_unicode`; every byte-level BPE stack since uses the same
  * table): each of a word's UTF-8 BYTES maps to one printable unicode
  * codepoint, injectively, so the downstream merge learner/applier can
  * treat "symbols" as codepoints while actually operating on bytes.
  *
  * The table keeps the 188 visually-printable single-byte codepoints as
  * themselves (0x21–0x7E, 0xA1–0xAC, 0xAE–0xFF) and relocates the other
  * 68 bytes (controls, space, soft hyphen…) to 256+n in ascending byte
  * order — so the encoded string never contains whitespace, control
  * characters, or U+001F, which removes the symbol-delimiter-collision
  * class from byte-level BPE entirely (any raw byte 0x1F encodes to
  * U+0114... specifically 256+31).
  *
  * Cross-engine contract: the mapping is THIS table (exposed via
  * [[ByteEncodeKernel.table]]); the DuckDB oracle replays it by joining
  * each byte of `encode(word)`'s hex dump against a 256-row VALUES list
  * interpolated from the same array, so the two engines cannot drift.
  */
object ByteEncodeKernel {

  /** byte value (0..255) → its single-codepoint string. */
  val table: Array[String] = {
    val kept = (0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)
    val keptSet = kept.toSet
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keptSet(b)) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
      b += 1
    }
    out
  }

  /** Encode a word's UTF-8 bytes to the mapped-codepoint string. Called
    * from generated code — public static-reachable. */
  def encode(word: UTF8String): UTF8String = {
    val bytes = word.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(table(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Driver-side twin of [[encode]] for the byte-level trainer. */
  def encodeString(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(table(bytes(i) & 0xff))
      i += 1
    }
    sb.toString
  }
}

/** `string` word → its byte-encoded form (one mapped codepoint per UTF-8
  * byte) — the zero-shuffle projection under every byte-level BPE path.
  * A pure per-row map (cost ∝ word bytes); composes with
  * [[BpeTokenCount]] so byte-level tokenization is the same scan-speed
  * kernel chain as the codepoint flavor. */
case class ByteEncode(child: Expression)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_encode"

  override protected def nullSafeEval(input: Any): Any =
    ByteEncodeKernel.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteEncodeKernel.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteEncode =
    copy(child = newChild)
}
