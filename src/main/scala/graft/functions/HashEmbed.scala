package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native feature-hashing embedding: text → `array<float>` signed
  * term-frequency vector in ONE codegen'd pass — split on single spaces,
  * 60-bit digest per token ([[Digest60]]), dimension `h mod dim`, sign
  * from the independent `(h div dim) mod 2` bit, accumulate ±1.
  *
  * This runs once per document — the whole embed step becomes a
  * zero-shuffle projection over the scan, where the composed form
  * (explode → digest → two HashAggregates) shuffles the token stream
  * twice. Components are exact small integers either way, so the two
  * forms are bit-identical (spec-pinned) and every downstream cosine
  * matches the DuckDB oracle replay.
  */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression with NullIntolerantKernel {

  require(dim > 0, s"dim=$dim must be positive")

  // Input contract: child evaluates to string (enforced by callers,
  // cf. CosineSimilarity — ExpectsInputTypes is private[sql]).
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override protected def nullSafeEval(input: Any): Any =
    HashEmbedKernel.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashEmbedKernel.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** Shared eval body for interpreted eval and generated Java. */
object HashEmbedKernel {
  def embed(text: UTF8String, dim: Int): UnsafeArrayData = {
    val v = new Array[Float](dim)
    // literal-space split, trailing empties kept then skipped — the exact
    // token stream of split(text, ' ') / DuckDB string_split(text, ' ')
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val h = Digest60.digest60(UTF8String.fromString(tok))
        val i = (h % dim).toInt
        v(i) += (if ((h / dim) % 2 == 0) 1.0f else -1.0f)
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(v)
  }
}
