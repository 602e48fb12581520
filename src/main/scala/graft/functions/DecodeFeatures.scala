package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native media-decode expression: `binary` payload → fixed-width
  * `array<float>` feature vector, evaluated INSIDE WholeStageCodegen — the
  * Scala-production shape of the multimodal decode stage. A typed
  * `mapPartitions` (the previous form, kept as
  * [[graft.operators.Multimodal.decodeFeaturesTyped]]) cuts the plan at
  * DeserializeToObject/SerializeFromObject: every upstream column leaves
  * Tungsten format, the codegen span ends, and per-row Scala tuples are
  * allocated either side of the lambda. This expression keeps the scan →
  * decode → downstream pipeline in ONE codegen span; the per-row cost is a
  * static JVM call — exactly what a production JNI/FFM codec binding
  * (libjpeg-turbo, ffmpeg) compiles to.
  *
  * The decode body itself is the sanctioned DETERMINISTIC STUB (this
  * container ships no media codecs — see [[DecodeKernel.decode]]); the
  * expression, types, null contract, and plan shape are the real thing.
  * Swap the kernel body for the codec; nothing else changes.
  */
case class DecodeFeatures(child: Expression) extends UnaryExpression with NullIntolerantKernel {

  // Input contract: child evaluates to binary (enforced by callers in
  // graft.operators — ExpectsInputTypes is private[sql], cf. CosineSimilarity).
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_decode_features"

  override protected def nullSafeEval(input: Any): Any =
    DecodeKernel.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecodeKernel.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeFeatures =
    copy(child = newChild)
}

/** The decode kernel — one static entry point so generated Java and
  * interpreted eval share the exact same bytes-in/vector-out body. */
object DecodeKernel {

  val FeatureDim = 8

  /** ??? DECODE STUB ??? — stands in for the real image/audio decoder.
    * Deterministic fake features (per-stripe byte-sum statistics) so the
    * full pipeline shape — binary in, fixed-width float vector out, zero
    * object allocation beyond the result array — is exercised end to end.
    * Returns [[UnsafeArrayData]] so the result lands in Tungsten format
    * without a copy-through-GenericArrayData. */
  def decode(bytes: Array[Byte]): UnsafeArrayData = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val norm = math.max(1, bytes.length / FeatureDim).toFloat
    var j = 0
    while (j < FeatureDim) { out(j) /= norm; j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
