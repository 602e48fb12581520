package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths, same registry entries:
  *  - cluster deployment: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point);
  *  - library use: [[GraftFunctions.register]] on an existing session
  *    (idempotent) — lets `functions.call_function("graft_cosine", ...)`
  *    and SQL both resolve without session-construction control.
  */
object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b) takes two array<float> arguments")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("graft_cosine_d"),
      new ExpressionInfo(classOf[CosineSimilarityD].getName, "graft_cosine_d"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine_d(a, b) takes two array<double> arguments")
        CosineSimilarityD(args.head, args(1))
      }),
    (FunctionIdentifier("graft_digest60"),
      new ExpressionInfo(classOf[Digest60].getName, "graft_digest60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_digest60(s) takes one string argument")
        Digest60(args.head)
      }),
    (FunctionIdentifier("graft_shingle_digests"),
      new ExpressionInfo(classOf[ShingleDigests].getName, "graft_shingle_digests"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_shingle_digests(tokens, text, n) takes tokens, text, and a literal n")
        val n = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingle_digests n must be an int literal, got $other")
        }
        ShingleDigests(args.head, args(1), n)
      }),
    (FunctionIdentifier("graft_quantize_sq8"),
      new ExpressionInfo(classOf[QuantizeSq8].getName, "graft_quantize_sq8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_quantize_sq8(v) takes one array<float> argument")
        QuantizeSq8(args.head)
      }),
    (FunctionIdentifier("graft_int_dot"),
      new ExpressionInfo(classOf[IntDotProduct].getName, "graft_int_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_int_dot(a, b) takes two array<int> arguments")
        IntDotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_float_dot(a, b) takes two array<float> arguments")
        FloatDotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_pq_adc(lut, codes, k) takes a LUT, a code vector, and a literal codebook size")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_pq_adc codebook size must be an int literal, got $other")
        }
        PqAdcScore(args.head, args(1), k)
      }),
    (FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_hash_embed(text, dim) takes a string and a literal dimension")
        val d = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_hash_embed dim must be an int literal, got $other")
        }
        HashEmbed(args.head, d)
      }),
    (FunctionIdentifier("graft_decode_features"),
      new ExpressionInfo(classOf[DecodeFeatures].getName, "graft_decode_features"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_decode_features(payload) takes one binary argument")
        DecodeFeatures(args.head)
      }),
    (FunctionIdentifier("graft_media_header"),
      new ExpressionInfo(classOf[MediaHeader].getName, "graft_media_header"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_media_header(payload) takes one binary argument")
        MediaHeader(args.head)
      }),
    (FunctionIdentifier("graft_av_header"),
      new ExpressionInfo(classOf[AvHeader].getName, "graft_av_header"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_av_header(payload) takes one binary argument")
        AvHeader(args.head)
      }),
    (FunctionIdentifier("graft_gram_digests"),
      new ExpressionInfo(classOf[GramDigests].getName, "graft_gram_digests"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_gram_digests(text, gramChars) takes a string and a literal width")
        val l = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_gram_digests gramChars must be an int literal, got $other")
        }
        GramDigests(args.head, l)
      }),
    (FunctionIdentifier("graft_token_gram_digests"),
      new ExpressionInfo(classOf[TokenGramDigests].getName, "graft_token_gram_digests"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_token_gram_digests(text, gramTokens) takes a string and a literal width")
        val l = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_token_gram_digests gramTokens must be an int literal, got $other")
        }
        TokenGramDigests(args.head, l)
      }),
    (FunctionIdentifier("graft_byte_encode"),
      new ExpressionInfo(classOf[ByteEncode].getName, "graft_byte_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_byte_encode(word) takes one string argument")
        ByteEncode(args.head)
      }),
    (FunctionIdentifier("graft_phash"),
      new ExpressionInfo(classOf[PHash64].getName, "graft_phash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_phash(payload) takes one binary argument")
        PHash64(args.head)
      }),
    (FunctionIdentifier("graft_synth_bmp"),
      new ExpressionInfo(classOf[SynthBmp].getName, "graft_synth_bmp"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_synth_bmp(id) takes one bigint argument")
        SynthBmp(args.head)
      }),
    (FunctionIdentifier("graft_bmp_tile"),
      new ExpressionInfo(classOf[BmpLumaTile].getName, "graft_bmp_tile"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_bmp_tile(payload) takes one binary argument")
        BmpLumaTile(args.head)
      }),
    (FunctionIdentifier("graft_phash_bmp"),
      new ExpressionInfo(classOf[PHashBmp].getName, "graft_phash_bmp"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_phash_bmp(payload) takes one binary argument")
        PHashBmp(args.head)
      }))

  /** Per-session once: the FIRST call on a session registers with
    * overwrite (so graft's builders win over any stale or same-named
    * foreign registration — a name-exists guard would silently keep the
    * foreign one); later calls are a map lookup, because operators invoke
    * this per call and re-registering takes a synchronized registry write
    * plus a 'replaced a previously registered function' WARN each time. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      val registry = spark.sessionState.functionRegistry
      all.foreach { case (ident, info, builder) =>
        registry.registerFunction(ident, info, builder)
      }
    }
  }

  /** Functions + optimizer rules + planner strategies on a live session. */
  def installAll(spark: SparkSession): Unit = {
    register(spark)
    graft.plans.GraftOptimizations.install(spark)
    org.apache.spark.sql.GraftSqlBridge.addStrategy(spark, graft.plans.TopKPerKeyStrategy)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.DerivedPredicatePushdown)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
