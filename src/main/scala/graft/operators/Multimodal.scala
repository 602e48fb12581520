package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star operator; absent from the
  * reference). Media payloads are opaque `binary` columns with a typed
  * metadata struct alongside; decode / feature-extraction runs over
  * `mapPartitions` with a deterministic STUB in place of the actual codec
  * (image/audio libraries are not in this container — see the builder
  * brief). The Spark-side contract — schema, batching, partitioning, the
  * shape a Pandas-UDF/`mapInPandas` stage would see — is real and tested.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata. In production the payload
    * column arrives from the source (e.g. parquet `binary`); here the test
    * corpus is text, so the payload is its UTF-8 bytes. Metadata is
    * computed with built-ins only (codegen'd): byte length, sha256 digest,
    * and a leading-bytes "magic" tag — exactly what a 100 TB scan should
    * push down to instead of decoding media to answer metadata queries. */
  def attachPayload(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        length(payload).as("byte_len"),
        sha2(payload, 256).as("sha256"),
        lower(hex(substring(payload, 1, 4))).as("magic")).as("meta"))
  }

  /** Deterministic frame sampling: one row per sampled frame index, stride
    * `frameStride` over a fake duration derived from payload size. Pure
    * generator (posexplode over sequence) — distributes with the data, no
    * driver loop. */
  def sampleFrames(withPayload: DataFrame, idCol: String, frameStride: Int): DataFrame = {
    val nFrames = greatest(lit(1), (col("meta.byte_len") / lit(frameStride)).cast("int"))
    withPayload
      .select(col(idCol), posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_no", "__x")))
      .select(
        col(idCol), col("frame_no"),
        md5(concat(col(idCol).cast("string"), lit(":"), col("frame_no").cast("string"))).as("frame_hash"))
  }

  val FeatureDim = 8

  /** ??? DECODE STUB ??? — stands in for the real image/audio decoder
    * (e.g. JPEG decode → resize → CNN features via a Pandas UDF /
    * `mapInPandas` in PySpark, or a JNI codec here). Produces a
    * deterministic fake feature vector from the payload bytes so the
    * pipeline shape (binary in → fixed-width float vector out, batch
    * iteration per partition, no driver collect) is fully exercised.
    * Swap `fakeFeatures` for the real codec; nothing else changes. */
  def decodeFeatures(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    // Typed mapPartitions with encoders — the plan stays one Dataset
    // pipeline (DeserializeToObject → MapPartitions → SerializeFromObject)
    // with codegen on both sides, instead of an RDD round-trip that would
    // cut the plan in two and re-analyze. A PySpark deployment swaps this
    // stage for `mapInPandas` over the same (id, payload) → (id, features)
    // batch contract; nothing upstream or downstream changes.
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, fakeFeatures(bytes)) })
      .toDF(idCol, "features")
  }

  /** Deterministic stand-in features: byte-sum statistics per stripe. */
  private[operators] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out.map(v => v / math.max(1, bytes.length / FeatureDim).toFloat)
  }
}
