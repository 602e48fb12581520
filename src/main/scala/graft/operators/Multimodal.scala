package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Parse each payload's container header into
    * `struct<format:string, width:int, height:int>` (NULL for payloads
    * that are not a recognized image container) — REAL byte parsing,
    * not the decode stub: PNG IHDR, the JPEG SOFn marker walk, GIF's
    * screen descriptor, and BMP's info header are public byte layouts
    * that need no codec library ([[graft.functions.MediaHeaderKernel]]).
    * Runs inside WholeStageCodegen like every graft kernel, so a
    * lake-wide "what formats/dimensions do we have" scan never leaves
    * Tungsten rows and never decodes a pixel. */
  def headerMeta(withPayload: DataFrame, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(withPayload.sparkSession)
    withPayload.withColumn("hdr",
      call_function("graft_media_header", col("payload")))
  }

  /** Deterministic synthetic image payloads for the test corpus (which
    * has no binary media): real PNG / JPEG / GIF byte streams — correct
    * signatures, chunk/segment structure, and dimension fields derived
    * from the doc id — plus a non-image garbage payload every 7th doc,
    * so [[headerMeta]] exercises every parser branch including the NULL
    * contract. The JPEG variant includes an APP0 segment before SOF0,
    * so the marker WALK (not just a fixed offset) is what recovers the
    * dimensions. */
  def synthesizeImagePayloads(df: DataFrame, idCol: String): DataFrame = {
    def be16(v: Column) = unhex(lpad(hex(v), 4, "0"))
    def be32(v: Column) = unhex(lpad(hex(v), 8, "0"))
    def le16(v: Column) = {
      val hx = lpad(hex(v), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val w = (col(idCol) % 1920 + 1).cast("int")
    val h = (col(idCol) % 1080 + 1).cast("int")
    val png = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be32(w), be32(h), unhex(lit("0806000000")))
    val jpeg = concat(
      unhex(lit("FFD8" + "FFE00010" + "4A46494600010100000100010000" +
        "FFC00011" + "08")),
      be16(h), be16(w))
    val gif = concat(
      unhex(lit("474946383961")), le16(w), le16(h), unhex(lit("F70000")))
    val payload = when(col(idCol) % 7 === 3, unhex(lit("00112233445566778899AABBCC")))
      .when(col(idCol) % 3 === 0, png)
      .when(col(idCol) % 3 === 1, jpeg)
      .otherwise(gif)
    df.withColumn("payload", payload)
  }

  val FeatureDim: Int = graft.functions.DecodeKernel.FeatureDim

  /** Decode the binary payload to a fixed-width feature vector — the
    * PRODUCTION path: a native codegen'd Catalyst expression
    * ([[graft.functions.DecodeFeatures]]), so scan → decode → downstream
    * stays in ONE WholeStageCodegen span with every column in Tungsten
    * format (no DeserializeToObject / object-space round trip). The
    * decode body is the sanctioned deterministic STUB; a real deployment
    * swaps the kernel for a JNI/FFM codec binding and this plan shape is
    * exactly what it compiles to. */
  def decodeFeatures(withPayload: DataFrame, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(withPayload.sparkSession)
    withPayload.select(
      col(idCol).cast("long").as(idCol),
      call_function("graft_decode_features", col("payload")).as("features"))
  }

  /** The per-partition BATCH-CONTRACT twin of [[decodeFeatures]]: typed
    * `mapPartitions` over (id, payload) → (id, features) — the shape a
    * PySpark `mapInPandas`/`mapInArrow` deployment (or a codec that wants
    * amortized per-batch init, e.g. one decoder context per partition)
    * plugs into. Costs the object-space boundary the expression path
    * avoids; kept because the partition-iterator contract, not the plan
    * shape, is what a Python/Arrow integration must match. Produces
    * identical rows to [[decodeFeatures]]. */
  def decodeFeaturesTyped(withPayload: DataFrame, idCol: String): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, fakeFeatures(bytes)) })
      .toDF(idCol, "features")
  }

  /** Deterministic stand-in features — delegates to the shared kernel so
    * both decode paths produce bit-identical vectors. */
  private[operators] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
    val a = graft.functions.DecodeKernel.decode(bytes)
    a.toFloatArray()
  }
}
