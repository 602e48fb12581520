package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def docs = Seq((0L, "tiny doc"), (1L, "x" * 500)).toDF("doc_id", "text")

  test("attachPayload: binary payload with typed metadata struct") {
    val out = Multimodal.attachPayload(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").toSeq == "tiny doc".getBytes("UTF-8").toSeq)
    val meta = out(0).getStruct(2)
    assert(meta.getInt(0) == 8)              // byte_len
    assert(meta.getString(1).length == 64)   // sha256 hex
    assert(meta.getString(2) == "74696e79")  // magic = hex("tiny")
  }

  test("sampleFrames: deterministic generator, stride over payload size") {
    val wp = Multimodal.attachPayload(docs, "text", "doc_id")
    val frames = Multimodal.sampleFrames(wp, "doc_id", frameStride = 100)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(0L) == 1)  // 8 bytes → max(1, 0) = 1 frame
    assert(byDoc(1L) == 5)  // 500 bytes / 100 = 5 frames
    // frame hashes are deterministic md5(id:frame)
    val f0 = frames.filter(col("doc_id") === 0 && col("frame_no") === 0)
      .select("frame_hash").as[String].head()
    assert(f0 == org.apache.commons.codec.digest.DigestUtils.md5Hex("0:0"))
  }

  test("decodeFeatures: stubbed decoder preserves schema/batch contract") {
    val wp = Multimodal.attachPayload(docs, "text", "doc_id")
    val feats = Multimodal.decodeFeatures(wp, "doc_id").orderBy("doc_id").collect()
    assert(feats.length == 2)
    val v = feats(0).getSeq[Float](1)
    assert(v.length == Multimodal.FeatureDim)
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(wp, "doc_id").orderBy("doc_id").collect()
    assert(again(0).getSeq[Float](1) == v)
  }

  test("decodeFeatures (native expression) ≡ decodeFeaturesTyped (batch contract)") {
    val wp = Multimodal.attachPayload(docs, "text", "doc_id")
    val native = Multimodal.decodeFeatures(wp, "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val typed = Multimodal.decodeFeaturesTyped(wp, "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(native.toSeq == typed.toSeq)
  }

  test("decodeFeatures plan stays columnar: one codegen span, no object boundary") {
    // parquet-backed input: a local Seq collapses to LocalTableScan (the
    // optimizer constant-folds the whole decode), hiding the plan shape
    val real = spark.read.parquet(s"$Sf0001/documents.parquet")
    val wp = Multimodal.attachPayload(real, "text", "doc_id")
    val plan = Multimodal.decodeFeatures(wp, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("SerializeFromObject"),
      "native decode must not exit Tungsten into object space")
    assert(!plan.contains("ExistingRDD"), "not createDataFrame(rdd, …)")
    assert(plan.contains("*(1) Project"), // '*' = WholeStageCodegen span
      "decode must run inside codegen")
  }

  test("decodeFeaturesTyped keeps the partition-iterator contract in one pipeline") {
    val wp = Multimodal.attachPayload(docs, "text", "doc_id")
    val plan = Multimodal.decodeFeaturesTyped(wp, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SerializeFromObject")) // typed mapPartitions stage
    assert(!plan.contains("ExistingRDD"))        // not createDataFrame(rdd, …)
  }
}
