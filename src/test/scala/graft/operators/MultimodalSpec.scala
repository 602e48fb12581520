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

  // ---- MediaHeaderKernel: real container parsing, golden bytes --------

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parsed(b: Array[Byte]): Option[(String, Int, Int)] =
    Option(graft.functions.MediaHeaderKernel.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("media header: PNG IHDR big-endian dimensions") {
    // 640×480 PNG header exactly as libpng writes it
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 06 000000")
    assert(parsed(png).contains(("png", 640, 480)))
    // signature right, IHDR not first chunk → null, not garbage values
    assert(parsed(hx("89504E470D0A1A0A 0000000D 58585858 00000280 000001E0 0806000000")).isEmpty)
    // truncated mid-IHDR
    assert(parsed(hx("89504E470D0A1A0A 0000000D 494844")).isEmpty)
  }

  test("media header: JPEG marker walk reaches SOFn past other segments") {
    // SOI, APP0 (JFIF), DQT-ish segment, SOF0 8-bit 320×240 (h=F0, w=140)
    val jpeg = hx("FFD8" +
      "FFE00010 4A46494600010100000100010000" + // APP0, len 16
      "FFDB0005 001122" +                        // arbitrary segment, len 5
      "FFC00011 08 00F0 0140")                   // SOF0: precision, h, w
    assert(parsed(jpeg).contains(("jpeg", 320, 240)))
    // progressive (SOF2) and fill bytes before the marker both legal
    val sof2 = hx("FFD8 FFFFFFC2000B 08 0010 0020")
    assert(parsed(sof2).contains(("jpeg", 32, 16)))
    // DHT (C4) must NOT match as a frame header
    val dht = hx("FFD8 FFC40008 080010002000 FFC00011 08 0008 0004")
    assert(parsed(dht).contains(("jpeg", 4, 8)))
    // SOS before any SOF → no dimensions recoverable
    assert(parsed(hx("FFD8 FFDA0008 080010002000 0000")).isEmpty)
    // truncated before the SOF payload
    assert(parsed(hx("FFD8 FFC00011 08 00")).isEmpty)
  }

  test("media header: GIF and BMP little-endian dimensions") {
    assert(parsed(hx("474946383961 8002 E001 F70000")) // GIF89a 640×480
      .contains(("gif", 640, 480)))
    assert(parsed(hx("474946383761 0A00 0500 F70000")) // GIF87a 10×5
      .contains(("gif", 10, 5)))
    // BMP BITMAPINFOHEADER, 100×50, plus top-down variant (negative h)
    val bmpHead = "424D 46000000 00000000 36000000 28000000"
    assert(parsed(hx(bmpHead + "64000000 32000000")).contains(("bmp", 100, 50)))
    assert(parsed(hx(bmpHead + "64000000 CEFFFFFF")).contains(("bmp", 100, 50)))
  }

  test("media header: fuzz — arbitrary bytes classify (row or null), never throw") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // pure-JVM kernel, so thousands of cases are cheap; bias toward
    // near-miss prefixes (valid signatures + garbage tails) since random
    // bytes almost never enter the deeper parse branches
    val sigs = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "GIF89a".getBytes("US-ASCII"), "GIF87a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"))
    val payloadGen: Gen[Array[Byte]] = for {
      prefix <- Gen.frequency(
        2 -> Gen.const(Array.empty[Byte]),
        5 -> Gen.oneOf(sigs))
      tail <- Gen.containerOf[Array, Byte](
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield prefix ++ tail
    val prop = forAll(payloadGen) { bytes =>
      val r = graft.functions.MediaHeaderKernel.parse(bytes)
      // a parsed header must carry a known format and positive dims
      r == null || (Set("png", "jpeg", "gif", "bmp")
        .contains(r.getUTF8String(0).toString) &&
        r.getInt(1) > 0 && r.getInt(2) > 0)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("media header: garbage, empty, and text payloads are null") {
    assert(parsed(Array.empty[Byte]).isEmpty)
    assert(parsed("just some document text".getBytes("UTF-8")).isEmpty)
    assert(parsed(hx("00112233445566778899AABBCC")).isEmpty)
    assert(parsed(null).isEmpty)
  }

  test("headerMeta over synthesized payloads: codegen parse recovers the id arithmetic") {
    val ids = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.headerMeta(
        Multimodal.synthesizeImagePayloads(ids, "doc_id"), "doc_id")
      .select(col("doc_id"), col("hdr.format"), col("hdr.width"), col("hdr.height"))
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 3) assert(r.isNullAt(1), s"doc $id should be garbage")
      else {
        val fmt = if (id % 3 == 0) "png" else if (id % 3 == 1) "jpeg" else "gif"
        assert(r.getString(1) == fmt, s"doc $id format")
        assert(r.getInt(2) == (id % 1920 + 1).toInt, s"doc $id width")
        assert(r.getInt(3) == (id % 1080 + 1).toInt, s"doc $id height")
      }
    }
  }
}
