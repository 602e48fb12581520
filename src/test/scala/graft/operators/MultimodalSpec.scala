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

  // ---- AvHeaderKernel: audio/video container parsing, golden bytes ---

  private def avParsed(b: Array[Byte])
      : Option[(String, Option[Int], Option[Int], Option[Long])] =
    Option(graft.functions.AvHeaderKernel.parse(b)).map(r => (
      r.getUTF8String(0).toString,
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3))))

  test("av header: WAV chunk walk past JUNK to fmt/data, declared-size duration") {
    // stereo 16000 Hz PCM16 → byte rate 64000; data 128000 bytes → 2000 ms
    val wav = hx("52494646 00F40100 57415645" + // RIFF + size + WAVE
      "4A554E4B 04000000 DEADBEEF" +           // JUNK chunk (the walk)
      "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000" + // fmt
      "64617461 00F40100")                     // data, declared 128000
    assert(avParsed(wav).contains(("wav", Some(2), Some(16000), Some(2000L))))
    // odd-sized chunk is word-aligned: a 3-byte chunk then fmt/data
    val padded = hx("52494646 00000000 57415645" +
      "4A554E4B 03000000 AABBCC 00" +          // 3-byte chunk + pad byte
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 401F0000")                     // mono 8000 Hz, 8000 B → 500 ms
    assert(avParsed(padded).contains(("wav", Some(1), Some(8000), Some(500L))))
    // fmt present but no data chunk → null (duration unpriceable)
    assert(avParsed(hx("52494646 00000000 57415645" +
      "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000")).isEmpty)
    // truncated mid-fmt → null
    assert(avParsed(hx("52494646 00000000 57415645 666D7420 10000000 0100")).isEmpty)
  }

  test("av header: MP3 ID3v2 skip, frame decode, Xing frame count") {
    // ID3v2 with syncsafe size 10, then MPEG1 L3 44100 stereo,
    // 32-byte side info, Xing with 105 frames → 105*1152*1000/44100 = 2742 ms
    val mp3 = hx("494433 0400 00 0000000A" + "00" * 10 +
      "FFFB 90 00" + "00" * 32 +
      "58696E67 00000001 00000069")
    assert(avParsed(mp3).contains(("mp3", Some(2), Some(44100), Some(2742L))))
    // mono → 17-byte side info, "Info" tag, 48000 Hz: 50*1152*1000/48000 = 1200
    val mono = hx("FFFB 94 C0" + "00" * 17 + "496E666F 00000001 00000032")
    assert(avParsed(mono).contains(("mp3", Some(1), Some(48000), Some(1200L))))
    // a frame without Xing: format/channels/rate parse, duration NULL
    val noXing = hx("FFFB 98 00" + "00" * 40)
    assert(avParsed(noXing).contains(("mp3", Some(2), Some(32000), None)))
    // reserved sample-rate index → null; ID3 prefix with nothing after → null
    assert(avParsed(hx("FFFB 9C 00" + "00" * 40)).isEmpty)
    assert(avParsed(hx("494433 0400 00 0000000A" + "00" * 10)).isEmpty)
    // ID3v2.4 FOOTER flag (0x10): tag occupies 10 + size + 10 bytes —
    // the frame header sits past the footer, not at 10 + size
    val footered = hx("494433 0400 10 0000000A" + "00" * 10 +
      "334449 0400 10 0000000A" + // the footer ('3DI' + mirrored header)
      "FFFB 90 00" + "00" * 32 +
      "58696E67 00000001 00000069")
    assert(avParsed(footered).contains(("mp3", Some(2), Some(44100), Some(2742L))))
  }

  test("av header: FLAC STREAMINFO bit unpack") {
    // 44100 Hz stereo 16-bit, 132300 samples → 3000 ms
    // packed u64 = 44100<<44 | 1<<41 | 15<<36 | 132300
    val packed = (44100L << 44) | (1L << 41) | (15L << 36) | 132300L
    val flac = hx("664C6143 80 000022" + "1000 1000 000000 000000" +
      f"$packed%016X" + "00" * 16)
    assert(avParsed(flac).contains(("flac", Some(2), Some(44100), Some(3000L))))
    // total_samples 0 = unknown per spec → NULL duration
    val unk = (8000L << 44) | (0L << 41) | (15L << 36)
    val flacUnk = hx("664C6143 80 000022" + "1000 1000 000000 000000" +
      f"$unk%016X" + "00" * 16)
    assert(avParsed(flacUnk).contains(("flac", Some(1), Some(8000), None)))
    // first block not STREAMINFO → null; truncated → null
    assert(avParsed(hx("664C6143 84 000022" + "00" * 34)).isEmpty)
    assert(avParsed(hx("664C6143 80 0000")).isEmpty)
  }

  test("av header: MP4 box walk to moov/mvhd, v0 and v1") {
    // ftyp, free, moov > mvhd v0: timescale 600, duration 1500 → 2500 ms
    val v0 = hx("00000010 66747970 69736F6D 00000200" +
      "00000010 66726565 0000000000000000" +
      "00000074 6D6F6F76" +
      "0000006C 6D766864 00000000 00000000 00000000 00000258 000005DC")
    assert(avParsed(v0).contains(("mp4", None, None, Some(2500L))))
    // mvhd v1: 64-bit times — timescale 1000 at +20, u64 duration at +24
    val v1 = hx("00000010 66747970 69736F6D 00000200" +
      "00000084 6D6F6F76" +
      "0000007C 6D766864 01000000" +
      "0000000000000000 0000000000000000" + // 64-bit ctime/mtime
      "000003E8" + "0000000000001770")      // ts 1000, dur 6000 → 6000 ms
    assert(avParsed(v1).contains(("mp4", None, None, Some(6000L))))
    // moov without mvhd → null; zero timescale → null; not-ftyp-first → null
    assert(avParsed(hx("00000010 66747970 69736F6D 00000200" +
      "00000010 6D6F6F76 0000000866726565")).isEmpty)
    assert(avParsed(hx("00000010 66747970 69736F6D 00000200" +
      "00000074 6D6F6F76" +
      "0000006C 6D766864 00000000 00000000 00000000 00000000 000005DC")).isEmpty)
    assert(avParsed(hx("00000010 66726565 69736F6D 00000200")).isEmpty)
  }

  test("av header: fuzz — arbitrary bytes classify (row or null), never throw") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val sigs = Seq(
      "RIFF".getBytes("US-ASCII"), "fLaC".getBytes("US-ASCII"),
      "ID3".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xfb.toByte),
      hx("00000010 66747970"))
    val payloadGen: Gen[Array[Byte]] = for {
      prefix <- Gen.frequency(2 -> Gen.const(Array.empty[Byte]), 5 -> Gen.oneOf(sigs))
      tail <- Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield prefix ++ tail
    val prop = forAll(payloadGen) { bytes =>
      val r = graft.functions.AvHeaderKernel.parse(bytes)
      r == null || (Set("wav", "mp3", "flac", "mp4")
        .contains(r.getUTF8String(0).toString) &&
        (r.isNullAt(3) || r.getLong(3) >= 0))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("av header: garbage, empty, and text payloads are null") {
    assert(avParsed(Array.empty[Byte]).isEmpty)
    assert(avParsed("just some document text".getBytes("UTF-8")).isEmpty)
    assert(avParsed(hx("DEADBEEF00112233445566778899AABB")).isEmpty)
    assert(avParsed(null).isEmpty)
  }

  test("avHeaderMeta over synthesized payloads: codegen parse recovers the id arithmetic") {
    val ids = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.avHeaderMeta(
        Multimodal.synthesizeAvPayloads(ids, "doc_id"), "doc_id")
      .select(col("doc_id"), col("av.format"), col("av.channels"),
        col("av.sample_rate"), col("av.duration_ms"))
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 11 == 5) assert(r.isNullAt(1), s"doc $id should be garbage")
      else {
        val fmt = Seq("wav", "mp3", "flac", "mp4")((id % 4).toInt)
        assert(r.getString(1) == fmt, s"doc $id format")
        if (fmt == "mp4") { assert(r.isNullAt(2) && r.isNullAt(3), s"doc $id mp4 nulls") }
        else {
          assert(r.getInt(2) == (id % 2 + 1).toInt, s"doc $id channels")
          val sr = if (fmt == "mp3") Seq(44100, 48000, 32000)((id % 3).toInt)
                   else 8000 + (id % 8).toInt * 4000
          assert(r.getInt(3) == sr, s"doc $id rate")
        }
        val dur = fmt match {
          case "wav" => id % 50 + 1
          case "mp3" =>
            (id % 200 + 1) * 1152L * 1000L / Seq(44100, 48000, 32000)((id % 3).toInt)
          case "flac" => id % 60 + 1
          case "mp4" => id % 9000 + 1
        }
        assert(r.getLong(4) == dur, s"doc $id duration")
      }
    }
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
