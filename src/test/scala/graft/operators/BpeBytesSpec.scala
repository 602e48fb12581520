package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE (the GPT-2 byte encoder below the merge table):
  * the encoding table's structure, the ASCII-corpus differential vs
  * the codepoint trainer (identical merges — the encoding is the
  * identity on printable ASCII), multi-byte behavior, the driver ≡
  * distributed learner agreement, and the kernel ≡ chained apply. */
class BpeBytesSpec extends SparkSpec {

  import graft.functions.ByteEncodeKernel

  test("byte table is the GPT-2 bytes_to_unicode construction") {
    val t = ByteEncodeKernel.table
    assert(t.length == 256)
    // kept bytes map to themselves
    assert(t('a'.toInt) == "a" && t('!'.toInt) == "!" && t(0xff) == "ÿ")
    // relocated bytes map to 256+n in ascending byte order:
    // byte 0 is the first excluded → 256; space (0x20) is the 33rd → 288;
    // 0x7F follows as 289; 0xAD (soft hyphen) is the last → 323
    assert(t(0) == "Ā")
    assert(t(0x20) == "Ġ")
    assert(t(0x7f) == "ġ")
    assert(t(0xad) == "Ń")
    // injective over all 256 bytes
    assert(t.distinct.length == 256)
    // the encoded alphabet carries no whitespace/control codepoints —
    // the U+001F delimiter guard is unreachable by construction
    assert(t.forall(s =>
      !s.exists(c => Character.isWhitespace(c) || Character.isISOControl(c))))
  }

  test("encodeString: ASCII identity; multi-byte chars expand to one symbol per byte") {
    assert(ByteEncodeKernel.encodeString("hello!") == "hello!")
    // 'é' = 0xC3 0xA9 in UTF-8: 0xC3 and 0xA9 are both KEPT bytes
    assert(ByteEncodeKernel.encodeString("é") == "Ã©")
    // astral char (4 UTF-8 bytes) → 4 symbols; 0xF0 kept, 0x9F kept...
    val g = ByteEncodeKernel.encodeString(new String(Character.toChars(0x1F600)))
    assert(g.codePointCount(0, g.length) == 4)
  }

  // Sennrich corpus — printable ASCII, so byte-level ≡ codepoint-level
  private lazy val ascii = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("ASCII differential: byte-level merges EQUAL the codepoint trainer's") {
    val cp = Bpe.learnedMerges(ascii, "text", nMerges = 5, maxWords = 100)
    val by = Bpe.learnedMergesBytes(ascii, "text", nMerges = 5, maxWords = 100)
    assert(by == cp)
    // and the token counts agree too
    val a = Bpe.tokenizeWithMerges(ascii, "doc_id", "text", cp.map(m => (m._2, m._3)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Bpe.tokenizeWithMergesBytes(ascii, "doc_id", "text", by.map(m => (m._2, m._3)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("driver learner ≡ distributed audit twin on a multi-byte corpus") {
    import spark.implicits._
    // 'éé'×4 ('é' = 2 bytes → 4 byte-symbols per word), 'aé'×2, astral ×2
    val docs = Seq.tabulate(8) { i =>
      val w = if (i < 4) "éé" else if (i < 6) "aé"
      else new String(Character.toChars(0x1F600)) + "a"
      (i.toLong, w)
    }.toDF("doc_id", "text")
    val drv = Bpe.learnedMergesBytes(docs, "text", nMerges = 4, maxWords = 100)
    val dst = Bpe.learnedMergesBytesDistributed(docs, "text", nMerges = 4, maxWords = 100)
    assert(drv == dst)
    // step 1 merges é's two bytes (0xC3,0xA9): 2 per 'éé' word ×4 + 1×2 = 10
    assert(drv.head == ((1, "Ã", "©", 10L)))
  }

  test("kernel apply ≡ chained apply on byte-level merges (incl. multi-byte text)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "éé aé low"), (2L, "newest widest"),
      (3L, new String(Character.toChars(0x1F600)) + " éé")).toDF("doc_id", "text")
    val merges = Bpe.learnedMergesBytes(docs, "text", 6, 100).map(m => (m._2, m._3))
    val k = Bpe.tokenizeWithMergesBytes(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val c = Bpe.tokenizeWithMergesBytesChained(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(k == c)
  }

  test("a U+001F-bearing corpus byte-encodes harmlessly (no delimiter collision)") {
    import spark.implicits._
    // the codepoint paths fail loud on U+001F (BpeSpec pins that); the
    // byte paths ENCODE it away — 0x1F is a relocated byte (256 + 31)
    assert(ByteEncodeKernel.encodeString("\u001f") == "\u011f")
    val docs = Seq((1L, "a\u001fb a\u001fb")).toDF("doc_id", "text")
    val merges = Bpe.learnedMergesBytes(docs, "text", 3, 10)
    // [a, \u011f, b] per word: (a, \u011f) merges first (count 2, pair-ASC
    // tie against (\u011f, b)), then the fused pair — 2 steps to one symbol
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("a", "\u011f"), ("a\u011f", "b")))
    val got = Bpe.tokenizeWithMergesBytes(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 2L)))
  }
}
