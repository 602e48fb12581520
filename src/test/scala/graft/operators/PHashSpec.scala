package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash near-dup: kernel determinism/edges, the banded join's
  * pigeonhole exactness against a brute-force twin, and the skew cap. */
class PHashSpec extends SparkSpec {

  import graft.functions.PHashKernel

  test("kernel: deterministic, payload-sensitive, empty → sentinel") {
    val a = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    assert(PHashKernel.hash(a) == PHashKernel.hash(a.clone()))
    assert(PHashKernel.hash(a) >= 0L) // bits 0..62 only — never negative
    val b = "the quick brown fox jumps over the lazy cat".getBytes("UTF-8")
    assert(PHashKernel.hash(a) != PHashKernel.hash(b))
    assert(PHashKernel.hash(Array.emptyByteArray) == Long.MinValue)
    assert(PHashKernel.hash(null) == Long.MinValue)
    // single-byte payload: every pixel samples that byte → constant tile
    // → all AC coefficients scale one pattern; still a defined hash
    assert(PHashKernel.hash(Array[Byte](7)) >= 0L)
  }

  test("basis is the rounded integer DCT-II table") {
    assert(PHashKernel.Basis(0).forall(_ == 1000L)) // cos(0) row
    assert(PHashKernel.Basis(4)(0) == 707L) // cos(π/4)·1000 rounded
    assert(PHashKernel.basisRows.size == 64)
  }

  private def payloads(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Multimodal.attachPayload(rows.toDF("doc_id", "text"), "text", "doc_id")
  }

  test("phashSigs: one row per non-empty payload; identical text ⇒ identical hash") {
    val df = payloads(Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "something else entirely", 4L -> ""))
    val got = Dedup.phashSigs(df, "payload", "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 3) // the empty payload drops
    assert(got(0)._2 == got(1)._2)
  }

  test("banded pairs ≡ brute-force hamming scan (pigeonhole recall 1.0 at threshold 3)") {
    import spark.implicits._
    // a corpus with planted exact dups and near-misses: hash-derived
    // texts plus duplicated rows
    val texts = (0L until 40L).map { i =>
      (i, s"w${i % 7} w${i % 5} w${i % 11} body${i / 8} tail${i % 3}")
    } ++ Seq((100L, "w0 w0 w0 body0 tail0"), (101L, "w0 w0 w0 body0 tail0"))
    val df = payloads(texts)
    val got = Dedup.phashPairs(df, "payload", "doc_id", maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // brute-force twin over the same signatures
    val sigs = Dedup.phashSigs(df, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).sortBy(p => (p._1, p._2))
    assert(got == brute)
    // the planted exact dup must surface at hamming 0
    assert(got.contains((100L, 101L, 0)))
  }

  test("persisted index: cross pairs only, append ≡ one-shot build, banded ≡ brute") {
    import org.apache.spark.sql.functions.col
    val texts = (0L until 30L).map { i =>
      (i, s"w${i % 5} w${i % 3} body${i / 6} t${i % 2}")
    } ++ Seq((100L, "w0 w0 body0 t0"), (101L, "w0 w0 body0 t0"))
    val pay = payloads(texts)
    val lake = pay.filter(col("doc_id") % 5 =!= 0)
    val delta = pay.filter(col("doc_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    Dedup.buildPhashIndexM(lake, "payload", "doc_id", 3, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("delta_id", "lake_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val got = rows(Dedup.indexedPhashPairsM(
      spark, root, delta, "payload", "doc_id"))
    // brute cross twin over the signatures
    val lh = Dedup.phashSigs(lake, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dh = Dedup.phashSigs(delta, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = (for {
      (di, dv) <- dh; (li, lv) <- lh
      d = java.lang.Long.bitCount(dv ^ lv) if d <= 3
    } yield (di, li, d)).sortBy(p => (p._1, p._2))
    assert(got == brute)
    // cross only: no intra-delta pair even though 100/101 are exact dups
    assert(!got.exists(p => p._1 % 5 == 0 && p._2 % 5 == 0))
    // grow: half-build + append converges to the one-shot build's probe
    val root2 = java.nio.file.Files.createTempDirectory("graft_phgrow").toString
    Dedup.buildPhashIndexM(lake.filter(col("doc_id") % 2 === 0),
      "payload", "doc_id", 3, root2)
    Dedup.appendPhashIndexM(lake.filter(col("doc_id") % 2 =!= 0),
      "payload", "doc_id", 3, root2)
    val grown = rows(Dedup.indexedPhashPairsM(
      spark, root2, delta, "payload", "doc_id"))
    assert(grown == got)
    // the store's identity is enforced: an append banded with a
    // different max_hamming than the build fails loud instead of
    // silently mixing band widths
    val err = intercept[IllegalArgumentException] {
      Dedup.appendPhashIndexM(delta, "payload", "doc_id", 2, root2)
    }
    assert(err.getMessage.contains("max_hamming"))
  }

  test("maxBucket drops oversize buckets VISIBLY (fewer pairs, never wrong ones)") {
    // 30 identical docs: every (block, val) bucket holds all 30 → a cap
    // of 5 cuts them all; the uncapped run finds the full clique
    val df = payloads((0L until 30L).map(i => (i, "same text for everyone")))
    val full = Dedup.phashPairs(df, "payload", "doc_id").count()
    assert(full == 30L * 29 / 2)
    val capped = Dedup.phashPairs(df, "payload", "doc_id",
      maxHamming = 3, maxBucket = 5).count()
    assert(capped == 0L)
  }
}
