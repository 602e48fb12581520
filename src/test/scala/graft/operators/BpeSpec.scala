package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning: the algorithm must actually LEARN the classic
  * merges (hand-computed on the Sennrich-style corpus), apply them in
  * ORDER, break ties deterministically, stop early on exhaustion, and
  * honor the vocabulary cap. */
class BpeSpec extends SparkSpec {

  // Sennrich et al.'s corpus (no end-of-word marker — the GPT-2-style
  // intra-word variant): low×5, lower×2, newest×6, widest×3.
  // Hand-computed merges:
  //   1. (e,s)  count 9 (newest 6 + widest 3; ties (e,s) < (s,t))
  //   2. (es,t) count 9
  //   3. (l,o)  count 7 (ties (l,o) < (o,w))
  //   4. (lo,w) count 7
  //   5. (e,w)  count 6 (ties (e,w) < (n,e) < (w,est))
  private lazy val corpus = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("learnMerges reproduces the hand-computed Sennrich merges, ties and all") {
    val got = Bpe.learnedMerges(corpus, "text", nMerges = 5, maxWords = 100)
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))
    // the frame twin carries the same rows under the documented schema
    val df = Bpe.learnMerges(corpus, "text", nMerges = 5, maxWords = 100)
    assert(df.columns.toSeq == Seq("step", "lhs", "rhs", "pair_count"))
    assert(df.orderBy("step").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      == got)
  }

  test("tokenizeWithMerges applies merges IN LEARNING ORDER as a pure map") {
    import spark.implicits._
    val merges = Bpe.learnedMerges(corpus, "text", 5, 100)
      .map(m => (m._2, m._3))
    // lower: (l,o)→lo, (lo,w)→low ⇒ [low, e, r] = 3 symbols
    // newest: (e,s)→es, (es,t)→est, (e,w)→ew ⇒ [n, ew, est] = 3 symbols
    val got = Bpe.tokenizeWithMerges(
        Seq((1L, "lower newest"), (2L, "low low"), (3L, "zzz"))
          .toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 6L), (2L, 2L, 2L), (3L, 1L, 3L)))
  }

  test("exhaustion stops early; single-char vocabulary yields no merges") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(Bpe.learnedMerges(tiny, "text", nMerges = 5, maxWords = 10).isEmpty)
    assert(Bpe.learnMerges(tiny, "text", nMerges = 5, maxWords = 10)
      .count() == 0L)
    // a 2-char word supports exactly one merge: early stop at 1 of 5
    val one = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(Bpe.learnedMerges(one, "text", nMerges = 5, maxWords = 10) ==
      Seq((1, "a", "b", 2L)))
  }

  test("maxWords cap drops tail words from the vote (visible-drop semantics)") {
    import spark.implicits._
    // 'xy'×3 dominates; 'qr'×1 is the tail. Cap 1 → only xy votes.
    val df = Seq((1L, "xy xy xy qr")).toDF("doc_id", "text")
    assert(Bpe.learnedMerges(df, "text", nMerges = 1, maxWords = 1) ==
      Seq((1, "x", "y", 3L)))
    // uncapped, qr still loses step 1 (count 1 < 3) but exists in vote
    assert(Bpe.learnedMerges(df, "text", nMerges = 2, maxWords = 10) ==
      Seq((1, "x", "y", 3L), (2, "q", "r", 1L)))
  }

  test("the learning loop releases every vocabulary checkpoint (RDD-level, not Dataset.unpersist)") {
    // Dataset.unpersist is a NO-OP for localCheckpoint'd frames (it only
    // uncaches CacheManager entries) — the loop must release through the
    // LogicalRDD, and nMerges > CheckpointEvery forces a mid-loop
    // supersession so both release sites are exercised
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val m = Bpe.learnedMergesDistributed(
      corpus, "text", nMerges = 12, maxWords = 100)
    assert(m.length == 12)
    assert(m == Bpe.learnedMerges(corpus, "text", nMerges = 12, maxWords = 100))
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked checkpoint RDDs: ${(after -- before).mkString(",")}")
    // the driver-path vocab() holds NO checkpoints (census from the
    // learn handle); nothing may leak
    val v = Bpe.vocab(corpus, "text", nMerges = 5, maxWords = 100)
    assert(v.count() > 0)
    val afterVocab = spark.sparkContext.getPersistentRDDs.keySet
    assert((afterVocab -- before).isEmpty,
      "the driver-path vocab retained checkpoints")
  }

  test("astral-plane corpus: codepoint split and codepoint tie-breaks in every path") {
    import spark.implicits._
    // U+FFFB (BMP, near the top) vs U+1F600 (astral): Java's UTF-16
    // code-unit compareTo says 😀 < ￻ (its high surrogate \uD83D
    // sorts below ￻), while codepoint order — Spark's UTF8 binary
    // string order AND DuckDB's — says ￻ < 😀. Step 1's pair
    // counts TIE at 1, so the learned lhs is the tie-break's verdict.
    val hi = "\uFFFB"
    val em = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"${em}x"), (2L, s"${hi}x")).toDF("doc_id", "text")
    val local = Bpe.learnedMerges(docs, "text", nMerges = 2, maxWords = 10)
    val dist = Bpe.learnedMergesDistributed(docs, "text", nMerges = 2, maxWords = 10)
    assert(local == dist)
    assert(local == Seq((1, hi, "x", 1L), (2, em, "x", 1L)))
    // codepoint SPLIT: an astral char is one symbol, never two lone
    // surrogates — both words collapse to a single token under their
    // merge, through the kernel and the chained twin alike
    val pairs = local.map(m => (m._2, m._3))
    def counts(f: (org.apache.spark.sql.DataFrame, String, String,
        Seq[(String, String)]) => org.apache.spark.sql.DataFrame) =
      f(docs, "doc_id", "text", pairs)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq((1L, 1L, 1L), (2L, 1L, 1L))
    assert(counts(Bpe.tokenizeWithMerges) == want)
    assert(counts(Bpe.tokenizeWithMergesChained) == want)
    // with NO merges both engines count codepoints, not code units
    assert(Bpe.tokenizeWithMerges(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq == Seq(2L, 2L))
  }

  test("a U+001F-bearing corpus fails loud on EVERY encode path — driver train included") {
    import spark.implicits._
    val bad = Seq((1L, "a\u001fb a\u001fb ok")).toDF("doc_id", "text")
    // driver-local production learner: the collected (word, n)
    // projection prunes the distributed guard away, so learnLocal must
    // guard itself (a silent pass here would learn delimiter-bearing
    // merges whose rank-map keys are ambiguous)
    val eLearn = intercept[Exception] {
      Bpe.learn(bad, "text", nMerges = 2, maxWords = 10)
    }
    assert(eLearn.getMessage.contains("U+001F"))
    // distributed audit twin: guardWord fires inside the encode
    val eDist = intercept[Exception] {
      Bpe.learnedMergesDistributed(bad, "text", nMerges = 2, maxWords = 10)
    }
    assert(eDist.getMessage != null)
    // apply kernel: guardToken fires per token
    val eApply = intercept[Exception] {
      Bpe.tokenizeWithMerges(bad, "doc_id", "text",
        Seq(("o", "k"))).collect()
    }
    assert(eApply.getMessage.contains("U+001F") ||
      eApply.getCause != null)
  }

  test("model store: served ≡ inline; retrain swaps atomically; pin replays v1") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_bpe_model").toString
    try {
      val half = corpus.filter(col("doc_id") % 2 === 0)
      val v1 = Bpe.buildBpeModelM(half, "text", 3, 100, root)
      val v2 = Bpe.buildBpeModelM(corpus, "text", 5, 100, root)
      assert(v2 > v1)
      // HEAD serves the retrained merges ≡ inline over the full corpus
      assert(Bpe.mergesM(spark, root) ==
        Bpe.learnedMerges(corpus, "text", 5, 100).map(m => (m._2, m._3)))
      // the pin replays v1's tokenizer (trained on the even half)
      assert(Bpe.mergesM(spark, root, at = Some(v1)) ==
        Bpe.learnedMerges(half, "text", 3, 100).map(m => (m._2, m._3)))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows(Bpe.tokenizeM(spark, root, corpus, "doc_id", "text",
          at = Some(v1))) ==
        rows(Bpe.tokenizeWithMerges(corpus, "doc_id", "text",
          Bpe.learnedMerges(half, "text", 3, 100).map(m => (m._2, m._3)))))
      // flavor guard: a byte-level reader pointed at this codepoint
      // store fails loud instead of tokenizing with the wrong alphabet
      val eFam = intercept[IllegalArgumentException] {
        Bpe.tokenizeBytesM(spark, root, corpus, "doc_id", "text")
      }
      assert(eFam.getMessage.contains("bpebytesmodel"))
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
  }

  test("merged symbols are string-identified: repeated runs merge left-to-right") {
    import spark.implicits._
    // 'aaaa'×2: step 1 merges (a,a) with count 2·3=6 pairs... pair count
    // is per-ADJACENT-OCCURRENCE (3 per word), weighted by word freq
    val df = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.learnedMerges(df, "text", nMerges = 2, maxWords = 10)
    assert(m.head == ((1, "a", "a", 6L)))
    // after (a,a): each word is [aa, aa] — step 2 merges (aa, aa)
    assert(m(1) == ((2, "aa", "aa", 2L)))
    val toks = Bpe.tokenizeWithMerges(df, "doc_id", "text",
        m.map(x => (x._2, x._3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(toks == Seq((1L, 2L, 2L))) // two words, one 'aaaa' symbol each
  }
}
