package graft.operators

import graft.SparkSpec
import graft.functions.{UnigramKernel, UnigramPieceTableRef}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: the trainer must reproduce hand-computed
  * seed/EM/prune arithmetic on a tiny corpus (micro-log quantization
  * included), the Viterbi must honor the documented tie-breaks, UNK
  * must cover unseen codepoints, and the store must version like every
  * other model. */
class UnigramSpec extends SparkSpec {

  // Corpus "ab"×2, "b"×1 with maxPieceLen=2, seedMulti=2, vocabMulti=1,
  // emIters=1 — hand-computed:
  //   seed counts: a=2, b=3, ab=2 (tot 7)
  //   llk0: a=-1252763, b=-847298, ab=-1252763
  //   E: "ab" → [ab] (1 piece beats [a,b] on cost), "b" → [b]
  //   M (add-one over the seed): a=1, b=2, ab=3
  //   prune (singles + top-1 multi): {a:1, b:2, ab:3}, tot 6
  //   final llk: a=ln(1/6)→-1791759, b=ln(2/6)→-1098612, ab=ln(3/6)→-693147
  test("learnLocal reproduces the hand-computed seed/EM/prune arithmetic") {
    val m = Unigram.learnLocal(Seq(("ab", 2L), ("b", 1L)),
      maxPieceLen = 2, seedMulti = 2, vocabMulti = 1, emIters = 1)
    assert(m.pieces == Seq(
      ("a", -1791759L), ("ab", -693147L), ("b", -1098612L)))
    assert(m.maxPieceLen == 2)
  }

  test("learn: one wordcount feeds the driver trainer end-to-end") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Unigram.learn(docs, "text", maxWords = 10,
      maxPieceLen = 2, seedMulti = 2, vocabMulti = 1, emIters = 1)
    assert(m.pieces == Seq(
      ("a", -1791759L), ("ab", -693147L), ("b", -1098612L)))
    // tokenize: ab→[ab], b→[b]; the NULL doc is absent
    val toks = Unigram.tokenize(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(toks == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  private def ref(ps: (String, Long)*): UnigramPieceTableRef =
    new UnigramPieceTableRef(
      ps.map(_._1).toArray, ps.map(_._2).toArray, maxPieceLen = 3)

  test("Viterbi tie-breaks: cost first, then FEWER pieces, then longest last piece") {
    // equal cost, different counts: [xy] (1 piece) beats [x,y] (2)
    val t1 = ref("x" -> -500000L, "y" -> -500000L, "xy" -> -1000000L)
    assert(UnigramKernel.viterbi("xy", t1, null) == 1)
    // better cost outranks fewer pieces: [x,y] (-600k) beats [xy] (-1M)
    val t2 = ref("x" -> -300000L, "y" -> -300000L, "xy" -> -1000000L)
    assert(UnigramKernel.viterbi("xy", t2, null) == 2)
    // equal cost AND count: the longest LAST piece wins — "abc" under
    // {a:-2, bc:-4, ab:-4, c:-2} ties [a,bc] vs [ab,c] at (-6, 2);
    // last-piece length 2 > 1 picks [a,bc]
    val t3 = ref("a" -> -2L, "bc" -> -4L, "ab" -> -4L, "c" -> -2L,
      "b" -> -1000000L)
    val out = new java.util.ArrayList[String]()
    assert(UnigramKernel.viterbi("abc", t3, out) == 2)
    assert(out.toArray.toSeq == Seq("a", "bc"))
  }

  test("UNK: an unseen codepoint is its own penalized piece; every word segments") {
    val t = ref("a" -> -100L)
    assert(UnigramKernel.viterbi("q", t, null) == 1)
    val out = new java.util.ArrayList[String]()
    assert(UnigramKernel.viterbi("qa", t, out) == 2)
    assert(out.toArray.toSeq == Seq("q", "a"))
    // the penalty keeps UNK a last resort: "aa" never segments through
    // a fake unknown when a trained cover exists
    val t2 = ref("a" -> -100L, "aa" -> -150L)
    assert(UnigramKernel.viterbi("aa", t2, null) == 1)
  }

  test("astral codepoints: one symbol each, in DP cells and pieces alike") {
    val em = new String(Character.toChars(0x1F600))
    val t = ref(em -> -100L, "x" -> -100L)
    assert(UnigramKernel.viterbi(s"$em", t, null) == 1)
    val out = new java.util.ArrayList[String]()
    assert(UnigramKernel.viterbi(s"${em}x$em", t, out) == 3)
    assert(out.toArray.toSeq == Seq(em, "x", em))
  }

  test("tokenize is stable under input re-partitioning") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"ab${"b" * (i % 3).toInt} ab b"))
      .toDF("doc_id", "text")
    val m = Unigram.learn(docs, "text", 100, 2, 8, 4, 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(Unigram.tokenize(docs, "doc_id", "text", m)) ==
      rows(Unigram.tokenize(docs.repartition(7), "doc_id", "text", m)))
  }

  test("model store: served ≡ inline; retrain swaps atomically; pin replays v1") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "abab abb ba" else "ba ba abab"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_unigram_model").toString
    try {
      val half = docs.filter(col("doc_id") % 2 === 0)
      val v1 = Unigram.buildUnigramModelM(half, "text", 100, 2, 8, 4, 2, root)
      val v2 = Unigram.buildUnigramModelM(docs, "text", 100, 2, 8, 4, 2, root)
      assert(v2 > v1)
      assert(Unigram.modelM(spark, root).pieces ==
        Unigram.learn(docs, "text", 100, 2, 8, 4, 2).pieces)
      assert(Unigram.modelM(spark, root, at = Some(v1)).pieces ==
        Unigram.learn(half, "text", 100, 2, 8, 4, 2).pieces)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(rows(Unigram.tokenizeM(spark, root, docs, "doc_id", "text",
          at = Some(v1))) ==
        rows(Unigram.tokenize(docs, "doc_id", "text",
          Unigram.learn(half, "text", 100, 2, 8, 4, 2))))
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
    }
  }
}
