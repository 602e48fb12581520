package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Differential + algebraic laws of the BPE trainer on GENERATED
  * corpora — the phrase-differential precedent applied to tokenizer
  * training: the distributed trainer must agree step-for-step with an
  * independent driver-side reference implementation (plain Scala maps,
  * no Spark, written directly from Sennrich's pseudocode), and the
  * apply chain must reproduce the reference tokenization's symbol
  * counts. Case counts are small (each case runs Spark jobs); the laws
  * generalize what the hand-computed fixtures spot-check. */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  // short words over a tiny alphabet so pair collisions, ties, repeated
  // runs ("aaa"), and exhaustion are all common rather than degenerate
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(3, 20)
    words <- Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString)))
  } yield words

  /** Reference BPE (Sennrich 2016, word-level, no end-of-word marker):
    * greedy left-to-right pair merging over a word-frequency map —
    * independent of the delimiter-string mechanics under test. */
  private def referenceBpe(
      words: Seq[String], nMerges: Int): (Seq[(String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] = words.filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").toSeq -> ws.size.toLong
      }
    val merges = Seq.newBuilder[(String, String, Long)]
    var t = 0
    var done = false
    while (t < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, cnt))
        vocab = vocab.groupBy { case (syms, _) => mergeOnce(syms, a, b) }
          .map { case (merged, entries) => merged -> entries.values.sum }
        t += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Left-to-right non-overlapping single-pair merge over a symbol
    * sequence — the reference's analog of the delimiter replace. */
  private def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("DIFFERENTIAL: driver-local production learner ≡ reference, step for step") {
    val prop = forAll(corpusGen, Gen.chooseNum(1, 8)) { (words, nMerges) =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = Bpe.learnedMerges(docs, "text", nMerges, maxWords = 1000)
        .map(m => (m._2, m._3, m._4))
      val (want, _) = referenceBpe(words, nMerges)
      got == want
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("DIFFERENTIAL: distributed audit twin ≡ driver-local learner, step for step") {
    val prop = forAll(corpusGen, Gen.chooseNum(1, 8)) { (words, nMerges) =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      Bpe.learnedMergesDistributed(docs, "text", nMerges, maxWords = 1000) ==
        Bpe.learnedMerges(docs, "text", nMerges, maxWords = 1000)
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("DIFFERENTIAL: kernel tokenize ≡ chained replace twin ≡ reference counts") {
    val prop = forAll(corpusGen, Gen.chooseNum(1, 6)) { (words, nMerges) =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val merges = Bpe.learnedMerges(docs, "text", nMerges, maxWords = 1000)
        .map(m => (m._2, m._3))
      // per-word symbol counts through the rank-priority apply KERNEL
      // (every doc is one word here, so n_bpe_tokens IS the word's
      // symbol count)
      val got = Bpe.tokenizeWithMerges(docs, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // the N-replace chain twin — the oracle's literal form
      val chained = Bpe.tokenizeWithMergesChained(docs, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // reference: fold the same merges over each word independently
      val want = words.zipWithIndex.collect {
        case (w, i) if w.nonEmpty =>
          val syms = merges.foldLeft(w.split("").toSeq) {
            case (s, (a, b)) => mergeOnce(s, a, b)
          }
          i.toLong -> syms.length.toLong
      }.toMap
      got == want && chained == want
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("SCALE DIFFERENTIAL: N=1024 merges — driver learner ≡ reference; kernel ≡ reference fold") {
    // the realistic-merge-count differential (pure driver work, no
    // Spark jobs beyond none at all): a 3000-form word table with
    // enough pair entropy to sustain 1024 merges, learned by the
    // production incremental learner and by the naive recount-per-step
    // reference, step for step; then every word tokenized by the
    // rank-priority kernel against the 1024-rank table vs the
    // reference's literal 1024-fold
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    val forms = (0 until 3000).map { i =>
      val len = 4 + rnd.nextInt(8)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val table = forms.zipWithIndex.map { case (w, i) => (w, (i % 7 + 1).toLong) }
    val expanded = table.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    val model = Bpe.learnLocal(table, nMerges = 1024)
    assert(model.merges.length == 1024,
      s"fixture exhausted at ${model.merges.length} merges — widen the corpus")
    val (want, _) = referenceBpe(expanded, 1024)
    assert(model.merges.map(m => (m._2, m._3, m._4)) == want)
    // kernel apply at N=1024: every training form's token count must
    // equal the reference's sequential 1024-pass fold
    val pairs = model.mergePairs
    val ref = new graft.functions.BpeMergeTableRef(
      pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    forms.foreach { w =>
      val kernel = graft.functions.BpeKernel.tokenCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), ref)
      val folded = pairs.foldLeft(w.split("").toSeq) {
        case (s, (a, b)) => mergeOnce(s, a, b)
      }.length
      assert(kernel == folded, s"word $w: kernel=$kernel fold=$folded")
    }
  }

  test("DIFFERENTIAL: binned unordered-window pairs ≡ naive join on random corpora") {
    // the SDM #uwN bin-join's property version (the unit spec covers
    // three fixtures): random texts over a 3-word vocabulary make
    // repeated terms and window-edge pairs common; the bin equi-join
    // must reproduce the naive join's pair multiset at every width
    import org.apache.spark.sql.functions._
    val textGen: Gen[List[String]] = for {
      n <- Gen.chooseNum(2, 8)
      docs <- Gen.listOfN(n, Gen.chooseNum(1, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("u", "v", "w")).map(_.mkString(" "))))
    } yield docs
    val prop = forAll(textGen, Gen.chooseNum(1, 9)) { (texts, w) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairFrame = Seq((0, "u", "v"), (1, "w", "w"), (2, "v", "u"))
        .toDF("query_id", "ta", "tb")
      val pp = Retrieval.positionalPostings(docs, "doc_id", "text")
      val aSide = pp.join(broadcast(pairFrame), pp("term") === pairFrame("ta"))
        .select(col("query_id"), col("ta"), col("tb"), col("doc_id"),
          col("pos").as("pa"), col("dl"))
      val bSide = pp.select(col("term").as("tb2"),
        col("doc_id").as("doc_b"), col("pos").as("pb"))
      def multiset(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.select(col("query_id"), col("ta"), col("tb"), col("doc_id"),
            col("pa"), col("pb"))
          .collect().map(_.toSeq.mkString("|")).toSeq.sorted
      val naive = aSide.join(bSide,
        aSide("doc_id") === bSide("doc_b") &&
          bSide("tb2") === aSide("tb") &&
          (when(aSide("ta") === aSide("tb"),
            bSide("pb") > aSide("pa") && bSide("pb") - aSide("pa") < w)
            .otherwise(bSide("pb") =!= aSide("pa") &&
              abs(bSide("pb") - aSide("pa")) < w)))
      multiset(Retrieval.unorderedPairHits(aSide, bSide, w)) == multiset(naive)
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("LAW: pair_count is non-increasing across merge steps (greedy argmax)") {
    val prop = forAll(corpusGen) { words =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val counts = Bpe.learnedMerges(docs, "text", 6, maxWords = 1000)
        .map(_._4)
      counts.zip(counts.drop(1)).forall { case (x, y) => x >= y }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
