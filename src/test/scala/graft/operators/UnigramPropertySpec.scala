package graft.operators

import graft.functions.{UnigramKernel, UnigramPieceTableRef}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the unigram-LM trainer and Viterbi kernel on
  * GENERATED inputs — pure driver-side properties (no Spark jobs), so
  * case counts can be high. The oracle rows are the differential
  * against DuckDB; these laws pin what any segmentation must satisfy
  * regardless of the learned probabilities. */
class UnigramPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(60)

  // words over a small alphabet (ties and shared substrings common)
  // plus occasional astral codepoints (surrogate-pair handling)
  private val wordGen: Gen[String] = for {
    len <- Gen.chooseNum(1, 10)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.const(new String(Character.toChars(0x1F600))),
      1 -> Gen.const("￻")))
  } yield cs.mkString

  private val tableGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.chooseNum(2, 12)
    ws <- Gen.listOfN(n, wordGen)
    fs <- Gen.listOfN(n, Gen.chooseNum(1L, 9L))
  } yield ws.distinct.zip(fs)

  test("LAW: the winning segmentation concatenates back to the word, for every trained model") {
    val prop = forAll(tableGen, wordGen) { (table, probe) =>
      val m = Unigram.learnLocal(table, maxPieceLen = 3,
        seedMulti = 10, vocabMulti = 6, emIters = 2)
      val out = new java.util.ArrayList[String]()
      val k = UnigramKernel.viterbi(probe, m.ref, out)
      val joined = (0 until out.size()).map(out.get).mkString
      k == out.size() && joined == probe
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("LAW: 1 <= count <= codepoints for non-empty words; kernel count ≡ path length") {
    val prop = forAll(tableGen, wordGen) { (table, probe) =>
      val m = Unigram.learnLocal(table, 3, 10, 6, 1)
      val k = UnigramKernel.tokenCount(UTF8String.fromString(probe), m.ref)
      val nCp = probe.codePointCount(0, probe.length)
      k >= 1 && k <= nCp
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("LAW: every piece of the winning segmentation is either in-vocab or a single UNK codepoint") {
    val prop = forAll(tableGen, wordGen) { (table, probe) =>
      val m = Unigram.learnLocal(table, 3, 10, 6, 2)
      val vocab = m.pieces.map(_._1).toSet
      val out = new java.util.ArrayList[String]()
      UnigramKernel.viterbi(probe, m.ref, out)
      (0 until out.size()).forall { i =>
        val p = out.get(i)
        vocab.contains(p) || p.codePointCount(0, p.length) == 1
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("LAW: training pieces always include every single codepoint of the capped words") {
    val prop = forAll(tableGen) { table =>
      val m = Unigram.learnLocal(table, 3, 10, 6, 2)
      val vocab = m.pieces.map(_._1).toSet
      table.forall { case (w, _) =>
        graft.functions.BpeKernel.cpSplit(w).forall(vocab.contains)
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("LAW: the DP maximizes cost — no 2-piece split of any winning piece scores higher") {
    // local optimality probe: for each piece in the winning path, any
    // in-vocab split of that piece into two pieces must not beat it
    // (cost strictly first; equal-cost splits lose on piece count)
    val prop = forAll(tableGen, wordGen) { (table, probe) =>
      val m = Unigram.learnLocal(table, 3, 10, 6, 2)
      val llk = m.pieces.toMap
      def score(p: String): Option[Long] =
        llk.get(p).orElse(
          if (p.codePointCount(0, p.length) == 1)
            Some(UnigramKernel.UnkLlkMicro)
          else None)
      val out = new java.util.ArrayList[String]()
      UnigramKernel.viterbi(probe, m.ref, out)
      (0 until out.size()).forall { i =>
        val p = out.get(i)
        val cps = graft.functions.BpeKernel.cpSplit(p)
        val whole = score(p).get
        (1 until cps.length).forall { cut =>
          val (a, b) = (cps.take(cut).mkString, cps.drop(cut).mkString)
          (for (sa <- score(a); sb <- score(b)) yield sa + sb)
            .forall(_ <= whole)
        }
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
