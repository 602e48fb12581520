package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the deterministic samplers, checked on generated
  * corpora. Case counts are small (each case runs Spark jobs); the laws
  * cover what the unit fixtures spot-check: sampling decisions are
  * per-row functions of (content, salt) alone — so results are subsets,
  * monotone in their dials, and blind to partitioning — for arbitrary
  * domain shapes, not just the hand-built ones. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(6)

  // corpora: up to 4 domains of varying sizes, distinct doc texts
  private val corpusGen: Gen[List[(String, String)]] = for {
    nDoms <- Gen.chooseNum(1, 4)
    sizes <- Gen.listOfN(nDoms, Gen.chooseNum(1, 120))
  } yield sizes.zipWithIndex.flatMap { case (n, d) =>
    (0 until n).map(i => (s"doc $d-$i body text", s"dom$d"))
  }.toList

  test("LAW: temperatureMix keeps a per-domain subset, monotone in the target") {
    val prop = forAll(corpusGen, Gen.chooseNum(1, 3)) { (rows, num) =>
      val docs = rows.toDF("text", "source")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("text").as[String].collect().toSet
      val half = ids(Curation.temperatureMix(docs, "text", "source", num, 4))
      val more = ids(Curation.temperatureMix(docs, "text", "source", num + 1, 4))
      val all = ids(docs)
      half.subsetOf(more) && more.subsetOf(all) &&
        // partition-blind: same keeps under a different layout
        ids(Curation.temperatureMix(docs.repartition(7), "text", "source", num, 4)) == half
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("LAW: qualitySample keeps subsets monotone in the score, exact at the ends") {
    val prop = forAll(corpusGen, Gen.chooseNum(0.1, 0.9)) { (rows, q) =>
      val docs = rows.toDF("text", "source")
      def ids(c: org.apache.spark.sql.Column) =
        Curation.qualitySample(docs, "text", c).select("text").as[String].collect().toSet
      ids(lit(0.0)).isEmpty &&
        ids(lit(1.0)).size == rows.size &&
        ids(lit(q)).subsetOf(ids(lit(math.min(1.0, q + 0.05))))
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("LAW: seededShuffle is a permutation — shard/seq bijective onto the ids") {
    val prop = forAll(corpusGen, Gen.chooseNum(1, 6)) { (rows, shards) =>
      val docs = rows.map(_._1).distinct.toDF("id")
      val out = Curation.seededShuffle(docs, "id", shards)
        .as[(String, Int, Int)].collect()
      out.length == docs.count() &&
        out.map(_._1).toSet.size == out.length &&
        out.groupBy(_._2).values.forall { g =>
          g.map(_._3).sorted.toSeq == (1 to g.length) } &&
        out.forall { case (_, sh, _) => sh >= 0 && sh < shards }
    }
    assert(SCTest.check(params, prop).passed)
  }
}
