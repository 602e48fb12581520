package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the exact set-similarity family and the SemDeDup
  * screen on generated corpora. Case counts are small (each case runs
  * Spark jobs); the laws generalize what the unit fixtures spot-check:
  *
  *  - Jaccard never exceeds either containment direction (i/(sa+sb−i)
  *    ≤ i/sa), so every Jaccard-τ pair is a containment-τ pair — the
  *    asymmetric screen is a strict widening at equal threshold;
  *  - both measures are partition-blind (per-pair functions of the two
  *    shingle sets alone);
  *  - semDedup keeps EXACTLY the non-dominated rows: at least one
  *    keeper per surviving cluster, and raising the threshold only
  *    grows the keep-set (fewer pairs pass → fewer dominations).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  // corpora of short docs over a tiny vocabulary, so shingle overlap
  // (incl. full containment) is common rather than degenerate
  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(4, 24)
    words <- Gen.listOfN(n, Gen.chooseNum(4, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx"))))
  } yield words.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  test("LAW: jaccard ≤ containment pairwise; jaccard-τ pairs ⊆ containment-τ pairs") {
    val prop = forAll(docsGen, Gen.chooseNum(0.2, 0.8)) { (rows, t) =>
      val sh = Dedup.digestShingles(rows.toDF("doc_id", "text"), "text", "doc_id", 3)
        .localCheckpoint()
      val jac = Dedup.ngramJaccardPairs(sh, "doc_id", threshold = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val cont = Dedup.containmentPairs(sh, "doc_id", threshold = t)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
        .toMap
      jac.keySet.subsetOf(cont.keySet) &&
        jac.forall { case (k, j) =>
          val (ca, cb) = cont(k); j <= ca + 1e-12 && j <= cb + 1e-12
        }
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("LAW: containment pairs are partition-blind") {
    val prop = forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) =
        Dedup.containmentPairs(
            Dedup.digestShingles(d, "text", "doc_id", 3), "doc_id", 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs(df) == pairs(df.repartition(7))
    }
    assert(SCTest.check(params, prop).passed)
  }

  // unit-ish random vectors over 8 dims; two fixed centroids
  private val vecsGen: Gen[List[(Long, Array[Float])]] = for {
    n <- Gen.chooseNum(4, 20)
    comps <- Gen.listOfN(n * 8, Gen.chooseNum(-5, 5))
  } yield comps.grouped(8).zipWithIndex.map { case (c, i) =>
    // avoid the zero vector (NULL cosine) by pinning one component
    (i.toLong, (c.updated(0, c.head * 2 + 1)).map(_.toFloat).toArray)
  }.toList

  test("LAW: semDedup keep-set is exactly the non-dominated set and grows with τ") {
    val centroids = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val prop = forAll(vecsGen, Gen.chooseNum(0.3, 0.7)) { (rows, t) =>
      val emb = rows.map { case (i, v) => (i + 100L, v) }.toDF("vec_id", "embedding")
      def keeps(th: Double) =
        Dedup.semDedup(emb, centroids, "vec_id", "embedding", th)
          .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      val k1 = keeps(t)
      val k2 = keeps(t + 0.25)
      val clusters = Dedup.semDedup(emb, centroids, "vec_id", "embedding", t)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every row present exactly once; each cluster retains a keeper
      k1.size == rows.size &&
        clusters.values.toSet.forall(c =>
          k1.exists { case (id, keep) => keep && clusters(id) == c }) &&
        // monotone: a tighter pair threshold can only ADD keepers
        k1.collect { case (id, true) => id }.toSet
          .subsetOf(k2.collect { case (id, true) => id }.toSet)
    }
    assert(SCTest.check(params, prop).passed)
  }
}
