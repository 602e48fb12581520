package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r20: the fused [[graft.functions.MmrSelect]] kernel must replay the
  * k-step greedy cascade ([[Similarity.mmrGreedyCascade]]) row-for-row —
  * selection, rel passthrough, and mmr_rank — on every pool shape the
  * operators can produce, including the numeric edge cases the decimal/
  * NaN contract covers. */
class MmrKernelSpec extends SparkSpec {
  import spark.implicits._

  private def pool(rows: Seq[(Int, Long, Double, Int, Array[Float])]): DataFrame =
    rows.toDF("query_id", "neighbor_id", "rel", "rank", "__cv")

  private def run(df: DataFrame, k: Int, ln: Int, ld: Int) = {
    val kernel = Similarity.mmrGreedy(df, k, ln, ld)
      .orderBy("query_id", "mmr_rank")
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
    val cascade = Similarity.mmrGreedyCascade(df, k, ln, ld)
      .orderBy("query_id", "mmr_rank")
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
    (kernel, cascade)
  }

  private def randomPools(seed: Long, nQueries: Int, poolSize: Int,
      dim: Int): Seq[(Int, Long, Double, Int, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until nQueries).flatMap { q =>
      (1 to poolSize).map { r =>
        val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
        // round-6 rel in [0, 1], like the normalized BM25 / cosine pools
        val rel = math.rint(rnd.nextDouble() * 1e6) / 1e6
        (q, (q * 100 + rnd.nextInt(1000)).toLong, rel, r, v)
      }.distinctBy(_._2).zipWithIndex.map { case (row, i) =>
        row.copy(_4 = i + 1) // re-rank after dedup so rank is 1..m
      }
    }
  }

  test("kernel ≡ cascade on randomized pools (3 seeds × λ ∈ {7/10, 1, 0})") {
    for (seed <- Seq(1L, 2L, 3L); (ln, ld) <- Seq((7, 10), (1, 1), (0, 10))) {
      val df = pool(randomPools(seed, nQueries = 4, poolSize = 12, dim = 8))
      val (kernel, cascade) = run(df, k = 5, ln, ld)
      assert(kernel == cascade, s"seed=$seed λ=$ln/$ld")
      assert(kernel.nonEmpty)
    }
  }

  test("kernel ≡ cascade when the pool is smaller than k (selection exhausts)") {
    val df = pool(randomPools(7L, nQueries = 2, poolSize = 3, dim = 4))
    val (kernel, cascade) = run(df, k = 8, 7, 10)
    assert(kernel == cascade)
    assert(kernel.count(_._1 == 0) == 3) // all 3 picked, then exhausted
  }

  test("kernel ≡ cascade with zero vectors (NaN cosine → null objective, NULLS LAST)") {
    val zero = Array.fill(4)(0.0f)
    val v = (i: Int) => Array.tabulate(4)(j => if (j == i % 4) 1.0f else 0.1f * i)
    val df = pool(Seq(
      (0, 1L, 0.9, 1, v(1)),
      (0, 2L, 0.8, 2, zero),  // NaN against every selected vector
      (0, 3L, 0.7, 3, v(3)),
      (0, 4L, 0.6, 4, zero)))
    val (kernel, cascade) = run(df, 4, 7, 10)
    assert(kernel == cascade)
    // the NaN rows must sort after every non-null objective
    assert(kernel.map(_._2) == Seq(1L, 3L, 2L, 4L))
  }

  test("kernel ≡ cascade when a query has no rank-1 row (selects nothing)") {
    val v = (i: Int) => Array.tabulate(4)(j => (i + j).toFloat)
    val df = pool(Seq(
      (0, 1L, 0.9, 2, v(1)), (0, 2L, 0.8, 3, v(2)), // no rank 1
      (1, 5L, 0.9, 1, v(5)), (1, 6L, 0.8, 2, v(6))))
    val (kernel, cascade) = run(df, 2, 7, 10)
    assert(kernel == cascade)
    assert(kernel.forall(_._1 == 1)) // query 0 vanished in both arms
  }
}
