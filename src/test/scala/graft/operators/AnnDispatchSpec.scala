package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The flat-scan guard contract (r18 verdict ask #2): the linear flat
  * PQ/JL entries fail loud past the byte ceiling, and [[Similarity
  * .annTopKAuto]] dispatches to the cluster-pruned arm instead —
  * row-identical to whichever arm it selects. */
class AnnDispatchSpec extends SparkSpec {

  private val Cap = "spark.graft.ann.flatScanMaxBytes"

  private lazy val emb = {
    import spark.implicits._
    (0L until 400L).map { i =>
      (i, Array.tabulate(16)(j =>
        (((i * 31 + j * 7) % 13).toFloat - 6f) / 3f))
    }.toDF("vec_id", "embedding")
  }
  private def queries = emb.filter(col("vec_id") < 4)
  private def sample = emb.filter(col("vec_id") % 50 === 0)

  private def withCap[A](v: String)(f: => A): A = {
    spark.conf.set(Cap, v)
    try f finally spark.conf.unset(Cap)
  }

  test("default ceiling admits test-scale corpora; conf=1 trips pqTopK and jlTopK loud") {
    // default: well under 256 MiB
    assert(Similarity.pqTopK(queries, emb, sample,
      "vec_id", "embedding", k = 3, m = 4, dsub = 4).count() > 0)
    val e1 = intercept[IllegalArgumentException] {
      withCap("1")(Similarity.pqTopK(queries, emb, sample,
        "vec_id", "embedding", k = 3, m = 4, dsub = 4))
    }
    assert(e1.getMessage.contains("flatScanMaxBytes") &&
      e1.getMessage.contains("ivfPqTopK"))
    val e2 = intercept[IllegalArgumentException] {
      withCap("1")(Similarity.jlTopK(queries, emb,
        "vec_id", "embedding", k = 3, m = 8, d = 16))
    }
    assert(e2.getMessage.contains("jlTopK"))
    // negative disables — the deliberate-audit escape hatch
    assert(withCap("-1")(Similarity.pqTopK(queries, emb, sample,
      "vec_id", "embedding", k = 3, m = 4, dsub = 4)).count() > 0)
  }

  test("the SERVED code-scan path stays unguarded (it is the scale twin)") {
    val cb = Similarity.pqCodebook(sample, "vec_id", "embedding", 4, 4)
    val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", 4, 4)
    assert(withCap("1")(Similarity.pqSearchEncoded(
      queries, codes, cb, "vec_id", "embedding", 3, 4, 4)).count() > 0)
  }

  test("annTopKAuto under the ceiling ≡ the flat PQ arm, row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val auto = rows(Similarity.annTopKAuto(queries, emb, sample, sample,
      "vec_id", "embedding", k = 3, m = 4, dsub = 4))
    val flat = rows(Similarity.pqTopK(queries, emb, sample,
      "vec_id", "embedding", k = 3, m = 4, dsub = 4))
    assert(auto == flat)
  }

  test("annTopKAuto over the ceiling ≡ the IVF-PQ arm (cluster column dropped)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val auto = withCap("1")(rows(Similarity.annTopKAuto(
      queries, emb, sample, sample,
      "vec_id", "embedding", k = 3, m = 4, dsub = 4, nProbe = 2)))
    val ivf = rows(Similarity.ivfPqTopK(queries, emb, sample, sample,
        "vec_id", "embedding", k = 3, m = 4, dsub = 4, nProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank")))
    assert(auto == ivf && auto.nonEmpty)
  }
}
