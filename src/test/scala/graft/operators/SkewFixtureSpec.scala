package graft.operators

import graft.{SkewBench, SparkSpec}
import org.apache.spark.sql.functions._

/** Pins the skew-bench fixture (deterministic power-law corpus) and the
  * EXACTNESS of the skew-mitigated operators on it — the timing side
  * lives in `graft.Bench`'s `bench_skew` object; this spec proves the
  * fixture is reproducible and the mitigations change plans, not
  * answers. */
class SkewFixtureSpec extends SparkSpec {

  private val N = 20000L

  test("fixture is deterministic: two generations are bit-identical") {
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(sig(SkewBench.changes(spark, N, skewed = true)) ==
      sig(SkewBench.changes(spark, N, skewed = true)))
    assert(sig(SkewBench.documents(spark, 300, skewed = true)) ==
      sig(SkewBench.documents(spark, 300, skewed = true)))
  }

  test("skewed changes put exactly 20% of rows on the hot key, with a heavy 1/k tail") {
    val counts = SkewBench.changes(spark, N, skewed = true)
      .groupBy("_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("k0") == N / 5, s"hot key holds ${counts("k0")}, want ${N / 5}")
    val tail = counts - "k0"
    val uniformShare = (N - N / 5).toDouble / tail.size
    // Zipf head: the hottest tail key is several times the uniform share
    assert(tail.values.max > 3 * uniformShare,
      s"tail is not heavy: max=${tail.values.max}, uniform share=$uniformShare")
    // uniform twin really is uniform over the same key space
    val uni = SkewBench.changes(spark, N, skewed = false)
      .groupBy("_id").count().agg(max("count"), min("count")).collect()(0)
    assert(uni.getLong(0) == uni.getLong(1))
  }

  test("skewed documents: the hot cluster is 20% exact copies; uniform twin all distinct") {
    val docs = SkewBench.documents(spark, 500, skewed = true)
    val byText = docs.groupBy("text").count()
    assert(byText.agg(max("count")).collect()(0).getLong(0) == 100,
      "hot cluster must hold 20% of docs as exact copies")
    val uni = SkewBench.documents(spark, 500, skewed = false)
    assert(uni.select("text").distinct().count() == 500)
  }

  test("salted join on the hot key equals the plain join") {
    val fact = SkewBench.changes(spark, N, skewed = true)
    val dim = spark.range(250)
      .select(concat(lit("k"), col("id")).as("_id"), col("id").as("weight"))
    val salted = Skew.saltedJoin(fact, dim, "_id", buckets = 16,
        spread = Some(col("ts")))
      .collect().map(_.toString).sorted.toSeq
    val plain = fact.join(dim, Seq("_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("two-phase aggregation on the hot key equals the plain aggregation") {
    val fact = SkewBench.changes(spark, N, skewed = true)
    val twoPhase = Skew.twoPhaseAgg(fact, "_id", buckets = 16,
        partial = Seq("s" -> sum(col("value")), "c" -> count(lit(1))),
        combine = Seq("s" -> sum(col("s")), "c" -> sum(col("c"))),
        spread = Some(col("ts")))
      .select(col("_id"), round(col("s"), 6).as("s"), col("c"))
      .collect().map(_.toString).sorted.toSeq
    val plain = fact.groupBy("_id")
      .agg(round(sum(col("value")), 6).as("s"), count(lit(1)).as("c"))
      .collect().map(_.toString).sorted.toSeq
    assert(twoPhase == plain)
  }

  test("last-image reduction on the hot key equals the max_by formulation") {
    val fact = SkewBench.changes(spark, N, skewed = true)
    val lww = graft.sink.MergeApply.lastImage(fact, Seq("_id"), Seq(col("ts")))
      .collect().map(_.toString).sorted.toSeq
    val maxBy = fact.groupBy("_id")
      .agg(max_by(struct(col("_id"), col("ts"), col("value")), col("ts")).as("r"))
      .select(col("r._id"), col("r.ts"), col("r.value"))
      .collect().map(_.toString).sorted.toSeq
    assert(lww == maxBy)
  }

  test("the capped dedup paths stay bounded on the monster cluster") {
    // 500 docs, 100 exact copies: uncapped LSH candidates would emit
    // 100*99/2 = 4950 hot pairs; the maxBucket cap drops the monster
    // bucket, and maxDocFreq drops the hot shingles — both stay bounded
    val docs = SkewBench.documents(spark, 500, skewed = true)
    val banded = Dedup.minhashBands(
      Dedup.rawShingles(docs, "text", "doc_id", 5), "doc_id", 16, 4)
    val capped = Dedup.lshCandidates(banded, "doc_id", maxBucket = 64).count()
    assert(capped < 4950, s"maxBucket failed to drop the monster bucket: $capped")
    val jac = Dedup.ngramJaccardPairs(
      Dedup.digestShingles(docs, "text", "doc_id", 5),
      "doc_id", threshold = 0.1, maxDocFreq = 50L).count()
    assert(jac < 4950, s"maxDocFreq failed to drop the hot shingles: $jac")
  }

  test("bounded-heap top-k on the hot key equals the window formulation") {
    val fact = SkewBench.changes(spark, N, skewed = true)
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // ts is unique per row, so the retained set is total-ordered
    assert(sig(TopK.perKey(fact, Seq("_id"), Seq(col("ts").desc), 8)) ==
      sig(TopK.windowed(fact, Seq("_id"), Seq(col("ts").desc), 8)))
  }

  test("SkewBench.run executes every pair at small scale") {
    val rows = SkewBench.run(spark, nRows = 5000L, nDocs = 200L)
    assert(rows.map(_._1) == Seq("o1_last_image", "salted_join",
      "two_phase_agg", "topk_per_key", "dedup_lsh_pairs", "dedup_jaccard",
      "sim_ivf_probe", "semdedup", "prototype_prune", "phrase_probe",
      "phrase_growing", "sdm_probe", "dedup_phash", "dedup_repeated_spans"))
    rows.foreach { case (n, s, u) =>
      assert(s > 0 && u > 0, s"$n produced a non-positive timing")
    }
  }
}
