package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  test("numericProfile: one-pass metrics, exact values, single scan") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), 10.0), (Some(3.0), 20.0), (None, 30.0), (Some(2.0), 40.0)
    ).toDF("a", "b")
    val got = Quality.numericProfile(df, Seq("a", "b"))
      .orderBy("column")
      .as[(String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("a", 4L, 1L, Some(1.0), Some(3.0), Some(2.0)),
      ("b", 4L, 0L, Some(10.0), Some(40.0), Some(25.0))), got.toString)
    // the profile is ONE aggregate pass: a single scan of the input and
    // the one-row final reduce — no per-column re-scans, no Expand
    val plan = Quality.numericProfile(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, s"multiple scans:\n$plan")
    assert(!plan.contains("Expand"), s"count-distinct style Expand crept in:\n$plan")
  }

  test("sharded partials merge to the one-shot profile, incl. all-null shards") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(1.0)), (0L, Some(3.0)), (1L, None: Option[Double]),
      (1L, Some(2.0)), (2L, None: Option[Double])
    ).toDF("shard", "a")
    val direct = Quality.numericProfile(df, Seq("a")).collect().toSeq
    val merged = Quality.mergeProfiles(
      Quality.numericProfileSharded(df, "shard", Seq("a"))).collect().toSeq
    assert(merged == direct, s"merged $merged\ndirect $direct")
  }

  test("expectations: same single pass, violated rule reported not thrown") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 50.0).toDF("v")
    val got = Quality.expectations(df, Seq(
        Quality.Expectation("max_le_10", max(col("v")), "<=", 10.0),
        Quality.Expectation("min_ge_0", min(col("v")), ">=", 0.0),
        Quality.Expectation("rows_eq_3", count(lit(1)), "==", 3.0)))
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("max_le_10" -> false, "min_ge_0" -> true, "rows_eq_3" -> true))
  }

  test("profileDrift: per-column deltas across a stage filter") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val got = Quality.profileDrift(
        Quality.numericProfile(df, Seq("v")),
        Quality.numericProfile(df.filter(col("v") <= 3.0), Seq("v")))
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // mean 4.0 -> 2.0, max 10 -> 3, min and null-frac unchanged
    assert(got == Seq(("v", 4L, 3L, 0.0, -2.0, 0.0, -7.0)), got.toString)
  }

  test("histogramDrift: clamped bins, integer-exact TV contributions") {
    import spark.implicits._
    // before: uniform over bins 0..3 (values 0,10,20,30); after: all mass
    // in bin 0, plus an out-of-range value clamped into the top bin
    val before = Seq(0.0, 10.0, 20.0, 30.0).toDF("v")
    val after = Seq(1.0, 2.0, 99.0).toDF("v")
    val got = Quality.histogramDrift(before, after, "v", lo = 0.0, hi = 40.0, bins = 4)
      .orderBy("bin").as[(Int, Long, Long, Double)].collect().toSeq
    // TV per bin: |n_b*Ta - n_a*Tb| / (2*Tb*Ta), Tb=4, Ta=3
    assert(got == Seq(
      (0, 1L, 2L, 0.208333),  // |1*3-2*4|/24
      (1, 1L, 0L, 0.125),
      (2, 1L, 0L, 0.125),
      (3, 1L, 1L, 0.041667)), got.toString) // 99 clamps into bin 3
    // total variation sums the contributions and lands in [0, 1]
    val tv = got.map(_._4).sum
    assert(tv > 0.49 && tv < 0.51, s"tv=$tv")
    // one scan per side: totals come from a window over the per-bin
    // frame, not a second aggregation that would re-read both inputs
    val plan = Quality.histogramDrift(before, after, "v", 0.0, 40.0, 4)
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 2,
      s"inputs scanned more than once each:\n$plan")
  }

  test("corpusDiff: added/removed/changed/unchanged, null text handled") {
    import spark.implicits._
    val oldSnap = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, Some("a")), (2L, Some("B2")), (4L, Some("d")))
      .toDF("doc_id", "text")
    val got = Quality.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), got.toString)
  }

  test("corpusDiff: NULL text is not empty string — a NULL→'' scrub is 'changed'") {
    import spark.implicits._
    // doc 1: NULL → '' (a real content transition a scrubber produces);
    // doc 2: NULL → NULL (genuinely unchanged); doc 3: '' → '' (ditto).
    // The old coalesce-to-'' digest classified doc 1 'unchanged'.
    val oldSnap = Seq((1L, None: Option[String]), (2L, None: Option[String]),
      (3L, Some(""))).toDF("doc_id", "text")
    val newSnap = Seq((1L, Some("")), (2L, None: Option[String]),
      (3L, Some(""))).toDF("doc_id", "text")
    val got = Quality.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "unchanged"),
      got.toString)
  }

  test("histogramDrift: NaN is excluded, never binned into the top bin") {
    import spark.implicits._
    // Spark orders NaN above every double: greatest(NaN, 0) = NaN, then
    // least(NaN, bins-1) = bins-1 — a NaN on one side only used to
    // manufacture spurious tail drift. NaN rows must simply not count.
    val before = Seq(0.0, 10.0, 20.0, 30.0).toDF("v")
    val after = Seq(0.0, 10.0, 20.0, 30.0, Double.NaN).toDF("v")
    val got = Quality.histogramDrift(before, after, "v", 0.0, 40.0, 4)
      .orderBy("bin").as[(Int, Long, Long, Double)].collect().toSeq
    // with NaN excluded the two sides are identical: zero drift, and
    // bin 3 holds exactly one row per side (not the NaN)
    assert(got.map(_._4).sum == 0.0, got.toString)
    assert(got.forall { case (_, nb, na, _) => nb == 1L && na == 1L },
      got.toString)
  }

  test("schemaDiff: added/removed/type_changed/unchanged; no job runs") {
    import spark.implicits._
    val old = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val next = Seq((1L, 1, true)).toDF("id", "score", "flag")
    val got = Quality.schemaDiff(old, next)
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("flag", null, "boolean", "added"),
      ("id", "bigint", "bigint", "unchanged"),
      ("name", "string", null, "removed"),
      ("score", "double", "int", "type_changed")))
  }

  test("fkViolations: allowlist broadcasts, fact side streams, counts exact") {
    import spark.implicits._
    val fact = Seq((1L, "x"), (2L, "y"), (2L, "z"), (7L, "w"), (null.asInstanceOf[Any], "n"))
      .map { case (k, v) => (Option(k).map(_.asInstanceOf[Long]), v) }
      .toDF("k", "v")
    val keys = Seq(1L, 3L).toDF("pk")
    val got = Quality.fkViolations(fact, keys, "k", "pk")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 7L -> 1L), got.toString)
    val plan = Quality.fkViolations(fact, keys, "k", "pk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"allowlist must broadcast into an anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle-sort:\n$plan")
  }

  test("embeddingGroupDrift: aligned group scores high, shifted group low, order-stable") {
    import spark.implicits._
    // group 0: vectors along +x (its mean IS roughly the global mean's
    // dominant direction); group 1: along +y — shifted away
    val emb = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.9f, 0.1f)),
      (2L, 0, Array(1.1f, -0.1f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val got = Quality.embeddingGroupDrift(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(0, 1))
    assert(got(0)._1 == 3L && got(1)._1 == 2L, "per-group vector counts")
    // global mean leans toward group 0 (3 of 5 vectors) — group 0's
    // drift cosine must exceed group 1's
    assert(got(0)._2 > got(1)._2,
      s"aligned group must score higher: $got")
    assert(got.values.forall(v => v._2 >= -1.0 && v._2 <= 1.0))
    // partition-order-proof: decimal sums make the result identical
    // under any repartitioning
    val re = Quality.embeddingGroupDrift(emb.repartition(7), "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(re == got)
  }

  test("tokenKlDrift: shifted group scores above aligned; smoothing keeps it finite") {
    import spark.implicits._
    val docs = Seq(
      // aligned: mirrors the corpus-dominant distribution
      ("aligned", "a b c d a b c d"),
      ("aligned", "a b c d a b c d"),
      ("aligned", "a b c d a b c d"),
      // shifted: one token dominates
      ("shifted", "a a a a a a a a"),
      // sparse: misses vocab terms entirely — add-one smoothing must
      // keep its score finite, not ±∞/NaN
      ("sparse", "a b")
    ).toDF("source", "text")
    val got = Quality.tokenKlDrift(docs, "source", "text", vocabSize = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("aligned", "shifted", "sparse"))
    // a group whose tokens are ALL out-of-vocabulary — the
    // maximally-drifted case — keeps its row (ng=0, uniform smoothed q)
    val withOov = docs.union(
      Seq(("broken", "zzz qqq yyy xxx www vvv uuu ttt"))
        .toDF("source", "text"))
    val oov = Quality.tokenKlDrift(withOov, "source", "text", vocabSize = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(oov.contains("broken"), "all-OOV group must surface, not vanish")
    assert(oov("broken")._1 == 0L)
    assert(!oov("broken")._2.isNaN && !oov("broken")._2.isInfinite)
    assert(got.values.forall(v => !v._2.isNaN && !v._2.isInfinite))
    assert(got("shifted")._2 > got("aligned")._2,
      s"the skewed distribution must drift more: $got")
    assert(got("aligned")._1 == 24L && got("shifted")._1 == 8L &&
      got("sparse")._1 == 2L, "in-vocab token counts")
    // deterministic under re-partitioning (decimal contributions)
    val re = Quality.tokenKlDrift(docs.repartition(7), "source", "text", 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(re == got)
  }

  test("streaming token KL ≡ batch: mergeable partials fold to the exact same score") {
    val docs = graft.Tables.load(spark, Sf0001, "documents")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getDouble(2))
    val got = graft.streaming.StreamPipeline
      .streamingTokenKl(spark, Sf0001, vocabSize = 1000)
      .collect().map(key).toSet
    val want = Quality.tokenKlDrift(docs, "source", "text", 1000)
      .collect().map(key).toSet
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("token-KL partial fold is genuinely exercised: multi-batch partials sum to the batch score") {
    // the single-file stream above yields ONE micro-batch (one partial
    // per key), which a broken fold would pass — this case manufactures
    // OVERLAPPING partials (both halves share sources AND tokens, so
    // nearly every key has two rows) and pins fold-then-score ≡ batch
    import org.apache.spark.sql.functions.{col, hash, pmod, sum => sqlSum}
    val docs = graft.Tables.load(spark, Sf0001, "documents")
    // hash split, NOT doc_id parity: the synthetic source column is
    // source = src(doc_id % 20), so a parity split partitions sources
    // exactly and produces zero overlapping keys — the hash split puts
    // every source in both halves
    val half = pmod(hash(col("doc_id")), org.apache.spark.sql.functions.lit(2))
    val halves = Seq(
      Quality.tokenCounts(docs.filter(half === 0), "source", "text"),
      Quality.tokenCounts(docs.filter(half =!= 0), "source", "text"))
    val partials = halves.reduce(_ unionAll _)
    // sanity: the union really carries duplicate (grp, tok) keys
    assert(partials.groupBy("grp", "tok").count()
      .filter(col("count") > 1).count() > 0,
      "fixture must produce overlapping partials")
    val folded = partials.groupBy(col("grp"), col("tok"))
      .agg(sqlSum(col("c")).as("c"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getDouble(2))
    val got = Quality.tokenKlFromCounts(folded, "source", 1000)
      .collect().map(key).toSet
    val want = Quality.tokenKlDrift(docs, "source", "text", 1000)
      .collect().map(key).toSet
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
  }
}
