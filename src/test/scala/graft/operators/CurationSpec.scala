package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination: planted benchmark overlap is flagged; clean docs are not") {
    // doc 10 copies benchmark doc 0's text verbatim; doc 11 is disjoint
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sh = Dedup.explodedShingles(docs, "text", "doc_id", 5)
    val out = Curation.contamination(
        sh.filter(col("doc_id") > 0), sh.filter(col("doc_id") === 0),
        "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(10L) == ((1.0, true)))  // verbatim copy: full overlap
    assert(out(11L) == ((0.0, false))) // disjoint: zero overlap
  }

  test("contamination: benchmark side broadcasts; corpus side does not shuffle for the join") {
    val docs = (0L to 200L).map(i => (i, s"tok${i % 7} a b c d e f g$i")).toDF("doc_id", "text")
    val sh = Dedup.explodedShingles(docs, "text", "doc_id", 5)
    val plan = Curation.contamination(
        sh.filter(col("doc_id") % 97 =!= 0), sh.filter(col("doc_id") % 97 === 0),
        "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("assignSplit: deterministic, content-keyed, approximately proportioned") {
    val docs = (0 until 2000).map(i => s"document number $i with some text").toDF("text")
    val splits = docs.select(Curation.assignSplit(col("text"), 90, 5).as("split"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits("train") > 1600 && splits("train") < 1950) // ~90%
    assert(splits.values.sum == 2000)
    // same content → same split, independent of row order/partitioning
    val a = docs.repartition(13).select(Curation.assignSplit(col("text"), 90, 5))
      .collect().map(_.getString(0))
    val b = docs.repartition(3).select(Curation.assignSplit(col("text"), 90, 5))
      .collect().map(_.getString(0))
    assert(a.sorted.toSeq == b.sorted.toSeq)
  }

  test("assignSplit: NULL text propagates to a NULL split, never 'test'") {
    // the null hash bucket used to make both when() tests null and fall
    // through to otherwise("test"), silently routing 100% of NULL-text
    // docs into the held-out split
    val docs = Seq(Some("real document text"), None: Option[String]).toDF("text")
    val got = docs.select(Curation.assignSplit(col("text"), 90, 5).as("split"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.count(_ == null) == 1, got.mkString(","))
    assert(!got.contains("test") || got.count(_ != null) == 1)
  }

  test("temperatureMix: NULL-domain rows neither survive nor shape the budget") {
    // NULL-domain rows were always dropped by the null-rejecting join,
    // but they used to count into __wsum and __target, deflating every
    // real domain's keep rate — the same corpus with NULL-domain rows
    // added must keep EXACTLY the same real-domain docs
    val base = ((0 until 400).map(i => (s"big corpus document $i", "big")) ++
      (0 until 25).map(i => (s"small corpus document $i", "small")))
      .toDF("text", "source")
    val withNulls = base.unionByName(
      (0 until 300).map(i => (s"orphan doc $i", null: String))
        .toDF("text", "source"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(ids(Curation.temperatureMix(withNulls, "text", "source", 1, 2)) ==
      ids(Curation.temperatureMix(base, "text", "source", 1, 2)))
  }

  test("domainMix: rate 1.0 keeps all, 0.0 keeps none, decisions are content-stable") {
    val docs = (0 until 500).map(i => (s"doc text number $i", if (i % 2 == 0) "a" else "b"))
      .toDF("text", "source")
    def kept(rates: Map[String, Double], default: Double): Long =
      docs.filter(Curation.domainMix(col("text"), col("source"), rates, default)).count()
    assert(kept(Map("a" -> 1.0, "b" -> 1.0), 1.0) == 500)
    assert(kept(Map("a" -> 0.0, "b" -> 0.0), 0.0) == 0)
    val half = kept(Map("a" -> 1.0), default = 0.5) // a all, b ~half
    assert(half > 250 + 80 && half < 250 + 170)
    // repartitioning must not change any decision
    assert(docs.repartition(17)
      .filter(Curation.domainMix(col("text"), col("source"), Map("a" -> 1.0), 0.5))
      .count() == half)
  }

  test("temperatureMix: α=1/2 upsamples small domains, integer rule is partition-stable") {
    // big domain 800 docs, small domain 50: natural shares 94%/6%; at
    // α = 1/2 the small domain's sampling weight share rises to
    // √50/(√800+√50) ≈ 20%
    val docs = ((0 until 800).map(i => (s"big corpus document $i", "big")) ++
      (0 until 50).map(i => (s"small corpus document $i", "small")))
      .toDF("text", "source")
    val kept = Curation.temperatureMix(docs, "text", "source", 1, 2)
    val census = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 850L
    // expected keep rates: s_big=floor(√800)=28, s_small=floor(√50)=7,
    // S=35, T=425 → r_big = 28·425/(35·800) = 0.425, r_small =
    // 7·425/(35·50) = 1.7 → capped at 1 (all kept)
    assert(census("small") == 50, s"small domain should keep all: $census")
    assert(census("big") > 800 * 0.425 - 60 && census("big") < 800 * 0.425 + 60,
      s"big domain should keep ~42.5%: $census")
    // the keep decision is per-row content hashing — identical under any
    // partitioning — and monotone in the target fraction (a doc kept at
    // T/2 is kept at T: same bucket, larger right side)
    assert(Curation.temperatureMix(docs.repartition(13), "text", "source", 1, 2)
      .count() == kept.count())
    val full = Curation.temperatureMix(docs, "text", "source", 1, 1)
    assert(full.count() >= kept.count() && full.count() <= n)
  }

  test("qualitySample: keep rate tracks the score, deterministic, monotone in quality") {
    // quality 1.0 keeps everything, 0.0 keeps nothing, 0.5 keeps ~half
    val docs = (0 until 1000).map(i => s"sample document number $i").toDF("text")
    def kept(q: Double): Long =
      Curation.qualitySample(docs, "text", lit(q)).count()
    assert(kept(1.0) == 1000)
    assert(kept(0.0) == 0)
    val half = kept(0.5)
    assert(half > 400 && half < 600, s"got $half")
    // deterministic under repartitioning, and a doc kept at q is kept at
    // any higher q (same bucket, larger threshold)
    assert(Curation.qualitySample(docs.repartition(11), "text", lit(0.5)).count() == half)
    val at5 = Curation.qualitySample(docs, "text", lit(0.5)).as[String].collect().toSet
    val at7 = Curation.qualitySample(docs, "text", lit(0.7)).as[String].collect().toSet
    assert(at5.subsetOf(at7))
  }

  test("sampleKPerKey: k per stratum, rank contiguous, stable under repartitioning") {
    val docs = (0 until 300).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    val a = Curation.sampleKPerKey(docs, "src", "id", k = 7)
      .select("src", "id", "sample_rank")
      .as[(String, Long, Int)].collect().sorted.toSeq
    val counts = a.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(counts.keySet == Set("src0", "src1", "src2"))
    assert(counts.values.forall(_ == (1 to 7)))
    val b = Curation.sampleKPerKey(docs.repartition(13), "src", "id", k = 7)
      .select("src", "id", "sample_rank")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(a == b, "the draw must not depend on physical partitioning")
  }

  test("sampleKPerKey: distinct salts give independent draws; small groups pass through") {
    val docs = (0 until 300).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    def ids(salt: String) = Curation.sampleKPerKey(docs, "src", "id", 7, salt)
      .select("id").as[Long].collect().toSet
    assert(ids("sample:") != ids("audit:"), "salted draws should differ")
    val tiny = Seq((1L, "only")).toDF("id", "src")
    val out = Curation.sampleKPerKey(tiny, "src", "id", k = 5)
      .select("id", "sample_rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1)))
  }

  test("packSequences: bins advance with the token stream, never cross shards") {
    // one shard (ids all ≡ 1 mod 8 won't happen with shards=1): use shards=1
    val docs = Seq((0L, 1000), (1L, 1000), (2L, 1000), (3L, 50), (4L, 5000))
      .toDF("doc_id", "ntok")
    val out = Curation.packSequences(docs, "doc_id", "ntok", budget = 2048, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // stream starts: 0, 1000, 2000, 3000, 3050 → bins 0,0,0,1,1
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // sharded: bin indices restart per shard (shard-local token streams)
    val sharded = Curation.packSequences(docs, "doc_id", "ntok", 2048, shards = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sharded.filter(_._2 == 0).map(_._3).min == 0L)
    assert(sharded.filter(_._2 == 1).map(_._3).min == 0L)
    // NEGATIVE ids (signed 60-bit hashes are ids elsewhere in this repo)
    // must land in [0, shards): plain % yielded negative shard values,
    // doubling the shard census and misrouting [0,shards)-keyed writers
    val neg = Seq((-3L, 100), (-2L, 100), (5L, 100)).toDF("doc_id", "ntok")
    val shards = Curation.packSequences(neg, "doc_id", "ntok", 2048, shards = 4)
      .collect().map(_.getInt(1))
    assert(shards.forall(s => s >= 0 && s < 4), shards.mkString(","))
  }

  test("seededShuffle: a reproducible permutation, decorrelated from corpus order") {
    val docs = (0L until 200L).toDF("doc_id")
    val a = Curation.seededShuffle(docs, "doc_id", shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // a permutation: every doc exactly once, seq dense 1..n within a shard
    assert(a.map(_._1).distinct.length == 200)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)) }
    // reproducible: a re-run (fresh plan, different partitioning) is identical
    val b = Curation.seededShuffle(docs.repartition(7), "doc_id", shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.toSet == b.toSet)
    // decorrelated: within a shard, consecutive export positions are not
    // consecutive corpus ids (the property the shuffle exists for)
    val byShard = a.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(_._3).toSeq.sliding(2).collect {
        case Seq(x, y) => (y._1 - x._1).abs }
    }
    assert(byShard.count(_ == 1) < byShard.size / 4)
    // a different seed is an independent draw
    val c = Curation.seededShuffle(docs, "doc_id", shards = 4, seed = "other:")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(c.toSet != a.toSet)
  }

  test("importanceWeights: target-like docs outweigh target-unlike docs") {
    // target vocabulary {alpha..epsilon}; raw pool has one doc written
    // in target vocabulary and one in disjoint vocabulary — the DSIR
    // log-ratio must rank the target-like doc strictly higher
    val docs = Seq(
      (0L, true, "alpha beta gamma delta epsilon alpha beta gamma"),
      (1L, true, "alpha gamma epsilon beta delta gamma alpha beta"),
      (10L, false, "alpha beta gamma delta epsilon beta alpha gamma"),
      (11L, false, "zebra yak xylo walrus vulture yak zebra xylo"),
      (12L, false, "alpha beta zebra yak gamma delta walrus vulture"))
      .toDF("doc_id", "is_t", "text")
    val w = Curation.importanceWeights(docs, "doc_id", "text",
        col("is_t"), buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L), "only raw-pool docs are scored")
    assert(w(10L) > w(12L) && w(12L) > w(11L),
      s"expected target-like > mixed > disjoint, got $w")
    // deterministic across partitionings
    val w2 = Curation.importanceWeights(docs.repartition(5), "doc_id",
        "text", col("is_t"), buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w == w2)
  }

  test("importanceWeights: log-ratio table broadcasts; corpus text never shuffles") {
    val docs = (0L to 300L)
      .map(i => (i, i % 5 == 0, s"tok${i % 11} tok${i % 7} common word$i"))
      .toDF("doc_id", "is_t", "text")
    val plan = Curation.importanceWeights(docs, "doc_id", "text",
        col("is_t"), buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      "the 64-row log-ratio side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no corpus-sized join shuffle")
  }

  test("importanceScore (stateless fold) ≡ importanceWeights (distributed join)") {
    val docs = (0L to 150L)
      .map(i => (i, i % 6 == 0, s"tok${i % 9} tok${i % 5} body word${i % 23} tail"))
      .toDF("doc_id", "is_t", "text")
    val batch = Curation.importanceWeights(docs, "doc_id", "text",
        col("is_t"), buckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lrRows = Curation.importanceLogRatios(docs, "text", col("is_t"), 32).collect()
    val lr = lrRows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val floor = Curation.importanceUnseenFloor(
      lrRows.head.getLong(2), lrRows.head.getLong(3), 32)
    val (n, w) = Curation.importanceScore(col("text"), lr, floor, 32)
    val fold = docs.filter(!col("is_t"))
      .select(col("doc_id"), n.as("n"), w.as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fold == batch, "per-row fold must reproduce the distributed scoring")
    // the fold is shuffle-free: scan → project, nothing else
    val plan = docs.filter(!col("is_t"))
      .select(col("doc_id"), n.as("n"), w.as("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stateless scorer must not shuffle")
    // unseen bucket: a vocabulary the reference never hashed scores
    // n_tokens × floor exactly
    val novel = Seq((999L, "zzqx1 zzqx2 zzqx3")).toDF("doc_id", "text")
    val lrEmpty = Map.empty[Int, Double]
    val (n2, w2) = Curation.importanceScore(col("text"), lrEmpty, floor, 32)
    val out = novel.select(n2.as("n"), w2.as("w")).head()
    assert(out.getLong(0) == 3L)
    assert(math.abs(out.getDouble(1) -
      BigDecimal(3 * floor).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("importanceResample: k rows from the raw pool, deterministic, fresh salt = fresh draw") {
    val docs = (0L to 400L)
      .map(i => (i, i % 4 == 0, s"word${i % 13} word${i % 17} filler$i body"))
      .toDF("doc_id", "is_t", "text")
    val a = Curation.importanceResample(docs, "doc_id", "text",
        col("is_t"), buckets = 32, k = 25)
      .collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(a.length == 25)
    assert(a.map(_._2).sorted.toSeq == (1 to 25), "dense ranks 1..k")
    assert(a.forall(_._1 % 4 != 0), "target rows are never drawn")
    val b = Curation.importanceResample(docs.repartition(9), "doc_id",
        "text", col("is_t"), buckets = 32, k = 25)
      .collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(a.toSeq == b.toSeq, "identical draw across partitionings")
    val c = Curation.importanceResample(docs, "doc_id", "text",
        col("is_t"), buckets = 32, k = 25, salt = "other:")
      .collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(c.map(_._1).toSet != a.map(_._1).toSet,
      "a different salt should perturb the drawn set")
  }

  test("curation_audit: independent-gate conjunction reconciles with the sequential funnel") {
    // every audit gate is per-doc deterministic and independent of the
    // other gates, so filtering on the conjunction must reproduce the
    // sequential pipeline's survivor census exactly — the property that
    // makes the audit view TRUSTWORTHY as a debugging tool
    val audit = graft.SparkEntry.queries("curation_audit")(spark, Sf0001)
      .localCheckpoint()
    val census = audit.filter(col("keep"))
      .groupBy(col("source"), col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val funnel = graft.SparkEntry.queries("curation_pipeline")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(census == funnel,
      s"audit keep-census $census != funnel census $funnel")
    // the fixture must genuinely EXERCISE each gate (both outcomes where
    // the fixture can produce them; sf0.001 has no duplicate texts, so
    // canonicality cannot fail here — the exact-dedup specs own that
    // gate's negative case)
    val rows = audit.collect()
    def both(i: Int, name: String): Unit = {
      assert(rows.exists(_.getBoolean(i)), s"no doc passes $name")
      assert(rows.exists(r => !r.getBoolean(i)), s"no doc fails $name")
    }
    both(3, "quality_pass"); both(4, "low_repetition"); both(6, "mix_keep")
    assert(rows.exists(_.getBoolean(5)),
      "no contaminated doc — the benchmark slice must self-match")
    both(8, "keep")
    assert(rows.length == graft.Tables.load(spark, Sf0001, "documents").count(),
      "one audit row per document")
  }

  test("streaming audit ≡ batch audit's stateless columns, row for row") {
    // per-doc independence makes the ingest leg batch-equivalent; the
    // corpus-global columns (is_canonical, keep) are absent by design
    val stream = graft.streaming.StreamPipeline
      .streamingCurationAudit(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6))).toSet
    val batch = graft.SparkEntry.queries("curation_audit")(spark, Sf0001)
      .select("doc_id", "source", "quality_pass", "low_repetition",
        "contaminated", "mix_keep", "split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6))).toSet
    assert(stream == batch,
      s"diff: ${(stream -- batch).take(2)} / ${(batch -- stream).take(2)}")
    assert(stream.exists(_._5), "contamination gate fires at ingest")
  }

  test("perplexityBuckets: value-ordered tiers, tail dropped, unscoreable docs absent") {
    val docs = graft.Tables.load(spark, Sf0001, "documents")
    val out = Curation.perplexityBuckets(docs, "doc_id", "text")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.map(_._3).toSet == Set(1, 2, 3))
    // tiers are value-ordered: every bucket-b fluency ≤ every bucket-(b+1)
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket(1).max <= byBucket(2).min)
    assert(byBucket(2).max <= byBucket(3).min)
    // equal fluency values never split across buckets (the Binning
    // contract ntile would violate)
    assert(rows.groupBy(_._2).values.forall(_.map(_._3).distinct.length == 1))
    // kept ⇔ above the tail
    assert(rows.forall { case (_, _, b, kept) => kept == (b >= 2) })
    // docs the LM cannot score are absent, everything else is present
    import spark.implicits._
    val scoreable = graft.operators.TextAnalysis
      .bigramFluency(docs, "doc_id", "text").count()
    assert(rows.length.toLong == scoreable)
    // re-partitioning must not move any doc across buckets
    val shuffled = Curation.perplexityBuckets(
        docs.repartition(7, col("source")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(rows.forall { case (id, _, b, _) => shuffled(id) == b })
  }

  test("prototypePrune: per-cluster floor(n·frac) most-prototypical rows drop") {
    val centroids = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val emb = Seq(
      (10L, Array(1f, 0f)),    // cluster 0, csim 1.0 → rank 1
      (11L, Array(1f, 0.1f)),
      (12L, Array(1f, 0.3f)),
      (13L, Array(1f, 0.6f)),  // n=4, drop 1/4 → floor(1)=1: only rank 1 drops
      (20L, Array(0f, 1f)),
      (21L, Array(0.1f, 1f)),
      (22L, Array(0.3f, 1f)))  // n=3, drop 1/4 → floor(0.75)=0: all kept
      .toDF("vec_id", "embedding")
    val out = Curation.prototypePrune(emb, centroids, "vec_id", "embedding",
        dropNum = 1, dropDen = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getBoolean(4)))).toMap
    assert(out == Map(
      10L -> ((1, false)), 11L -> ((2, true)), 12L -> ((3, true)), 13L -> ((4, true)),
      20L -> ((1, true)), 21L -> ((2, true)), 22L -> ((3, true))))
  }

  test("prototypePrune: centroid-sim ties break to the lower id; 0 and 1 fractions") {
    val centroids = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val emb = Seq((30L, Array(1f, 0f)), (31L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val half = Curation.prototypePrune(emb, centroids, "vec_id", "embedding", 1, 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(half == Map(30L -> false, 31L -> true),
      "identical vectors: the lower id is rank 1 and drops first")
    val none = Curation.prototypePrune(emb, centroids, "vec_id", "embedding", 0, 10)
    assert(none.collect().forall(_.getBoolean(4)), "drop fraction 0 keeps all")
    val all = Curation.prototypePrune(emb, centroids, "vec_id", "embedding", 10, 10)
    assert(all.collect().forall(!_.getBoolean(4)), "drop fraction 1 drops all")
  }

  test("prototypePrune matches a driver-side brute-force reference on the synthetic embeddings") {
    val emb = graft.Tables.load(spark, Sf0001, "embeddings")
    val centroids = emb.filter(col("vec_id") % 100 === 0)
    val got = Curation.prototypePrune(emb, centroids, "vec_id", "embedding",
        dropNum = 3, dropDen = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3), r.getBoolean(4))))
      .toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = vecs.keys.filter(_ % 100 == 0).toSeq.sorted
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val assign = vecs.map { case (id, v) =>
      id -> cents.map(c => (c, r6(cos(v, vecs(c))))).maxBy { case (c, s) => (s, -c.toDouble) }
    }
    val want = assign.groupBy(_._2._1).flatMap { case (cl, rows) =>
      val ranked = rows.toSeq.map { case (id, (_, s)) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }
      val cut = ranked.size * 3 / 10 // floor(n·3/10)
      ranked.zipWithIndex.map { case ((id, _), i) =>
        id -> ((cl, i + 1, i + 1 > cut))
      }
    }
    assert(got == want)
    assert(got.values.count(!_._3) > 0, "fixture must exercise drops")
  }

  test("D4 composition: prototypePruneAssigned ranks among SemDeDup survivors only") {
    val emb = graft.Tables.load(spark, Sf0001, "embeddings")
    val centroids = emb.filter(col("vec_id") % 100 === 0)
    val sem = Dedup.semDedup(emb, centroids, "vec_id", "embedding", threshold = 0.3)
    val survivors = sem.filter(col("keep"))
      .select(col("vec_id"), col("cluster"), col("centroid_sim"))
    val out = Curation.prototypePruneAssigned(survivors, "vec_id", 3, 10)
      .collect()
    val sIds = survivors.collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == sIds,
      "stage 2 scores exactly the stage-1 survivors")
    // ranks dense 1..n and drop count exactly floor(n·3/10), per cluster
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted
      assert(ranks.toSeq == (1 to rows.length), "dense per-cluster ranks")
      assert(rows.count(!_.getBoolean(4)) == rows.length * 3 / 10,
        "exact floor drop count per cluster")
    }
    assert(out.length < emb.count(), "SemDeDup removed rows before stage 2")
  }
}
