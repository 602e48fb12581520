package graft.index

import graft.SparkSpec
import graft.operators.{Dedup, Retrieval, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four persisted index families under the manifest protocol — per
  * family: a probe racing an append/compact/refresh resolves the old or
  * the new index, never a torn mix (staged segments invisible, swap is
  * one commit), and the manifest lifecycle converges to the from-scratch
  * build the bare-path specs pin. */
class IndexConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new java.io.File(
      java.lang.System.getProperty("java.io.tmpdir"),
      s"graft_idxconc_${tag}_${java.util.UUID.randomUUID().toString.take(8)}").toString

  // a crashed/in-flight writer: segment files staged under a table's
  // directory, no manifest commit
  private def stageOrphan(root: String, table: String, df: DataFrame): Unit =
    df.write.parquet(s"$root/${IndexManifest.newSegment(table)}")

  // ---- gram digest log -------------------------------------------------

  test("gram_index_concurrent: probe during append sees old or new, never a mix") {
    val lakeShared = "the standing corpus carries this boilerplate banner text"
    val lake = Seq(
      (10L, s"lake alpha opens.. $lakeShared ..and wanders off topic for a while"),
      (11L, s"lake beta text... $lakeShared ...lake beta closes differently"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (90L, s"delta one preface $lakeShared delta one epilogue entirely new"),
      (91L, "delta two is wholly original and must produce no span rows"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (200L, s"probe document... $lakeShared ...probing the standing index"))
      .toDF("doc_id", "text")
    val L = 16
    val root = freshRoot("gram")

    Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)
    def probeSpans() = Dedup.incrementalSpans(
        Dedup.readGramIndexM(spark, root), probe, "doc_id", "text", L)
      .as[(Long, Int, Int)].collect().toSet
    val before = probeSpans()
    assert(before.nonEmpty)

    // torn append: delta digest rows staged but not committed → invisible
    stageOrphan(root, "grams", Seq((999999999L, 999L)).toDF("h", "owner"))
    assert(probeSpans() == before, "uncommitted append leaked into a probe")
    assert(Dedup.readGramIndexM(spark, root).count() ==
      IndexManifest.readAt(spark, root,
        IndexManifest.snapshotAt(spark, root, 1L), "grams").count())

    // committed append: probe flips to the accumulated index atomically
    val pinned = IndexManifest.snapshot(spark, root)
    Dedup.appendGramIndexM(delta, "doc_id", "text", L, root)
    val grown = Dedup.readGramIndexM(spark, root)
    val fromScratch = lake.unionByName(delta)
    val wantRows = {
      val p = freshRoot("gram_scratch")
      Dedup.buildGramIndexM(fromScratch, "doc_id", "text", L, p)
      Dedup.readGramIndexM(spark, p)
        .groupBy("h").agg(min("owner").as("owner"))
        .as[(Long, Long)].collect().toSet
    }
    assert(grown.groupBy("h").agg(min("owner").as("owner"))
      .as[(Long, Long)].collect().toSet == wantRows,
      "append+manifest must converge to the from-scratch index")
    // the pinned pre-append reader still resolves the old log
    assert(IndexManifest.readAt(spark, root, pinned, "grams")
      .count() < grown.count())

    // compact: atomic pointer swap to ONE folded segment, probe unchanged
    val preCompact = probeSpans()
    Dedup.compactGramIndexM(spark, root)
    assert(IndexManifest.snapshot(spark, root).tables("grams").size == 1)
    assert(probeSpans() == preCompact, "compact changed probe results")
    assert(Dedup.readGramIndexM(spark, root)
      .as[(Long, Long)].collect().toSet == wantRows)
    // vacuum drops superseded segments; the live index still serves
    assert(IndexManifest.vacuum(spark, root) > 0)
    assert(probeSpans() == preCompact)
  }

  // ---- LSH bands/sigs --------------------------------------------------

  test("lsh_index_concurrent: sigs+bands move together; append/compact/refresh atomic") {
    val clique = "copied boilerplate body shared by every clique member verbatim"
    val pairText = "a genuinely unique passage that two documents happen to share"
    val lake = Seq((1L, clique), (3L, clique), (7L, pairText))
    val delta = Seq((11L, clique), (13L, clique))
    val probeDocs = Seq((100L, clique), (102L, pairText))
    def sh(rows: Seq[(Long, String)]) =
      Dedup.rawShingles(rows.toDF("doc_id", "text"), "text", "doc_id", 5)
    val root = freshRoot("lsh")

    Dedup.buildLshIndexM(sh(lake), "doc_id", k = 16, bands = 4, root)
    def probePairs(stale: Boolean) = {
      val (bands, sigs) = Dedup.readLshIndexM(spark, root)
      Dedup.indexedCrossCorpusPairs(bands, sigs, sh(probeDocs), "doc_id",
          k = 16, bands = 4, maxBucket = 1000, staleCounts = stale)
        .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    }
    val before = probePairs(stale = false)
    assert(before.nonEmpty)

    // torn append: both tables staged, nothing committed → invisible
    stageOrphan(root, "sigs",
      Seq((999L, Array.fill(16)(0L))).toDF("id", "sig"))
    stageOrphan(root, "bands",
      Seq((999L, 0, "junk", 1L)).toDF("id", "band", "band_hash", "bucket_n"))
    assert(probePairs(stale = false) == before,
      "uncommitted LSH segments leaked into a probe")

    // committed append: probe over the accumulated lake, stale-counts exact
    Dedup.appendLshIndexM(sh(delta), "doc_id", k = 16, bands = 4, root)
    val want = Dedup.crossCorpusLshPairs(sh(probeDocs), sh(lake ++ delta),
        "doc_id", 16, 4, maxBucket = 1000)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(probePairs(stale = true) == want)

    // compact: one commit swaps BOTH tables to single fresh segments
    Dedup.compactLshIndexM(spark, root)
    val snap = IndexManifest.snapshot(spark, root)
    assert(snap.tables("sigs").size == 1 && snap.tables("bands").size == 1)
    assert(probePairs(stale = false) == want, "compacted probe diverged")

    // refresh on a digested index: swap in place of the out-path dance
    val root2 = freshRoot("lshref")
    val oldLake = lake.map { case (id, t) =>
      (id, if (id == 3L) s"stale $t" else t) }
    Dedup.buildLshIndexDigestedM(oldLake.toDF("doc_id", "text"),
      "text", "doc_id", 5, 16, 4, root2)
    Dedup.refreshLshIndexM(lake.toDF("doc_id", "text"),
      "text", "doc_id", 5, 16, 4, root2)
    val (bands2, sigs2) = Dedup.readLshIndexM(spark, root2)
    val refreshed = Dedup.indexedCrossCorpusPairs(bands2, sigs2,
        sh(probeDocs), "doc_id", k = 16, bands = 4, maxBucket = 1000)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    val wantRef = Dedup.crossCorpusLshPairs(sh(probeDocs), sh(lake),
        "doc_id", 16, 4, maxBucket = 1000)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(refreshed == wantRef, "refreshed index must match the new corpus")
  }

  // ---- BM25 postings/stats/corpus -------------------------------------

  test("bm25_index_concurrent: triple resolves consistently; compact ≡ pre-compact") {
    val corpus = Seq(
      (0L, "spark window agg spark window"),
      (1L, "hash join table hash"),
      (2L, "spark agg"),
      (3L, "filter scan sort"))
      .toDF("doc_id", "text")
    val even = corpus.filter(col("doc_id") % 2 === 0)
    val odd = corpus.filter(col("doc_id") % 2 =!= 0)
    val qs = Seq(0 -> "spark agg", 1 -> "hash join")
    val root = freshRoot("bm25")

    Retrieval.buildIndexM(even, "doc_id", "text", root)
    def probe() = Retrieval.bm25ProbeM(spark, root, qs, 10)
      .as[(Int, Long, Double, Int)].collect().toSet
    val before = probe()
    assert(before.nonEmpty)

    // torn append: postings staged without their df/corpus twins or a
    // commit — the probe must not see postings with mismatched stats
    stageOrphan(root, "postings",
      Seq(("spark", 999L, 2, 2L)).toDF("term", "doc_id", "dl", "tf"))
    assert(probe() == before, "uncommitted postings leaked into a probe")

    // committed append: probe ≡ inline retrieval over the full corpus
    Retrieval.appendIndexM(odd, "doc_id", "text", root)
    val want = Retrieval.bm25TopK(corpus, "doc_id", "text", qs, 10)
      .as[(Int, Long, Double, Int)].collect().toSet
    assert(probe() == want)

    // append idempotence guard: dedupAgainstIndex drops re-sent docs
    Retrieval.appendIndexM(odd, "doc_id", "text", root,
      dedupAgainstIndex = true)
    assert(probe() == want, "re-appended docs double-counted despite dedup")

    // compact: stats fold to one row per term, corpus to one row, the
    // triple swaps atomically, probe bit-identical
    Retrieval.compactIndexM(spark, root)
    val snap = IndexManifest.snapshot(spark, root)
    assert(Seq("postings", "stats", "corpus").forall(snap.tables(_).size == 1))
    assert(IndexManifest.read(spark, root, "stats")
      .groupBy("term").count().filter(col("count") > 1).isEmpty)
    assert(IndexManifest.read(spark, root, "corpus").count() == 1)
    assert(probe() == want, "probe-after-compact must equal probe-before")
    IndexManifest.vacuum(spark, root)
    assert(probe() == want)
  }

  // ---- semantic embed index (streaming stream-static build side) ------

  test("semantic_index_concurrent: embed segments commit atomically") {
    val root = freshRoot("sem")
    graft.streaming.StreamPipeline.buildSemanticIndexM(spark, Sf0001, root)
    val baseN = graft.streaming.StreamPipeline.readSemanticIndexM(spark, root).count()
    assert(baseN > 0)

    // torn append: staged embed rows invisible until the commit lands
    stageOrphan(root, "embeds",
      Seq((9999999L, Array.fill(64)(0.0f), "junk"))
        .toDF("corpus_id", "__cv", "bucket"))
    assert(graft.streaming.StreamPipeline.readSemanticIndexM(spark, root)
      .count() == baseN, "uncommitted embed segment leaked")

    // committed append of a disjoint delta: exactly the delta's rows join
    val delta = Seq(
      (1000001L, "fresh arrival document body for the semantic index"),
      (1000002L, "another fresh arrival with different content entirely"))
      .toDF("doc_id", "text")
    graft.streaming.StreamPipeline.appendSemanticIndexM(delta, "doc_id", "text", root)
    val after = graft.streaming.StreamPipeline.readSemanticIndexM(spark, root)
    assert(after.count() == baseN + 2)
    assert(after.filter(col("corpus_id") > 1000000L).count() == 2)
  }

  // ---- PQ codes/codebook ----------------------------------------------

  test("ivf_index_concurrent: centroids and assignment resolve together; lifecycle converges") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val centroids = emb.filter(col("vec_id") < 3)
    val queries = emb.filter(col("vec_id") === 0)
    val root = freshRoot("ivf")

    Similarity.buildIvfIndexM(emb.filter(col("vec_id") < 4), centroids,
      "vec_id", "embedding", root)
    def probe() = Similarity.ivfProbeM(queries, "vec_id", "embedding",
        k = 3, nProbe = 2, root)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    def want(corpus: DataFrame) = Similarity.ivfTopKProbed(queries, corpus,
        centroids, "vec_id", "embedding", k = 3, nProbe = 2)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val before = probe()
    assert(before == want(emb.filter(col("vec_id") < 4)) && before.nonEmpty)

    // torn append: staged assignment rows invisible until committed
    stageOrphan(root, "ivf_assigned",
      Seq((999L, "junk", 0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
        .toDF("id", "vdig", "cluster", "vec"))
    assert(probe() == before, "uncommitted IVF assignment leaked into a probe")

    // committed append with STORED centroids ≡ inline search on the
    // grown corpus; compact folds segments, probe bit-identical
    Similarity.appendIvfIndexM(emb, "vec_id", "embedding", root)
    assert(probe() == want(emb))
    Similarity.compactIvfIndexM(spark, root)
    assert(IndexManifest.snapshot(spark, root).tables("ivf_assigned").size == 1)
    assert(probe() == want(emb), "IVF probe-after-compact diverged")

    // refresh against an updated snapshot: changed vectors re-assign,
    // retired ids drop, one swap commit, result ≡ inline on new corpus
    val updated = emb.filter(col("vec_id") =!= 3 && col("vec_id") =!= 4)
      .unionByName(Seq((4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    val snapPre = IndexManifest.snapshot(spark, root)
    Similarity.refreshIvfIndexM(updated, "vec_id", "embedding", root)
    val snapPost = IndexManifest.snapshot(spark, root)
    assert(snapPost.version == snapPre.version + 1)
    assert(snapPost.tables("ivf_assigned").size == 1)
    assert(probe() == want(updated), "refreshed IVF index must match the new corpus")
  }

  test("ivfpq_index_concurrent: centroids, codebook, and codes resolve together") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val sample = emb.filter(col("vec_id") < 3)
    val cb = Similarity.pqCodebook(sample, "vec_id", "embedding", m = 2, dsub = 2)
    val queries = emb.filter(col("vec_id") === 0)
    val root = freshRoot("ivfpq")

    Similarity.buildIvfPqIndexM(emb.filter(col("vec_id") < 4), sample, cb,
      "vec_id", "embedding", m = 2, dsub = 2, root)
    def probe() = Similarity.ivfPqProbeM(queries, "vec_id", "embedding",
        k = 3, m = 2, dsub = 2, nProbe = 2, root)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    def want(corpus: DataFrame) = Similarity.ivfPqTopK(queries, corpus,
        sample, sample, "vec_id", "embedding", k = 3, m = 2, dsub = 2, nProbe = 2)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val before = probe()
    assert(before == want(emb.filter(col("vec_id") < 4)) && before.nonEmpty)

    // torn append: staged code rows invisible until committed
    stageOrphan(root, "ivfpq_codes",
      Seq((999L, "junk", 0L, Array(0, 0)))
        .toDF("id", "vdig", "cluster", "codes"))
    assert(probe() == before, "uncommitted IVF-PQ codes leaked into a probe")

    // committed append with STORED centroids+codebook ≡ inline on the
    // grown corpus; compact is a pure re-layout
    Similarity.appendIvfPqIndexM(emb, "vec_id", "embedding", 2, 2, root)
    assert(probe() == want(emb))
    Similarity.compactIvfPqIndexM(spark, root)
    assert(IndexManifest.snapshot(spark, root).tables("ivfpq_codes").size == 1)
    assert(probe() == want(emb), "IVF-PQ probe-after-compact diverged")

    // refresh: changed vectors re-assign + re-encode, retired drop
    val updated = emb.filter(col("vec_id") =!= 3 && col("vec_id") =!= 4)
      .unionByName(Seq((4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    Similarity.refreshIvfPqIndexM(updated, "vec_id", "embedding", 2, 2, root)
    assert(IndexManifest.snapshot(spark, root).tables("ivfpq_codes").size == 1)
    assert(probe() == want(updated), "refreshed IVF-PQ index must match the new corpus")
  }

  test("pq_index_concurrent: codes and codebook resolve together; refresh is a swap") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", m = 2, dsub = 2)
    val queries = emb.filter(col("vec_id") === 0)
    val root = freshRoot("pq")

    Similarity.buildPqIndexM(emb.filter(col("vec_id") < 3), cb,
      "vec_id", "embedding", m = 2, dsub = 2, root)
    def probe() = Similarity.pqProbeM(queries, "vec_id", "embedding",
        k = 3, m = 2, dsub = 2, root)
      .as[(Long, Long, Double, Int)].collect().toSet
    val before = probe()
    assert(before.nonEmpty)

    // torn append: staged codes invisible until committed
    stageOrphan(root, "codes",
      Seq((999L, "junk", Array(0, 0))).toDF("id", "vdig", "codes"))
    assert(probe() == before, "uncommitted PQ codes leaked into a probe")

    // committed append: search ≡ search over a from-scratch digested index
    Similarity.appendPqIndexM(emb, "vec_id", "embedding", 2, 2, root)
    val want = Similarity.pqSearchEncoded(queries,
        Similarity.pqIndexDigested(emb, cb, "vec_id", "embedding", 2, 2),
        cb, "vec_id", "embedding", k = 3, m = 2, dsub = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(probe() == want)

    // compact: appended segments fold to one, probe bit-identical
    Similarity.compactPqIndexM(spark, root)
    assert(IndexManifest.snapshot(spark, root).tables("codes").size == 1)
    assert(probe() == want, "PQ probe-after-compact diverged")

    // refresh against an updated snapshot: one swap commit, result ≡
    // from-scratch over the new corpus; retired ids drop out
    val updated = emb.filter(col("vec_id") =!= 3 && col("vec_id") =!= 4)
      .unionByName(Seq((4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    val snapPre = IndexManifest.snapshot(spark, root)
    Similarity.refreshPqIndexM(updated, "vec_id", "embedding", 2, 2, root)
    val snapPost = IndexManifest.snapshot(spark, root)
    assert(snapPost.version == snapPre.version + 1)
    assert(snapPost.tables("codes").size == 1)
    val wantRef = Similarity.pqSearchEncoded(queries,
        Similarity.pqIndexDigested(updated, cb, "vec_id", "embedding", 2, 2),
        cb, "vec_id", "embedding", k = 3, m = 2, dsub = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(probe() == wantRef, "refreshed PQ index must match the new corpus")
  }
}
