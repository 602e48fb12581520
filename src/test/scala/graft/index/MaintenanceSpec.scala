package graft.index

import graft.SparkSpec
import graft.operators.{Dedup, Retrieval, Similarity}
import org.apache.spark.sql.functions._

/** The family-agnostic maintenance pass: family sniffing from manifest
  * table names, dispatched compaction folding appended segments to one,
  * vacuum reclaiming superseded versions — and the probe answering the
  * same before and after. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    new java.io.File(
      java.lang.System.getProperty("java.io.tmpdir"),
      s"graft_maint_${tag}_${java.util.UUID.randomUUID().toString.take(8)}").toString

  private def docs(ids: Range) = ids.map(i =>
    (i.toLong, s"alpha beta w$i gamma delta text tail")).toDF("doc_id", "text")
  private def emb(ids: Range) = ids.map(i =>
    (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat)))
    .toDF("vec_id", "embedding")

  test("maintain: sniffs each family, compacts to one segment, vacuums, probe unchanged") {
    // BM25: build + append → 2 postings segments
    val bm25 = freshRoot("bm25")
    Retrieval.buildIndexM(docs(0 until 10), "doc_id", "text", bm25)
    Retrieval.appendIndexM(docs(10 until 20), "doc_id", "text", bm25)
    val bmBefore = Retrieval.bm25ProbeM(spark, bm25, Seq((1, "alpha w3")), 3)
      .collect().map(_.toString).sorted.toSeq
    assert(Maintenance.familyOf(spark, bm25) == "bm25")

    // IVF: build + append → 2 assigned segments
    val ivf = freshRoot("ivf")
    Similarity.buildIvfIndexM(emb(0 until 10), emb(0 until 3),
      "vec_id", "embedding", ivf)
    Similarity.appendIvfIndexM(emb(0 until 15), "vec_id", "embedding", ivf)
    val ivfBefore = Similarity.ivfProbeM(emb(0 until 2), "vec_id", "embedding",
      3, 2, ivf).collect().map(_.toString).sorted.toSeq
    assert(Maintenance.familyOf(spark, ivf) == "ivf")

    // gram log: build + append
    val gram = freshRoot("gram")
    Dedup.buildGramIndexM(docs(0 until 10), "doc_id", "text", 10, gram)
    Dedup.appendGramIndexM(docs(10 until 15), "doc_id", "text", 10, gram)
    assert(Maintenance.familyOf(spark, gram) == "gram")

    for (root <- Seq(bm25, ivf, gram)) {
      val report = Maintenance.maintain(spark, root, orphanGraceMs = 0L)
      assert(report.contains("compacted to v"), report)
      val snap = IndexManifest.snapshot(spark, root)
      snap.tables.foreach { case (t, segs) =>
        assert(segs.size == 1, s"$root table $t not folded: $segs")
      }
    }
    assert(Retrieval.bm25ProbeM(spark, bm25, Seq((1, "alpha w3")), 3)
      .collect().map(_.toString).sorted.toSeq == bmBefore)
    assert(Similarity.ivfProbeM(emb(0 until 2), "vec_id", "embedding", 3, 2, ivf)
      .collect().map(_.toString).sorted.toSeq == ivfBefore)
    // the DEFAULT pass retains a rolling keepLast=3 window (build v1,
    // append v2, compacted head v3 all still resolvable) — a probe
    // pinned below HEAD keeps working with no per-run flag, closing the
    // "nightly ops entry point silently destroys its own time-travel
    // contract" failure mode
    assert(IndexManifest.describe(spark, bm25)
      .select("version").distinct().count() == 3)
    assert(Retrieval.bm25ProbeM(spark, bm25, Seq((1, "alpha w3")), 3,
      at = Some(2L)).collect().nonEmpty)
    // an explicit keepFrom still reclaims everything below it (clamped
    // to head), and the report names the reclaimed versions
    val report = Maintenance.maintain(
      spark, bm25, keepFrom = Long.MaxValue, orphanGraceMs = 0L)
    assert(report.contains("reclaimed versions"), report)
    assert(IndexManifest.describe(spark, bm25)
      .select("version").distinct().count() == 1)
  }

  test("family metadata beats table-name sniffing for custom-named tables") {
    // a manifest whose table name would sniff as LSH ("*sigs*") but whose
    // builder stamped family=semantic: the metadata key is authoritative
    val root = freshRoot("meta")
    val seg = IndexManifest.newSegment("user_sigs")
    emb(0 until 2).write.parquet(s"$root/$seg")
    IndexManifest.commit(spark, root, Map("user_sigs" -> Seq(seg)),
      meta = Map("family" -> "semantic"))
    assert(Maintenance.familyOf(spark, root) == "semantic")
    // ... and the stamp survives a metadata-less follow-up commit
    // (append/compact lifecycles inherit it)
    val seg2 = IndexManifest.newSegment("user_sigs")
    emb(2 until 4).write.parquet(s"$root/$seg2")
    IndexManifest.commit(spark, root, Map("user_sigs" -> Seq(seg, seg2)),
      expect = Some(1L))
    assert(IndexManifest.snapshot(spark, root).meta == Map("family" -> "semantic"))
    assert(Maintenance.familyOf(spark, root) == "semantic")
    // a pre-metadata manifest (no family key) still falls back to sniffing
    val legacy = freshRoot("legacy")
    val lseg = IndexManifest.newSegment("grams")
    emb(0 until 2).write.parquet(s"$legacy/$lseg")
    IndexManifest.commit(spark, legacy, Map("grams" -> Seq(lseg)))
    assert(Maintenance.familyOf(spark, legacy) == "gram")
  }

  test("familyOf distinguishes PQ, IVF-PQ, and LSH; unknown family is skipped") {
    val pq = freshRoot("pq")
    val cb = Similarity.pqCodebook(emb(0 until 4), "vec_id", "embedding", 2, 4)
    Similarity.buildPqIndexM(emb(0 until 10), cb, "vec_id", "embedding", 2, 4, pq)
    assert(Maintenance.familyOf(spark, pq) == "pq")

    val ivfpq = freshRoot("ivfpq")
    Similarity.buildIvfPqIndexM(emb(0 until 10), emb(0 until 3), cb,
      "vec_id", "embedding", 2, 4, ivfpq)
    assert(Maintenance.familyOf(spark, ivfpq) == "ivfpq")

    val lsh = freshRoot("lsh")
    Dedup.buildLshIndexDigestedM(docs(0 until 10), "text", "doc_id", 3, 8, 4, lsh)
    assert(Maintenance.familyOf(spark, lsh) == "lsh")

    // semantic (single-table) family: build + append → 2 segments,
    // the generic one-table re-layout folds them, rows identical
    val sem = freshRoot("sem")
    graft.streaming.StreamPipeline.buildSemanticIndexM(spark, Sf0001, sem)
    graft.streaming.StreamPipeline.appendSemanticIndexM(
      docs(1000 until 1010), "doc_id", "text", sem)
    assert(Maintenance.familyOf(spark, sem) == "semantic")
    val semBefore = graft.streaming.StreamPipeline.readSemanticIndexM(spark, sem)
      .collect().map(_.toString).sorted.toSeq
    assert(Maintenance.maintain(spark, sem, orphanGraceMs = 0L).contains("compacted"))
    assert(IndexManifest.snapshot(spark, sem).tables("embeds").size == 1)
    assert(graft.streaming.StreamPipeline.readSemanticIndexM(spark, sem)
      .collect().map(_.toString).sorted.toSeq == semBefore)

    // a committed manifest with a foreign table name: reported, skipped
    val alien = freshRoot("alien")
    val seg = IndexManifest.newSegment("mystery")
    emb(0 until 2).write.parquet(s"$alien/$seg")
    IndexManifest.commit(spark, alien, Map("mystery" -> Seq(seg)))
    assert(Maintenance.familyOf(spark, alien) == "unknown")
    assert(Maintenance.maintain(spark, alien).contains("SKIPPED"))
  }

  test("maintain caps its default boundary at a growing stream's pre-append version") {
    import graft.streaming.StreamPipeline
    // A live growing stream's last batch may still replay-and-recompute,
    // which resolves the version just below its own append. An
    // aggressive default retention (keepLast = 1) must still keep that
    // version — so the replay runs the ORDINARY walk-back, never the
    // segment-subtraction reconstruction, across a nightly pass.
    val X = "0123456789ABCDEFGHIJ"
    val lake = Seq((0L, s"lake holds $X as boilerplate")).toDF("doc_id", "text")
    val b0 = Seq((8L, s"first copy $X arrives")).toDF("doc_id", "text")
    val b1 = Seq((18L, s"second copy $X again")).toDF("doc_id", "text")
    val root = freshRoot("grow"); val out = freshRoot("growout")
    Dedup.buildGramIndexM(lake, "doc_id", "text", 10, root)         // v1
    StreamPipeline.spanGrowingBatch(b0, 0L, root, out, 10)          // v2
    StreamPipeline.spanGrowingBatch(b1, 1L, root, out, 10)          // v3
    def outRows() = spark.read.parquet(s"$out/batch-0", s"$out/batch-1")
      .collect().map(_.toString).sorted.toSeq
    val before = outRows()
    val report =
      Maintenance.maintain(spark, root, orphanGraceMs = 0L, keepLast = 1)
    assert(report.contains("compacted to v4"), report)
    // keepLast=1 alone would retain only v4; the growing cap keeps the
    // last batch's pre-append version v2 (and hence v3) resolvable
    assert(IndexManifest.snapshotAt(spark, root, 2L).tables.contains("grams"))
    intercept[java.io.FileNotFoundException](
      IndexManifest.snapshotAt(spark, root, 1L))
    // crashed-output replay of the last batch now recomputes through
    // the ordinary walk-back (v2 is there), identical output, no growth
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
    StreamPipeline.spanGrowingBatch(b1, 1L, root, out, 10)
    val after = outRows()
    assert(after == before, s"replay diverged after maintenance: $after")
    assert(IndexManifest.currentVersion(spark, root) == 4L)
    // the GROWING root's boundary is its last batch's pre-append version
    assert(Maintenance.growingSafeBoundary(spark, root).contains(2L))
    // a NON-growing root (no stream watermark anywhere in its version
    // chain) reports no boundary, so the default retention applies
    // unmodified: keepLast=1 really does reclaim everything below HEAD
    val plain = freshRoot("plain")
    Dedup.buildGramIndexM(lake, "doc_id", "text", 10, plain)           // v1
    Dedup.appendGramIndexM(b0, "doc_id", "text", 10, plain)            // v2
    assert(Maintenance.growingSafeBoundary(spark, plain).isEmpty,
      "a watermark-free root must not report a growing boundary")
    Maintenance.maintain(spark, plain, orphanGraceMs = 0L, keepLast = 1)
    val head = IndexManifest.currentVersion(spark, plain)
    assert(IndexManifest.snapshotAt(spark, plain, head).tables.contains("grams"))
    intercept[java.io.FileNotFoundException](
      IndexManifest.snapshotAt(spark, plain, 1L))
  }
}
