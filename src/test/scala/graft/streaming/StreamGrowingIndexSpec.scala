package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import graft.SparkSpec
import graft.index.IndexManifest
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exactly-once index GROWTH at ingest: every micro-batch both probes
  * and APPENDS to the persisted gram index, with the applied-batch
  * watermark riding in the same atomic manifest publish that grows the
  * index. These cases drive the crash windows end to end — a batch
  * killed AFTER its append committed but BEFORE the streaming
  * checkpoint advanced must replay to the identical index and output,
  * never a double append and never a self-matching probe. */
class StreamGrowingIndexSpec extends SparkSpec {
  import spark.implicits._

  private val L = 10 // gram width: compact fixtures, real span arithmetic

  // P appears in arrival batch 0 (doc 8) and again in batch 1 (doc 18):
  // only a GROWING index flags the second copy. Q appears in the lake
  // (doc 0) and in batch 2 (doc 28). R is unique to doc 18.
  private val P = "0123456789ABCDEFGHIJ"       // 20 chars: 11 grams
  private val Q = "qrstuvwxyzQRSTUVWXYZ"       // 20 chars, lake passage
  private val R = "zZzZzZzZzZ1111122222"       // unique filler

  private def docRows(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private val lake = docRows(
    0L -> s"lake one $Q lake tail padding",
    1L -> "lake two has nothing repeated here at all")
  private val batch0 = docRows(8L -> s"first copy $P arrives early")
  private val batch1 = docRows(18L -> s"second copy $P and also $R")
  private val batch2 = docRows(28L -> s"lake passage $Q re-arrives late")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_grow_$tag").toString

  private def rm(dirs: String*): Unit = dirs.foreach { d =>
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(x => java.nio.file.Files.deleteIfExists(x))
  }

  private def spansOf(df: DataFrame): Seq[(Long, Int, Int)] =
    df.select("doc_id", "span_start", "span_end")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSeq.sorted

  private def gramRows(spark: org.apache.spark.sql.SparkSession, root: String) =
    Dedup.readGramIndexM(spark, root)
      .collect().map(_.toString).sorted.toSeq

  /** The reference: the same batches applied ONCE each through the batch
    * operators — probe against the pre-append index, then append. */
  private def reference(batches: Seq[DataFrame]): (String, Seq[(Long, Int, Int)]) = {
    val root = tmp("ref")
    Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)
    val spans = batches.flatMap { b =>
      val s = spansOf(Dedup.incrementalSpans(
        Dedup.readGramIndexM(spark, root), b, "doc_id", "text", L))
      Dedup.appendGramIndexM(b, "doc_id", "text", L, root)
      s
    }
    (root, spans.sorted)
  }

  test("kill after append, before checkpoint: replay converges, no double append") {
    val root = tmp("idx"); val streamIn = tmp("in")
    val out = tmp("out"); val ckpt = tmp("ckpt")
    val (refRoot, refSpans) = reference(Seq(batch0, batch1, batch2))
    try {
      Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)
      StreamPipeline.writeArrivalBatches(
        batch0.unionByName(batch1).unionByName(batch2), streamIn, 3)
      val crashed = new AtomicBoolean(false)
      def run(failBatch1: Boolean): Unit = {
        val q = spark.readStream
          .schema(StreamPipeline.DocumentsSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamIn)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
            StreamPipeline.spanGrowingBatch(batch.toDF(), batchId, root, out, L)
            // the crash window the co-commit exists for: the append has
            // COMMITTED, the streaming checkpoint has not — the batch
            // WILL replay, and must prove its append already landed
            if (failBatch1 && batchId == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash post-append")
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        run(failBatch1 = true))
      assert(boom.getMessage.contains("injected crash post-append"))
      // the append for batch 1 landed despite the crash...
      assert(IndexManifest.snapshot(spark, root)
        .meta(StreamPipeline.StreamBatchKey) == "1")
      val versionsAfterCrash = IndexManifest.currentVersion(spark, root)
      // ...and the restart replays batch 1 (skipping its append) then
      // processes batch 2
      run(failBatch1 = false)
      val got = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      assert(got == refSpans, s"spans diverged: $got vs $refSpans")
      // exactly v1(build) + one append per batch — the replayed batch 1
      // did NOT double-append
      assert(IndexManifest.currentVersion(spark, root) == versionsAfterCrash + 1)
      assert(IndexManifest.currentVersion(spark, root) == 4L)
      assert(gramRows(spark, root) == gramRows(spark, refRoot),
        "grown index != batch-operator reference")
      // every growth version carries its batch stamp
      for (v <- 2L to 4L)
        assert(IndexManifest.snapshotAt(spark, root, v)
          .meta(StreamPipeline.StreamBatchKey) == (v - 2).toString)
      // and the growth actually mattered: P's re-arrival (doc 18, batch
      // 1) is marked although P is nowhere in the lake
      assert(got.exists(_._1 == 18L), "cross-batch repeat not caught")
      // while batch 0's first copy stays unmarked (keep-first)
      assert(!got.exists(_._1 == 8L), "first copy wrongly marked")
    } finally rm(root, streamIn, out, ckpt, refRoot)
  }

  test("a replayed batch is a no-op: same spans, no new version, no self-match") {
    val root = tmp("idx2"); val out = tmp("out2")
    try {
      Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)
      val v = IndexManifest.currentVersion(spark, root)
      val first = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      // replay of batch 0 AFTER its append committed, completed output
      // in place: the _SUCCESS-guarded short-circuit skips recompute
      // entirely (same output, no new version)
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)
      assert(IndexManifest.currentVersion(spark, root) == v)
      val replayed = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      assert(replayed == first,
        s"replay diverged (self-match?): $replayed vs $first")
      // replay whose own overwrite crashed midway (marker gone): must
      // RECOMPUTE through the walk-back — the probe resolves the
      // PRE-append index, so doc 8's committed grams don't self-match
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-0", "_SUCCESS"))
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)
      assert(IndexManifest.currentVersion(spark, root) == v)
      assert(spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema)) == first,
        "walk-back recompute diverged (self-match?)")
      // sanity: doc 8's text is unmarked on both attempts (nothing in
      // the lake repeats it)
      assert(!replayed.exists(_._1 == 8L))
      // growth still works after the replay: batch 1 sees P
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)
      val after = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      assert(after.exists(_._1 == 18L))
    } finally rm(root, out)
  }

  test("zero micro-batches: the growing query returns an empty typed frame") {
    val out = tmp("out3")
    try {
      val df = StreamPipeline.readBatchDirs(spark, out, StreamPipeline.SpanSchema)
      assert(df.columns.toSeq == Seq("doc_id", "span_start", "span_end"))
      assert(df.count() == 0L)
    } finally rm(out)
  }

  test("delayed replay after compaction + vacuum: the short-circuit survives") {
    val root = tmp("idx3"); val out = tmp("out4")
    try {
      Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)          // v1
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)       // v2
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)       // v3
      val before = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      // nightly maintenance between the append and a (delayed) replay:
      // compaction inherits the stream_batch watermark down the version
      // chain, and vacuum reclaims every pre-compaction version —
      // including v2, the one batch 1's walk-back would resolve
      Dedup.compactGramIndexM(spark, root)                            // v4
      assert(IndexManifest.snapshot(spark, root)
        .meta(StreamPipeline.StreamBatchKey) == "1",
        "compaction must inherit the applied-batch watermark")
      IndexManifest.vacuum(spark, root, keepFrom = 4L, orphanGraceMs = 0L)
      intercept[Exception](IndexManifest.snapshotAt(spark, root, 2L))
      // the replay of batch 1 cannot re-resolve its pre-append index —
      // but it does not need to: output is complete and the watermark
      // proves the append landed, so the short-circuit returns
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)
      assert(spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema)) == before)
      assert(IndexManifest.currentVersion(spark, root) == 4L)
    } finally rm(root, out)
  }

  test("crashed-output replay after vacuum(keepFrom=HEAD): reconstruct, same spans") {
    // The conjunction the short-circuit cannot cover: the replay's own
    // overwrite crashed midway (marker gone → MUST recompute) and
    // maintenance vacuumed the pre-append version its walk-back would
    // resolve. The append's commit co-stamped its segment list, so the
    // pre-append view is reconstructed from HEAD by subtracting exactly
    // those segments — and the recompute is identical to the original.
    val root = tmp("idx4"); val out = tmp("out5")
    val (refRoot, refSpans) = reference(Seq(batch0, batch1))
    try {
      Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)          // v1
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)       // v2
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)       // v3
      // crashed replay: batch 1's output marker is gone...
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      // ...and vacuum reclaimed everything below HEAD, including v2
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      intercept[Exception](IndexManifest.snapshotAt(spark, root, 2L))
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)
      val got = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      assert(got == refSpans, s"reconstructed recompute diverged: $got")
      // P's re-arrival is still caught, batch 1's own grams did NOT
      // self-match (a self-match would mark all of doc 18's text)
      assert(got.exists(_._1 == 18L))
      // no double append, and the index still equals the reference
      assert(IndexManifest.currentVersion(spark, root) == 3L)
      assert(gramRows(spark, root) == gramRows(spark, refRoot))
    } finally rm(root, out, refRoot)
  }

  test("crashed-output replay after compaction destroyed the boundary: fails loud") {
    // If a compaction folded the batch's delta into shared segments
    // BEFORE the crashed-output replay arrives, the pre-append view is
    // genuinely unrecoverable from HEAD — the only wrong move would be
    // probing a view that contains the batch's own rows (silently
    // all-marked output). The replay must fail with the operational fix
    // instead.
    val root = tmp("idx5"); val out = tmp("out6")
    try {
      Dedup.buildGramIndexM(lake, "doc_id", "text", L, root)          // v1
      StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L)       // v2
      Dedup.compactGramIndexM(spark, root)                            // v3
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      val e = intercept[IllegalStateException](
        StreamPipeline.spanGrowingBatch(batch1, 1L, root, out, L))
      assert(e.getMessage.contains("vacuum growing roots only below"),
        s"unexpected message: ${e.getMessage}")
    } finally rm(root, out)
  }

  test("reconstruction that would EMPTY a table fails loud (contractual)") {
    // The table-emptied edge: HEAD carries the batch's own stamp and
    // every stamped segment, but subtracting them leaves a table with
    // ZERO segments. No build+append lifecycle produces that state —
    // every family's build seeds each table with >=1 segment and every
    // append only extends existing tables — so it can only mean the
    // stamped list does not describe a pure append over this root.
    // CONTRACT: reconstructPreBatch throws the loud IllegalStateException
    // at reconstruction time (not a confusing "has no table" later from
    // readAt), telling the operator to rebuild the batch from the lake.
    val head = IndexManifest.Snapshot(
      version = 2L,
      tables = Map("grams" -> Seq("grams/seg-only")),
      meta = Map(IndexManifest.StreamBatchKey -> "1",
        IndexManifest.StreamBatchSegsKey -> "grams/seg-only"),
      explicitKeys = Set(IndexManifest.StreamBatchKey))
    val e = intercept[IllegalStateException](
      StreamPipeline.reconstructPreBatch(head, 1L, "/idx/contract", cause =
        new java.io.FileNotFoundException("pre-batch manifest vacuumed")))
    assert(e.getMessage.contains("zero segments"), e.getMessage)
    assert(e.getMessage.contains("rebuild this batch's output from"), e.getMessage)
    // ...while the same HEAD with a surviving build segment reconstructs
    // to exactly the pre-append view (the table keeps the build segment)
    val ok = head.copy(tables = Map(
      "grams" -> Seq("grams/seg-build", "grams/seg-only")))
    val snap = StreamPipeline.reconstructPreBatch(ok, 1L, "/idx/contract",
      new java.io.FileNotFoundException("x"))
    assert(snap.tables == Map("grams" -> Seq("grams/seg-build")))
  }

  // ---- the LSH family through the SAME growth protocol --------------
  // proves preBatchSnapshot + the batchId-stamped commit are genuinely
  // family-agnostic: a second index family (two tables per version, its
  // own append shape) rides the identical walk-back and skip logic.

  private val SN = 3  // word-shingle width
  private val K = 16; private val B = 4; private val Cap = 10000

  private def sh(df: DataFrame) =
    Dedup.rawShingles(df, "text", "doc_id", SN)

  // near-dup texts: ~12 words, one word swapped between copies
  private val Base = "the quick brown fox jumps over the lazy dog near the riverbank today"
  private val lakeL = docRows(
    0L -> Base,
    1L -> "completely unrelated lake document about databases and storage engines here")
  private val lshB0 = docRows(8L -> Base.replace("quick", "swift"))
  private val lshB1 = docRows(18L -> Base.replace("quick", "swift")) // near-dups 8
  private val lshB2 = docRows(28L -> Base)                           // near-dups 0 (and 8/18)

  private def pairsOf(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select("id_new", "id_base", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

  /** The reference: the same batches applied ONCE each through the
    * batch operators — probe the committed index, then append. */
  private def lshReference(batches: Seq[DataFrame]): Seq[(Long, Long, Double)] = {
    val root = tmp("lref")
    try {
      Dedup.buildLshIndexM(sh(lakeL), "doc_id", K, B, root)
      batches.flatMap { b =>
        val (bands, sigs) = Dedup.readLshIndexM(spark, root)
        val p = pairsOf(Dedup.indexedCrossCorpusPairs(
          bands, sigs, sh(b), "doc_id", K, B, Cap, staleCounts = true))
        Dedup.appendLshIndexM(sh(b), "doc_id", K, B, root)
        p
      }.sorted
    } finally rm(root)
  }

  test("LSH growth: kill after append, before checkpoint — replay converges") {
    val root = tmp("lidx"); val streamIn = tmp("lin")
    val out = tmp("lout"); val ckpt = tmp("lckpt")
    val refPairs = lshReference(Seq(lshB0, lshB1, lshB2))
    try {
      Dedup.buildLshIndexM(sh(lakeL), "doc_id", K, B, root)
      StreamPipeline.writeArrivalBatches(
        lshB0.unionByName(lshB1).unionByName(lshB2), streamIn, 3)
      val crashed = new AtomicBoolean(false)
      def run(failBatch1: Boolean): Unit = {
        val q = spark.readStream
          .schema(StreamPipeline.DocumentsSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamIn)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
            StreamPipeline.lshGrowingBatch(
              batch.toDF(), batchId, root, out, SN, K, B, Cap)
            if (failBatch1 && batchId == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash post-append")
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        run(failBatch1 = true))
      assert(boom.getMessage.contains("injected crash post-append"))
      // batch 1's append landed despite the crash...
      assert(IndexManifest.snapshot(spark, root)
        .meta(StreamPipeline.StreamBatchKey) == "1")
      // ...and the restart replays batch 1 (skipping its append)
      run(failBatch1 = false)
      val got = pairsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PairSchema))
      assert(got == refPairs, s"pairs diverged: $got vs $refPairs")
      // exactly v1(build) + one append per batch — no double append
      assert(IndexManifest.currentVersion(spark, root) == 4L)
      // the growth mattered: 18 (batch 1) pairs with 8 (batch 0) though
      // 8 is nowhere in the lake — a frozen index cannot produce this
      assert(got.exists(p => p._1 == 18L && p._2 == 8L),
        "cross-batch near-dup not caught")
      // and no batch ever pairs with itself or with a LATER batch
      assert(!got.exists(p => p._1 == p._2))
      assert(!got.exists(p => p._1 == 8L && p._2 == 18L),
        "batch 0 paired against a later arrival")
    } finally rm(root, streamIn, out, ckpt)
  }

  test("LSH growth: a replayed batch is a no-op — no self-match, no new version") {
    val root = tmp("lidx2"); val out = tmp("lout2")
    try {
      Dedup.buildLshIndexM(sh(lakeL), "doc_id", K, B, root)
      StreamPipeline.lshGrowingBatch(lshB0, 0L, root, out, SN, K, B, Cap)
      val v = IndexManifest.currentVersion(spark, root)
      val first = pairsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PairSchema))
      // replay AFTER the append committed, marker present → the
      // short-circuit skips recompute; marker deleted → the recompute
      // must resolve the PRE-append index (doc 8's signatures are
      // committed now; without the walk-back the replay would emit the
      // self-pair (8,8))
      StreamPipeline.lshGrowingBatch(lshB0, 0L, root, out, SN, K, B, Cap)
      assert(IndexManifest.currentVersion(spark, root) == v)
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-0", "_SUCCESS"))
      StreamPipeline.lshGrowingBatch(lshB0, 0L, root, out, SN, K, B, Cap)
      assert(IndexManifest.currentVersion(spark, root) == v)
      val replayed = pairsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PairSchema))
      assert(replayed == first,
        s"replay diverged (self-match?): $replayed vs $first")
      assert(!replayed.exists(p => p._1 == p._2))
      // growth still works after the replay: batch 1 sees batch 0
      StreamPipeline.lshGrowingBatch(lshB1, 1L, root, out, SN, K, B, Cap)
      val after = pairsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PairSchema))
      assert(after.exists(p => p._1 == 18L && p._2 == 8L))
    } finally rm(root, out)
  }

  test("LSH growth: crashed-output replay after vacuum reconstructs exactly") {
    // the two-tables-per-append edition of the reconstruction case: the
    // batch's append added a sigs segment AND a bands segment; the
    // subtraction must remove both or the replayed probe would pair doc
    // 8 with its own committed signatures (the (8,8) self-pair)
    val root = tmp("lidx3"); val out = tmp("lout3")
    val refPairs = lshReference(Seq(lshB0, lshB1))
    try {
      Dedup.buildLshIndexM(sh(lakeL), "doc_id", K, B, root)           // v1
      StreamPipeline.lshGrowingBatch(lshB0, 0L, root, out, SN, K, B, Cap) // v2
      StreamPipeline.lshGrowingBatch(lshB1, 1L, root, out, SN, K, B, Cap) // v3
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      intercept[Exception](IndexManifest.snapshotAt(spark, root, 2L))
      StreamPipeline.lshGrowingBatch(lshB1, 1L, root, out, SN, K, B, Cap)
      val got = pairsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PairSchema))
      assert(got == refPairs, s"reconstructed recompute diverged: $got")
      assert(got.exists(p => p._1 == 18L && p._2 == 8L),
        "cross-batch near-dup lost in reconstruction")
      assert(!got.exists(p => p._1 == p._2), "self-pair: subtraction missed a table")
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(root, out)
  }

  test("semantic growth: cross-batch pairs, replay no-op, vacuumed walk-back reconstructs") {
    // the hash-embed family through the same protocol (sixth growing
    // family): doc 18 (batch 1) re-embeds batch 0's text, so only a
    // GROWING embed table can pair them — and the vacuumed-walk-back
    // reconstruction must keep that exact pair set
    val root = tmp("midx"); val out = tmp("mout")
    def pairs() = StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SemGrowSchema)
      .select("doc_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    try {
      StreamPipeline.buildSemanticIndexDfM(lakeL, "doc_id", "text", root) // v1
      StreamPipeline.semGrowingBatch(lshB0, 0L, root, out)                // v2
      StreamPipeline.semGrowingBatch(lshB1, 1L, root, out)                // v3
      val first = pairs()
      // growth mattered: 18 pairs with 8 (same text, one batch earlier)
      assert(first.contains((18L, 8L)), s"cross-batch semantic dup missed: $first")
      // never itself, never a later arrival
      assert(!first.exists(p => p._1 == p._2))
      assert(!first.contains((8L, 18L)))
      // completed replay short-circuits: same output, no new version
      StreamPipeline.semGrowingBatch(lshB1, 1L, root, out)
      assert(IndexManifest.currentVersion(spark, root) == 3L)
      assert(pairs() == first)
      // crashed-output replay after vacuum: segment-subtraction
      // reconstruction, identical pairs, no double append
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      StreamPipeline.semGrowingBatch(lshB1, 1L, root, out)
      assert(pairs() == first, "reconstructed semantic recompute diverged")
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(root, out)
  }

  // ---- BM25 reconstruction: the richest subtraction case ------------
  // the scoring PARAMETERS (per-term df, corpus N/avgdl) live in their
  // own tables and grew with the batch's append — removing the batch's
  // postings but keeping its stats segments would shift every idf/avgdl
  // and produce subtly-wrong scores, so exact score equality against
  // the batch-operator reference proves the stats reconstruct too.

  private val bmLake = docRows(
    0L -> "alpha beta gamma delta shared tokens in the lake corpus",
    1L -> "epsilon zeta eta unrelated lake words entirely")
  private val bmB0 = docRows(8L -> "alpha beta shared tokens arriving early")
  private val bmB1 = docRows(18L -> "alpha beta gamma shared tokens again later")

  private def negsOf(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select("query_id", "doc_id", "score", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6, r.getInt(3)))
      .toSeq.sorted

  test("BM25 growth: crashed-output replay after vacuum reconstructs stats exactly") {
    import graft.operators.Retrieval
    val NegK = 3
    val refRoot = tmp("bref")
    val root = tmp("bidx"); val out = tmp("bout")
    try {
      Retrieval.buildIndexM(bmLake, "doc_id", "text", refRoot)
      val refNegs = Seq(bmB0, bmB1).flatMap { b =>
        val snap = IndexManifest.snapshot(spark, refRoot)
        val n = negsOf(Retrieval.hardNegativesAtM(
          b, "doc_id", "text", NegK, refRoot, snap))
        Retrieval.appendIndexM(b, "doc_id", "text", refRoot)
        n
      }.sorted
      Retrieval.buildIndexM(bmLake, "doc_id", "text", root)           // v1
      StreamPipeline.bm25GrowingBatch(bmB0, 0L, root, out, NegK)      // v2
      StreamPipeline.bm25GrowingBatch(bmB1, 1L, root, out, NegK)      // v3
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      StreamPipeline.bm25GrowingBatch(bmB1, 1L, root, out, NegK)
      val got = negsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.Bm25GrowSchema))
      assert(got == refNegs,
        s"reconstructed scores diverged (stats not subtracted?): $got vs $refNegs")
      // growth still visible: 18's negatives include 8 (arrived earlier)
      assert(got.exists(t => t._1 == 18L && t._2 == 8L))
      // and never itself or a later arrival
      assert(!got.exists(t => t._1 == t._2))
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(refRoot, root, out)
  }

  // ---- the PHRASE family through the SAME growth protocol -----------
  // ninth family: the screen READS the walked-back snapshot (its output
  // is the accumulated-corpus cut as of the batch), so a DELAYED replay
  // — discovered only after later batches appended and vacuum destroyed
  // the pre-append versions — must reconstruct the exact cut by
  // stamped-segment subtraction: probing HEAD instead would leak later
  // arrivals into an earlier batch's screen.

  private val PhQ = Seq(0 -> "magic spell", 1 -> "dark ritual")
  private val phLake = docRows(
    0L -> "the magic spell opens the gate",
    1L -> "plain lake text with no banned content here")
  private val phB0 = docRows(8L -> "magic spell magic spell twice over")
  private val phB1 = docRows(18L -> "a dark ritual at midnight no magic")
  private val phB2 = docRows(28L -> "another magic spell arrives late")

  private def hitsOf(df: DataFrame): Seq[(Long, Int, Long, Long)] =
    df.select("as_of_batch", "query_id", "doc_id", "n_occ")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("phrase growth: crashed-output replay after vacuum reconstructs; delayed replay fails loud") {
    import graft.operators.Retrieval
    val refRoot = tmp("phref"); val root = tmp("phidx"); val out = tmp("phout")
    try {
      // reference: the batches applied once each through the operators
      Retrieval.buildPosIndexM(phLake, "doc_id", "text", refRoot)
      val ref = Seq(phB0, phB1, phB2).zipWithIndex.flatMap { case (b, i) =>
        val snap = IndexManifest.snapshot(spark, refRoot)
        val rows = hitsOf(Retrieval
          .phraseScreenGrownM(b, "doc_id", "text", PhQ, refRoot, snap)
          .select(lit(i.toLong).as("as_of_batch"), col("query_id"),
            col("doc_id"), col("n_occ")))
        Retrieval.appendPosIndexM(b, "doc_id", "text", refRoot)
        rows
      }.sorted
      Retrieval.buildPosIndexM(phLake, "doc_id", "text", root)       // v1
      StreamPipeline.phraseGrowingBatch(phB0, 0L, root, out, PhQ)    // v2
      StreamPipeline.phraseGrowingBatch(phB1, 1L, root, out, PhQ)    // v3
      StreamPipeline.phraseGrowingBatch(phB2, 2L, root, out, PhQ)    // v4
      // crash window: the LAST batch's output lost after its append
      // committed, and vacuum reclaimed every pre-append version — the
      // replay reconstructs the v3 view from HEAD by stamped-segment
      // subtraction and recomputes the identical screen
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-2", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 4L, orphanGraceMs = 0L)
      StreamPipeline.phraseGrowingBatch(phB2, 2L, root, out, PhQ)
      val got = hitsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PhraseGrowSchema))
      assert(got == ref, s"reconstructed screen diverged: $got vs $ref")
      // each batch's cut is exact: the late arrival (28) is visible
      // only from its own batch on; batch 0's arrival (8) is in every
      // later cut — the growth the frozen screen cannot express
      assert(!got.exists(t => t._1 < 2L && t._3 == 28L))
      assert(got.exists(t => t._1 == 2L && t._3 == 28L))
      assert(Seq(0L, 1L, 2L).forall(b => got.exists(t => t._1 == b && t._3 == 8L)))
      // no double append: replay committed nothing new
      assert(IndexManifest.currentVersion(spark, root) == 4L)
      // DELAYED replay (an earlier batch, after later appends + vacuum)
      // is contractually fail-loud for every family: HEAD cannot stand
      // in for a cut two appends back, and a HEAD-based screen would
      // silently leak doc 28 into batch 1's output
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      val e = intercept[IllegalStateException] {
        StreamPipeline.phraseGrowingBatch(phB1, 1L, root, out, PhQ)
      }
      assert(e.getMessage.contains("cannot stand in for it"))
    } finally rm(refRoot, root, out)
  }

  test("phrase growth: a replayed batch is a no-op — same screen, no new version") {
    import graft.operators.Retrieval
    val root = tmp("phidx2"); val out = tmp("phout2")
    try {
      Retrieval.buildPosIndexM(phLake, "doc_id", "text", root)       // v1
      StreamPipeline.phraseGrowingBatch(phB0, 0L, root, out, PhQ)    // v2
      StreamPipeline.phraseGrowingBatch(phB1, 1L, root, out, PhQ)    // v3
      val before = hitsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PhraseGrowSchema))
      StreamPipeline.phraseGrowingBatch(phB1, 1L, root, out, PhQ)
      val after = hitsOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PhraseGrowSchema))
      assert(after == before)
      assert(IndexManifest.currentVersion(spark, root) == 3L)
      // the grown index serves: a probe at HEAD ranks the full
      // accumulated corpus — the "no nightly rebuild" property
      val served = Retrieval.phraseProbeM(spark, root, PhQ, 10)
        .select("query_id", "doc_id", "n_occ").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val inline = Retrieval.phraseTopK(
          phLake.unionByName(phB0).unionByName(phB1),
          "doc_id", "text", PhQ, 10)
        .select("query_id", "doc_id", "n_occ").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(served == inline && served.nonEmpty)
    } finally rm(root, out)
  }

  // ---- the PQ family through the SAME growth protocol ---------------
  // third index family on the shared walk-back + batchId-stamped commit:
  // two tables per version where one (the codebook) must stay pinned to
  // the codes it encoded — the snapshot resolves both together.

  private val M = 4; private val Dsub = 4; private val TopK = 2

  private def vecRows(rows: (Long, Seq[Float])*): DataFrame =
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")

  // 16-dim vectors; ADC ranks by INNER PRODUCT, so the top neighbor of
  // a positive query is the largest-magnitude positive vector seen so
  // far: 8 (the biggest, batch 0) is what 18 (batch 1) must retrieve
  private def vec(seed: Float): Seq[Float] =
    (0 until 16).map(i => seed + i * 0.01f)
  private val pqLake = vecRows(
    0L -> vec(1.0f), 1L -> vec(-3.0f), 2L -> vec(7.0f), 3L -> vec(-8.0f))
  private val pqB0 = vecRows(8L -> vec(9.0f))
  private val pqB1 = vecRows(18L -> vec(9.02f)) // top-IP neighbor is 8
  private val pqB2 = vecRows(28L -> vec(1.05f))

  private def topkOf(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("IVF growth: crashed-output replay after vacuum reconstructs via snapshot probe") {
    // the reconstruction path that flows through the snapshot-keyed
    // probe entry (ivfProbeSnapM): a reconstructed pre-append view has
    // no committed version number, so a version-keyed probe could not
    // express it — this case proves the whole flow end to end
    val root = tmp("iidx"); val out = tmp("iout")
    val all = pqLake.unionByName(pqB0).unionByName(pqB1)
    def topk() = StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.IvfGrowSchema)
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    try {
      graft.operators.Similarity.buildIvfIndexM(
        pqLake, all.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", root)                                  // v1
      StreamPipeline.ivfGrowingBatch(pqB0, 0L, root, out, TopK, 2)    // v2
      StreamPipeline.ivfGrowingBatch(pqB1, 1L, root, out, TopK, 2)    // v3
      val first = topk()
      // growth mattered: 18's neighbors include 8 (one batch earlier)
      assert(first.exists(t => t._1 == 18L && t._2 == 8L),
        s"cross-batch neighbor missed: $first")
      assert(!first.exists(t => t._1 == t._2))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      StreamPipeline.ivfGrowingBatch(pqB1, 1L, root, out, TopK, 2)
      assert(topk() == first, "reconstructed IVF recompute diverged")
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(root, out)
  }

  test("IVF-PQ growth: cross-batch retrieval, replay no-op, vacuumed walk-back reconstructs") {
    // the compressed growing family (FAISS IVFx,PQm) on the shared
    // protocol: probe flows through the snapshot-keyed ADC entry
    // (ivfPqProbeSnapM) so a reconstructed pre-append view — which has
    // no committed version number — drives the same search exactly
    val root = tmp("ipqidx"); val out = tmp("ipqout")
    val all = pqLake.unionByName(pqB0).unionByName(pqB1)
    def topk() = StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.IvfPqGrowSchema)
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    try {
      val cen = all.filter(col("vec_id") % 2 === 0)
      val cb = graft.operators.Similarity.pqCodebook(
        all, "vec_id", "embedding", M, Dsub)
      graft.operators.Similarity.buildIvfPqIndexM(
        pqLake, cen, cb, "vec_id", "embedding", M, Dsub, root)            // v1
      StreamPipeline.ivfPqGrowingBatch(pqB0, 0L, root, out, TopK, M, Dsub, 2) // v2
      StreamPipeline.ivfPqGrowingBatch(pqB1, 1L, root, out, TopK, M, Dsub, 2) // v3
      val first = topk()
      // growth mattered: 18's ADC neighbors include 8 (one batch earlier,
      // nowhere in the lake)
      assert(first.exists(t => t._1 == 18L && t._2 == 8L),
        s"cross-batch neighbor missed: $first")
      assert(!first.exists(t => t._1 == t._2))
      // a committed replay with intact output is a pure no-op
      StreamPipeline.ivfPqGrowingBatch(pqB1, 1L, root, out, TopK, M, Dsub, 2)
      assert(topk() == first)
      assert(IndexManifest.currentVersion(spark, root) == 3L)
      // crashed output + vacuumed pre-append version: reconstruct from
      // HEAD by segment subtraction, recompute identically
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      intercept[Exception](IndexManifest.snapshotAt(spark, root, 2L))
      StreamPipeline.ivfPqGrowingBatch(pqB1, 1L, root, out, TopK, M, Dsub, 2)
      assert(topk() == first, "reconstructed IVF-PQ recompute diverged")
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(root, out)
  }

  test("JL growth: cross-batch retrieval, replay no-op, vacuumed walk-back reconstructs") {
    // the TRAINING-FREE growing family: no codebook/centroid state at
    // all — (m, d) in the manifest meta regenerate the sign matrix for
    // every batch, replay, and reconstruction, so the walk-back probe
    // is bit-identical by construction (the snapshot only has to
    // restore the SEGMENT VIEW, never any trained state)
    val root = tmp("jlidx"); val out = tmp("jlout")
    val all = pqLake.unionByName(pqB0).unionByName(pqB1)
    def topk() = StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.JlGrowSchema)
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    try {
      graft.operators.Similarity.buildJlIndexM(
        pqLake, "vec_id", "embedding", m = 8, d = 16, root)                // v1
      StreamPipeline.jlGrowingBatch(pqB0, 0L, root, out, all, TopK, 2)     // v2
      StreamPipeline.jlGrowingBatch(pqB1, 1L, root, out, all, TopK, 2)     // v3
      val first = topk()
      // growth mattered: 18's exact-rerank neighbors include 8 (one
      // batch earlier, nowhere in the lake)
      assert(first.exists(t => t._1 == 18L && t._2 == 8L),
        s"cross-batch neighbor missed: $first")
      assert(!first.exists(t => t._1 == t._2))
      // a committed replay with intact output is a pure no-op
      StreamPipeline.jlGrowingBatch(pqB1, 1L, root, out, all, TopK, 2)
      assert(topk() == first)
      assert(IndexManifest.currentVersion(spark, root) == 3L)
      // crashed output + vacuumed pre-append version: reconstruct from
      // HEAD by segment subtraction, recompute identically
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/batch-1", "_SUCCESS"))
      IndexManifest.vacuum(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
      intercept[Exception](IndexManifest.snapshotAt(spark, root, 2L))
      StreamPipeline.jlGrowingBatch(pqB1, 1L, root, out, all, TopK, 2)
      assert(topk() == first, "reconstructed JL recompute diverged")
      assert(IndexManifest.currentVersion(spark, root) == 3L)
    } finally rm(root, out)
  }

  test("PQ growth: kill after append, before checkpoint — replay converges") {
    val root = tmp("pidx"); val streamIn = tmp("pin")
    val out = tmp("pout"); val ckpt = tmp("pckpt")
    // codebook sample fixed at build time — lake + arrival vectors so
    // every subspace has spread-out codewords
    val all = pqLake.unionByName(pqB0).unionByName(pqB1).unionByName(pqB2)
    val cb = graft.operators.Similarity.pqCodebook(
      all, "vec_id", "embedding", M, Dsub)
    // reference: the same batches once each through the batch operators
    val refRoot = tmp("pref")
    graft.operators.Similarity.buildPqIndexM(
      pqLake, cb, "vec_id", "embedding", M, Dsub, refRoot)
    val refTopk = Seq(pqB0, pqB1, pqB2).flatMap { b =>
      val snap = IndexManifest.snapshot(spark, refRoot)
      val (codes, cbS) =
        graft.operators.Similarity.readPqIndexAt(spark, refRoot, snap)
      val t = topkOf(graft.operators.Similarity.pqSearchEncoded(
        b, codes, cbS, "vec_id", "embedding", TopK, M, Dsub)
        .withColumnRenamed("rank", "rnk"))
      graft.operators.Similarity.appendPqIndexM(
        b, "vec_id", "embedding", M, Dsub, refRoot)
      t
    }.sorted
    try {
      graft.operators.Similarity.buildPqIndexM(
        pqLake, cb, "vec_id", "embedding", M, Dsub, root)
      StreamPipeline.writeArrivalBatches(
        pqB0.unionByName(pqB1).unionByName(pqB2), streamIn, 3,
        idCol = "vec_id")
      val crashed = new AtomicBoolean(false)
      def run(failBatch1: Boolean): Unit = {
        val q = spark.readStream
          .schema(StreamPipeline.EmbeddingsSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamIn)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
            StreamPipeline.pqGrowingBatch(
              batch.toDF(), batchId, root, out, TopK, M, Dsub)
            if (failBatch1 && batchId == 1L && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash post-append")
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        run(failBatch1 = true))
      assert(boom.getMessage.contains("injected crash post-append"))
      assert(IndexManifest.snapshot(spark, root)
        .meta(StreamPipeline.StreamBatchKey) == "1")
      run(failBatch1 = false)
      val got = topkOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.PqGrowSchema))
      assert(got == refTopk, s"topk diverged: $got vs $refTopk")
      assert(IndexManifest.currentVersion(spark, root) == 4L)
      // growth mattered: 18's nearest neighbor is 8, which arrived one
      // batch earlier and is nowhere in the lake
      assert(got.exists(t => t._1 == 18L && t._2 == 8L && t._3 == 1),
        "cross-batch nearest neighbor not caught")
      // no query ever retrieves itself or a later arrival
      assert(!got.exists(t => t._1 == t._2))
      assert(!got.exists(t => t._1 == 8L && t._2 == 18L))
    } finally rm(root, streamIn, out, ckpt, refRoot)
  }
}
