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
      // replay of batch 0 AFTER its append committed: the probe must
      // resolve the PRE-append index (no self-matching — doc 8's grams
      // are in the index now), the output overwrite must be byte-stable,
      // and no new version may land
      StreamPipeline.spanGrowingBatch(batch0, 0L, root, out, L)
      assert(IndexManifest.currentVersion(spark, root) == v)
      val replayed = spansOf(StreamPipeline.readBatchDirs(
        spark, out, StreamPipeline.SpanSchema))
      assert(replayed == first,
        s"replay diverged (self-match?): $replayed vs $first")
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
      // replay AFTER the append committed: the probe must resolve the
      // PRE-append index — doc 8's signatures are committed now, and
      // without the walk-back the replay would emit the self-pair (8,8)
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
}
