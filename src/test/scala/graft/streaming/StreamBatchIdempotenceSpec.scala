package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The restart-with-replay contract of the streaming file sinks
  * (ExactlyOnceSpec precedent, file-sink edition): round 12's
  * `foreachBatch` pattern wrote `mode("append")` into one flat directory
  * and ignored the batchId, so a micro-batch that failed after a partial
  * write and replayed on restart duplicated its rows in the output.
  * [[StreamPipeline.writeBatchIdempotent]] keys each batch to its own
  * overwritten subdirectory instead; these cases drive the exact
  * crash-window shapes.
  */
class StreamBatchIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_idem").toString

  private val IdVSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  private def rm(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("a replayed batch replaces its partial write — no duplicate rows") {
    val out = tmp()
    try {
      val full = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      // crash window: batch 0 persisted only a prefix before dying...
      StreamPipeline.writeBatchIdempotent(full.filter($"id" <= 1), out, 0L)
      // ...the restart replays batch 0 in full, then batch 1 runs
      StreamPipeline.writeBatchIdempotent(full, out, 0L)
      StreamPipeline.writeBatchIdempotent(
        Seq((10L, "z")).toDF("id", "v"), out, 1L)
      val got = StreamPipeline.readBatchDirs(spark, out, IdVSchema)
        .as[(Long, String)].collect().sorted
      assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "z")))
    } finally rm(out)
  }

  test("a batch replayed twice is byte-stable (overwrite, not append)") {
    val out = tmp()
    try {
      val b = Seq((7L, "x"), (8L, "y")).toDF("id", "v")
      StreamPipeline.writeBatchIdempotent(b, out, 5L)
      StreamPipeline.writeBatchIdempotent(b, out, 5L)
      StreamPipeline.writeBatchIdempotent(b, out, 5L)
      assert(StreamPipeline.readBatchDirs(spark, out, IdVSchema).count() == 2L)
    } finally rm(out)
  }

  test("batch dirs do not leak a phantom partition column into the schema") {
    val out = tmp()
    try {
      StreamPipeline.writeBatchIdempotent(
        Seq((1L, "a")).toDF("id", "v"), out, 0L)
      StreamPipeline.writeBatchIdempotent(
        Seq((2L, "b")).toDF("id", "v"), out, 1L)
      val df = StreamPipeline.readBatchDirs(spark, out, IdVSchema)
      assert(df.columns.toSeq == Seq("id", "v"))
      assert(df.count() == 2L)
    } finally rm(out)
  }

  test("an empty replayed batch erases its own stale partial output") {
    val out = tmp()
    try {
      // partial write happened, but the replayed batch resolves to zero
      // rows (e.g. upstream filter change on restart): the overwrite
      // must still supersede the partial files
      StreamPipeline.writeBatchIdempotent(
        Seq((1L, "a")).toDF("id", "v"), out, 0L)
      StreamPipeline.writeBatchIdempotent(
        Seq.empty[(Long, String)].toDF("id", "v"), out, 0L)
      assert(StreamPipeline.readBatchDirs(spark, out, IdVSchema).count() == 0L)
    } finally rm(out)
  }
}
