package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.CountMinSketch
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 128

  test("sketch state merges across micro-batches to the one-pass batch sketch") {
    // three parquet files -> maxFilesPerTrigger=1 forces three micro-batches,
    // so the state-store buffer must merge three partial sketches
    val dir = Files.createTempDirectory("scms_in").toString
    val chunks = Seq(
      (1 to 40).map(i => s"k${i % 7}"),
      (1 to 30).map(i => s"k${i % 5}"),
      (1 to 20).map(i => s"k${i % 3}"))
    chunks.zipWithIndex.foreach { case (ks, i) =>
      ks.toDF("k").coalesce(1).write.parquet(s"$dir/c$i")
    }
    val cms = udaf(new CountMinSketch(depth, width))
    val digest = TextAnalysis.tokenHash60(col("k"))

    val streamed = spark.readStream
      .schema("k string")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .select(digest.as("__h"))
      .agg(cms(col("__h")).as("cms"))
    val name = s"scms_${System.nanoTime()}"
    val q = streamed.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("scms_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 3, "expected one micro-batch per file")

    val streamedSketch = spark.table(name).as[Seq[Long]].head()
    val batchSketch = chunks.flatten.toDF("k")
      .select(digest.as("__h")).agg(cms(col("__h"))).as[Seq[Long]].head()
    assert(streamedSketch == batchSketch)
  }
}
