package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming dedup state: `dropDuplicatesWithinWatermark` keys seen in an
  * earlier run must still suppress duplicates after a checkpoint restart —
  * the property that makes streaming ingest dedup trustworthy across
  * micro-batch boundaries and daemon restarts. */
class StreamDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", StringType),
    StructField("ts", LongType))) // epoch seconds

  test("duplicates are suppressed across a checkpoint restart; state is watermark-bounded") {
    val srcDir = Files.createTempDirectory("graft_sd_src").toString
    val ckpt = Files.createTempDirectory("graft_sd_ckpt").toString
    val base = 1700000000L
    val emitted = scala.collection.mutable.ArrayBuffer.empty[String]

    def run(): Unit = {
      val q = spark.readStream.schema(schema).json(srcDir)
        .select(col("key"), timestamp_seconds(col("ts")).as("event_time"))
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark("key")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.synchronized { emitted ++= batch.collect().map(_.getString(0)) }; ()
        }
        .start()
      q.awaitTermination()
    }

    Files.write(Paths.get(srcDir, "b0.json"),
      Seq(s"""{"key":"A","ts":$base}""", s"""{"key":"B","ts":${base + 10}}""")
        .mkString("\n").getBytes("UTF-8"))
    run()
    assert(emitted.sorted == Seq("A", "B"))

    // second run: duplicate A within the watermark window + new key C —
    // the restart must recover A from the state store and suppress it
    Files.write(Paths.get(srcDir, "b1.json"),
      Seq(s"""{"key":"A","ts":${base + 20}}""", s"""{"key":"C","ts":${base + 30}}""")
        .mkString("\n").getBytes("UTF-8"))
    run()
    assert(emitted.sorted == Seq("A", "B", "C"), "A re-emitted: dedup state lost on restart")
  }
}
