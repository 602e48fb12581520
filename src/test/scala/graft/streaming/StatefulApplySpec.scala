package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.streaming.StatefulApply.{KeyChange, KeyImage}

/** flatMapGroupsWithState CDC state across micro-batches AND query
  * restarts: the state store (checkpointed) carries each key's image, late
  * ops are no-ops, deletes remove state. */
class StatefulApplySpec extends SparkSpec {
  import spark.implicits._

  test("keyed state evolves across batches and survives checkpointed restart") {
    val srcDir = Files.createTempDirectory("graft_state_src").toString
    val ckpt = Files.createTempDirectory("graft_state_ckpt").toString

    def run(): Seq[KeyImage] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[KeyImage]
      val changes = spark.readStream
        .schema("id STRING, ts LONG, op STRING, balance DOUBLE")
        .json(srcDir)
        .as[KeyChange]
      val q = StatefulApply.latestImages(changes)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyImage], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
        }
        .start()
      q.awaitTermination()
      out.toSeq
    }

    Files.write(Paths.get(srcDir, "b1.json"), Seq(
      """{"id":"u1","ts":10,"op":"insert","balance":100.0}""",
      """{"id":"u2","ts":11,"op":"insert","balance":200.0}""")
      .mkString("\n").getBytes("UTF-8"))
    val out1 = run()
    assert(out1.toSet == Set(KeyImage("u1", 10, 100.0), KeyImage("u2", 11, 200.0)))

    // restart from checkpoint: state store remembers u1/u2
    Files.write(Paths.get(srcDir, "b2.json"), Seq(
      """{"id":"u1","ts":20,"op":"update","balance":999.0}""",
      """{"id":"u1","ts":5,"op":"update","balance":1.0}""",   // stale: ignored
      """{"id":"u2","ts":21,"op":"delete","balance":null}""", // removes state
      """{"id":"u3","ts":22,"op":"update","balance":7.0}""")  // partial on absent key
      .mkString("\n").getBytes("UTF-8"))
    val out2 = run()
    assert(out2.toSet == Set(KeyImage("u1", 20, 999.0), KeyImage("u3", 22, 7.0)))
  }
}
