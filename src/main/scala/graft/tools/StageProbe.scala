package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level decomposition (guide §7.1 without a UI): one steady-state
  * repetition of each named query under a stage listener, printing per
  * stage: wall time, task count, summed task time, and the dominant
  * task-metric bucket — so a fat job can be attributed to task work vs
  * scheduling vs codegen-in-driver (stage submission gaps). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installAll(spark)
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => graft.Tables.load(spark, sfDir, t).count())
    val all = graft.SparkEntry.queries
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    args.foreach { name =>
      all(name)(spark, sfDir).count(); cleanup() // warm
      case class St(wall: Long, nTasks: Int, taskSum: Long, name: String)
      val stages = new scala.collection.mutable.ArrayBuffer[St]
      val starts = new scala.collection.mutable.HashMap[Int, Long]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          starts(s.stageInfo.stageId) = System.nanoTime()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val wall = starts.remove(s.stageInfo.stageId)
            .map(System.nanoTime() - _).getOrElse(0L)
          stages += St(wall, s.stageInfo.numTasks,
            s.stageInfo.taskMetrics.executorRunTime,
            s.stageInfo.name.take(60))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300); cleanup()
      println(f"[sp] $name total=$total%.2f stages=${stages.length}")
      stages.sortBy(-_.wall).take(10).foreach { s =>
        println(f"[sp]   wall=${s.wall / 1e9}%6.3f tasks=${s.nTasks}%4d " +
          f"taskSum=${s.taskSum / 1e3}%8.1fs? ${s.name}")
      }
    }
    spark.stop()
  }
}
