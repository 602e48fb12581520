package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing harness for performance triage: runs the
  * named registry queries (args) N reps each against
  * `SPARK_GRAFT_SF_DIR` and prints per-rep wall seconds. Unlike
  * [[graft.Bench]] this times a HAND-PICKED subset, so a regression can
  * be bisected without paying the full 60-query sweep per experiment.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B confs, e.g. SPARK_GRAFT_CONF="spark.graft.scan.parallelismFloor=0"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val i = kv.indexOf('=')
        b.config(kv.take(i).trim, kv.drop(i + 1).trim) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installAll(spark)
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => graft.Tables.load(spark, sfDir, t).count())
    val all = graft.SparkEntry.queries
    args.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        t
      }
      println(f"[qt] $name%-36s median=${times.sorted.apply(times.length / 2)}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
