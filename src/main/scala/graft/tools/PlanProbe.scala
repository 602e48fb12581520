package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round triage harness (guide §1): for each named bench
  * query, splits the bench's timed region into
  *   - `construct` — the registry closure building the DataFrame (this
  *     is where driver-side work like Lloyd training, BPE merge
  *     learning, or build-if-stale index checks happens),
  *   - `plan` — forcing analysis + optimization + physical planning,
  *   - `exec` — the count() the bench times, re-run on the already
  *     planned frame,
  * and counts plan-shape facts (Exchange nodes, join strategies) so a
  * change's "2 Exchange → 1" claim is checkable. Also dumps
  * `.explain("formatted")` per query to `plans/r20/<name>_<tag>.txt`
  * (tag = args(0), e.g. `before`/`after`); remaining args are query
  * names, or `@bench` for the whole bench list.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names0 = args.drop(1).toSeq
    val names =
      if (names0.contains("@bench")) graft.SparkEntry.benchQueries
      else names0
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
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r21"))
    java.nio.file.Files.createDirectories(outDir)
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    names.foreach { name =>
      // serve-path warm-up: first construction may pay the index build
      if (name.endsWith("_serve") || name.endsWith("_served")) {
        all(name)(spark, sfDir).count(); cleanup()
      }
      val t0 = System.nanoTime()
      val df = all(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val plan = df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      cleanup()
      // steady-state re-run of the full bench-shaped region
      val reps = (1 to 2).map { _ =>
        val r0 = System.nanoTime()
        all(name)(spark, sfDir).count()
        val r = (System.nanoTime() - r0) / 1e9
        cleanup(); r
      }
      var exchanges = 0; var smj = 0; var bhj = 0; var shj = 0; var cart = 0
      plan.foreachUp { n =>
        val s = n.nodeName
        if (s.contains("Exchange")) exchanges += 1
        if (s.contains("SortMergeJoin")) smj += 1
        if (s.contains("BroadcastHashJoin")) bhj += 1
        if (s.contains("ShuffledHashJoin")) shj += 1
        if (s.contains("CartesianProduct") || s.contains("BroadcastNestedLoop")) cart += 1
      }
      println(f"[probe] $name%-34s construct=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f rerun=${reps.map(t => f"$t%.2f").mkString(",")} exch=$exchanges smj=$smj bhj=$bhj shj=$shj nest=$cart")
      val fmt = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(fmt)) {
        all(name)(spark, sfDir).explain("formatted")
      }
      cleanup()
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        fmt.toByteArray)
    }
    spark.stop()
  }
}
