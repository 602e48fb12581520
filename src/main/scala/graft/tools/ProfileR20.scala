package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 optimization scratch profiler: stage-by-stage decomposition
  * of the bench's heaviest rows (retrieval_mmr_served, retrieval_sdm,
  * dedup_spans_incremental, dedup_jaccard), so each change targets the
  * measured stage instead of the query name. Guide §1.1.
  */
object ProfileR20 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installAll(spark)
    import graft.operators.{Retrieval, Similarity, TextAnalysis}
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def cleanup(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()

    // same literal batch as LlmQueries.Bm25Queries (private[queries])
    val bm25Queries: Seq[(Int, String)] = Seq(
      0 -> "spark window agg", 1 -> "hash join table",
      2 -> "stream batch merge", 3 -> "customer vector scan")

    if (args.isEmpty || args.contains("mmr")) {
      // ---- retrieval_mmr_served decomposition ----
      val queries = bm25Queries
      val root = java.nio.file.Files
        .createTempDirectory("profile_mmr").toString
      time("index build")(Retrieval.buildIndexM(docs, "doc_id", "text", root))
      (1 to 3).foreach { rep =>
        val pool = time(s"bm25ProbeM count $rep") {
          val p = Retrieval.bm25ProbeM(spark, root, queries, 20)
          p.count(); p
        }
        time(s"relPool window count $rep") {
          pool.withColumn("rel",
            round(col("score") / max(col("score")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))), 6))
            .count()
        }
        val relPool = pool.withColumn("rel",
          round(col("score") / max(col("score")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))), 6))
        val poolDocs = time(s"poolDocs semi count $rep") {
          val pd = docs.join(
            broadcast(relPool.select(col("doc_id")).distinct()),
            Seq("doc_id"), "left_semi")
          pd.count(); pd
        }
        val emb = time(s"hashEmbed count $rep") {
          val e = TextAnalysis.hashEmbed(poolDocs, "doc_id", "text", 64)
            .select(col("doc_id"), col("embedding").as("__cv"))
          e.count(); e
        }
        val cand = time(s"cand join count $rep") {
          val c = emb.join(broadcast(relPool), Seq("doc_id"))
            .select(col("query_id"), col("doc_id").as("neighbor_id"),
              col("rel"), col("rank"), col("__cv"))
          c.count(); c
        }
        time(s"cand localCheckpoint $rep")(cand.localCheckpoint())
        time(s"full mmrDiversifiedProbeM count $rep") {
          Retrieval.mmrDiversifiedProbeM(spark, root, docs, "doc_id", "text",
            queries, k = 5, poolSize = 20, dim = 64,
            lambdaNum = 7, lambdaDen = 10).count()
        }
        cleanup()
      }
    }

    if (args.contains("probejobs")) {
      // job-level decomposition of one bm25ProbeM count: what are the
      // sequential driver jobs and how long does each take?
      val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
      val starts = new scala.collection.mutable.HashMap[Int, (Long, String)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = (System.nanoTime(),
            Option(js.properties).map(_.getProperty("spark.job.description", ""))
              .getOrElse(""))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, d) =>
            jobs += ((je.jobId, System.nanoTime() - t0, d))
          }
      }
      val root = java.nio.file.Files
        .createTempDirectory("profile_probe").toString
      Retrieval.buildIndexM(docs, "doc_id", "text", root)
      // warm one probe, then listen on the second
      Retrieval.bm25ProbeM(spark, root, bm25Queries, 20).count()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      Retrieval.bm25ProbeM(spark, root, bm25Queries, 20).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      println(f"== probe total: $total%.3f s over ${jobs.length} jobs")
      jobs.foreach { case (id, ns, d) =>
        println(f"   job $id%3d ${ns / 1e9}%7.3f s  $d")
      }
      // and the same for the FULL mmr serve tail
      val jobs2 = jobs.clone(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime()
      Retrieval.mmrDiversifiedProbeM(spark, root, docs, "doc_id", "text",
        bm25Queries, k = 5, poolSize = 20, dim = 64,
        lambdaNum = 7, lambdaDen = 10).count()
      val total2 = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      println(f"== mmr serve total: $total2%.3f s over ${jobs.length} jobs")
      jobs.foreach { case (id, ns, d) =>
        println(f"   job $id%3d ${ns / 1e9}%7.3f s  $d")
      }
      jobs2.clear()
      cleanup()
    }

    if (args.contains("sdm")) {
      val queries = bm25Queries
      (1 to 3).foreach { rep =>
        time(s"sdmTopK full $rep") {
          Retrieval.sdmTopK(docs, "doc_id", "text", queries, 10).count()
        }
        cleanup()
      }
    }

    if (args.contains("mmrtopk")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      emb.count()
      (1 to 3).foreach { rep =>
        time(s"sim_topk_mmr full $rep") {
          Similarity.mmrTopK(emb.filter(col("vec_id") < 10), emb,
            "vec_id", "embedding",
            k = 5, poolSize = 20, lambdaNum = 7, lambdaDen = 10).count()
        }
        cleanup()
      }
    }
    spark.stop()
  }
}
