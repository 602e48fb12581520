package graft.tools

import org.apache.spark.sql.SparkSession

/** Job-level decomposition for optimization triage (guide §1.1/§7): for
  * each named registry query, a steady-state repetition is re-run under
  * a SparkListener that records every job's wall time. The printout
  * splits the query's total into
  *   - `jobs` — how many Spark jobs the one bench repetition submits
  *     (a high count means sequential driver-side actions: collects,
  *     localCheckpoints, index-build commits),
  *   - `jobsum` — the summed wall time of those jobs,
  *   - `gap` — total minus jobsum: driver-only time (planning, job
  *     scheduling gaps, manifest IO, driver-side training loops). A
  *     query whose gap dominates wants FUSION (fewer actions), not
  *     faster tasks — the r20 MMR lesson.
  * Usage: runMain graft.tools.JobProbe <query> [query...]  (or @top for
  * the bench's historically-heavy rows).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args.contains("@top"))
        Seq("dedup_spans_incremental", "retrieval_sdm", "retrieval_rm3_served",
          "dedup_jaccard", "dedup_repeated_spans", "dedup_cross_corpus_indexed",
          "sim_topk_pq_trained", "text_nb_classify", "curation_pipeline",
          "dedup_spans_incremental_serve", "dedup_edit_distance",
          "dedup_lsh_pairs", "q3_revenue_topn", "text_top_ngrams",
          "text_bigram_lm", "dedup_minhash_est", "curation_importance_weights",
          "curation_release", "q5_local_supplier", "retrieval_mmr_served",
          "dedup_simhash", "dedup_cross_corpus_served")
      else args.toSeq
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
    names.foreach { name =>
      // warm-up: serve paths pay the index build here; everything else
      // pays codegen/planning caches
      all(name)(spark, sfDir).count(); cleanup()
      val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
      val starts = new scala.collection.mutable.HashMap[Int, Long]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(js.jobId) = System.nanoTime()
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach(t0 =>
            jobs += ((je.jobId, System.nanoTime() - t0)))
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      cleanup()
      val jobsum = jobs.map(_._2).sum / 1e9
      val top = jobs.sortBy(-_._2).take(5)
        .map { case (id, ns) => f"j$id:${ns / 1e9}%.2f" }.mkString(" ")
      println(f"[jp] $name%-32s total=$total%6.2f jobs=${jobs.length}%3d " +
        f"jobsum=$jobsum%6.2f gap=${total - jobsum}%6.2f  top5: $top")
    }
    spark.stop()
  }
}
