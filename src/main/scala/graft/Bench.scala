package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json): times the
  * headline queries from [[SparkEntry.benchQueries]] on
  * `SPARK_GRAFT_SF_DIR` and prints exactly one JSON line.
  */
object Bench {
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
    // The inter-rep cleanup below unpersists locally-checkpointed RDDs
    // (Lloyd / connected-components rounds); each such unpersist logs
    // "RDD was locally checkpointed" at WARN because the lineage cannot
    // be recomputed — irrelevant here, the query that owned the blocks
    // has already returned. Silence the RDD loggers for this bench main
    // only, so the one JSON line is the whole stdout/stderr story.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    // ... and the one-line "Truncated the string representation of a plan"
    // advisory (wide ANN plans trip the 25-field default toString cap).
    Seq("org.apache.spark.util.SparkStringUtils",
        "org.apache.spark.sql.catalyst.util.SparkStringUtils",
        "org.apache.spark.sql.catalyst.util.StringUtils").foreach(l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR))
    graft.functions.GraftFunctions.installAll(spark)
    // Warm the session once (file listing, parquet footers, codegen paths)
    // so per-query timings measure the queries, not JVM cold start.
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    val all = SparkEntry.queries
    def runOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val t = try { all(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
              catch { case e: Throwable =>
                System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None }
      // Drop blocks the run materialized (localCheckpoint in the dedup/CC
      // operators) OUTSIDE the timed region — otherwise each repetition
      // piles new checkpoint RDDs into storage memory and reps 2..n
      // measure block-manager pressure instead of the query (observed:
      // lsh_pairs 6.3 s single-shot vs 13.6 s as a 3-rep median).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      t
    }
    // Serve-path queries are build-if-stale: on a cold /tmp their first
    // repetition pays the index BUILD, contaminating a 3-rep median that
    // is defined to measure the steady-state PROBE. Build the persisted
    // indexes inside the warm-up phase instead.
    SparkEntry.benchQueries.filter(all.contains)
      .filter(n => n.endsWith("_serve") || n.endsWith("_served"))
      .foreach(n => runOnce(n))
    // Contention canary: q1_agg timed before and after the sweep. A large
    // end/start ratio means the host got busier while this artifact was
    // being produced — the whole run's numbers carry environmental
    // inflation and must not be read as regressions (three phantom
    // breaches in round 11 came from exactly that).
    val canaryStart = runOnce("q1_agg").getOrElse(0.0)
    // Median of 3 repetitions per query: the ~0.3-1 s planning/codegen floor
    // and GC-driven run-to-run variance (up to 2x on the small queries) made
    // single-shot round-over-round deltas untrustworthy. Raw per-rep times
    // are emitted alongside the medians so a reader can tell a real
    // regression (all reps slow) from one contended rep skewing the median.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.benchQueries.filter(all.contains).map { name =>
      val times = (1 to reps).flatMap(_ => runOnce(name))
      val median =
        if (times.isEmpty) 0.0 else times.sorted.apply(times.length / 2)
      (name, median, times, times.length == reps)
    }
    val canaryEnd = runOnce("q1_agg").getOrElse(0.0)
    val canaryRatio = if (canaryStart > 0) canaryEnd / canaryStart else 0.0
    // an unmeasurable canary (either run failed) must NOT read as a
    // clean artifact — that is precisely a sign of host distress
    val contended = canaryRatio > 1.5 || canaryStart <= 0 || canaryEnd <= 0
    val canary =
      f""""canary":{"q1_start":$canaryStart%.3f,"q1_end":$canaryEnd%.3f,""" +
        f""""ratio":$canaryRatio%.2f,"contended":$contended}"""
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, ts, _) =>
      s"\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Skew stress: the same operators on a deterministic power-law corpus
    // (one hot key at 20 %, 1/k tail) vs a uniform twin of identical
    // volume — each path graded skew ≤ 2× uniform. 1M change rows / 5k
    // docs ≈ 10× the sf0.1 events/documents tables. Failure-isolated: a
    // skew-section crash must not cost the whole bench run its one JSON
    // line (the artifact the round gate parses).
    val skew =
      try SkewBench.run(spark, nRows = 1000000L, nDocs = 5000L)
        .map { case (name, s, u) =>
          val ratio = if (u > 0) s / u else 0.0
          f""""$name":{"skew":$s%.3f,"uniform":$u%.3f,"ratio":$ratio%.2f}"""
        }.mkString("{", ",", "}")
      catch { case e: Throwable =>
        System.err.println(s"[bench] skew section FAILED: ${e.getMessage}")
        s"""{"error":"${e.getClass.getSimpleName}"}"""
      }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"raw":$raw,$canary,"errors":$errors,"bench_skew":$skew,"sf":"$sfDir"}""")
    spark.stop()
  }
}
