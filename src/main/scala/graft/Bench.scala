package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json): times the
  * headline queries from [[SparkEntry.benchQueries]] on
  * `SPARK_GRAFT_SF_DIR` and prints exactly one JSON line.
  */
object Bench {

  /** Is the query at `queryIndex` (0-based position in the sweep)
    * contaminated by host contention? `canaries` are (queries-completed-
    * before-this-reading, seconds) re-timings of the same tiny canary
    * query taken throughout the sweep. A query is flagged when either
    * canary reading bracketing it ran more than `threshold`× the run's
    * TYPICAL (median) reading — so a mid-run contention window flags
    * exactly the queries inside it, closing the round-12 blind spot
    * where ~10 mid-list queries read 3-8× inflated while the start/end
    * canaries both looked clean. The floor is the median, not the
    * minimum: one outlier-fast reading must not flag every normal
    * bracket (observed: a 0.32 s outlier among steady 0.38 s readings
    * put the whole first bracket over a min-based threshold). A
    * majority-contended run can sneak past a median floor — that case
    * is what the artifact-wide min-floor `contended` flag still
    * catches. Pure, so the synthetic-load spec can drive it
    * deterministically. */
  /** The canary reading nearest to the query at `queryIndex` (by
    * queries-completed distance; ties prefer the reading taken BEFORE
    * the query). This is the denominator a cross-round comparator uses
    * to normalize the query's median (`sec / canary_ref`): two rounds
    * that ran under different host load divide out the load instead of
    * reporting it as a regression. Pure, spec-driven. */
  def nearestCanary(canaries: Seq[(Int, Double)], queryIndex: Int): Double = {
    val ok = canaries.filter(_._2 > 0)
    if (ok.isEmpty) 0.0
    else ok.minBy { case (at, _) =>
      // before-readings (at <= i) win ties against after-readings
      (math.abs(at - queryIndex).toLong << 1) | (if (at <= queryIndex) 0 else 1)
    }._2
  }

  def contaminatedBy(
      canaries: Seq[(Int, Double)], queryIndex: Int,
      threshold: Double = 1.5): Boolean = {
    val clean = canaries.map(_._2).filter(_ > 0)
    if (clean.isEmpty) return true // unmeasurable canary = distressed host
    val floor = clean.sorted.apply(clean.length / 2)
    val before = canaries.filter(_._1 <= queryIndex).lastOption
    val after = canaries.find(_._1 > queryIndex)
    (before.toSeq ++ after.toSeq).exists { case (_, t) =>
      t <= 0 || t / floor > threshold
    }
  }

  /** The artifact-wide flag: ANY reading >`threshold`× the run's TYPICAL
    * (median) reading, or any unmeasurable reading, marks the artifact
    * as carrying environmental inflation somewhere. Median floor for the
    * same reason [[contaminatedBy]]'s is — a min floor fired on every
    * artifact r13-r14, clean or not (first from canary warm-up
    * inflation, then from outlier-FAST readings once the canary was
    * pre-warmed), and a flag that always fires carries no signal. A
    * uniformly-contended run can sneak past a median floor; uniform
    * inflation is exactly what per-query `canary_ref` normalization
    * divides out cross-round. Pure, spec-driven. */
  def contendedRun(readings: Seq[Double], threshold: Double = 1.5): Boolean = {
    val ok = readings.filter(_ > 0)
    if (ok.isEmpty || ok.length != readings.length) return true
    val floor = ok.sorted.apply(ok.length / 2)
    readings.exists(_ / floor > threshold)
  }

  /** The driver's stdout capture window (~2000 chars incl. the build
    * tool's epilogue); every emitted last line must fit under it. */
  val CaptureWindow = 1800

  /** The COMPACT last-stdout-line: medians + canary summary only, built
    * pure so the length budget is spec-checkable at the current
    * registry size. All name lists arrive RAW and are quoted here (one
    * quoting contract — a caller hand-quoting would double-quote).
    * Degradation ladder when the window would overflow: full
    * contamination name list → contamination count → medians-free
    * summary → errors degraded to a count too (the terminal rung is a
    * fixed-size line, so SOMETHING parseable always fits) with a
    * stderr warning — registry growth must never silently reintroduce
    * the parsed:null truncation bug this line exists to fix. */
  def compactLine(
      medians: Seq[(String, Double)], total: Double, contended: Boolean,
      contaminated: Seq[String], errorNames: Seq[String],
      sfDir: String): String = {
    val qsCompact = medians.map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val errorList = errorNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    def withDirty(dirty: String) =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qsCompact,""" +
        s""""canary":{"contended":$contended,$dirty},""" +
        s""""errors":$errorList,"sf":"$sfDir"}"""
    def summary(errors: String) =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec",""" +
        s""""queries_omitted":${medians.length},""" +
        s""""canary":{"contended":$contended,""" +
        s""""contaminated_count":${contaminated.length}},""" +
        s""""errors":$errors,"sf":"$sfDir"}"""
    val full = withDirty(s""""contaminated_queries":${contaminated
      .map("\"" + _ + "\"").mkString("[", ",", "]")}""")
    val counted = withDirty(s""""contaminated_count":${contaminated.length}""")
    if (full.length <= CaptureWindow) full
    else if (counted.length <= CaptureWindow) counted
    else {
      System.err.println(
        s"[bench] compact line ${counted.length} chars exceeds the capture " +
          "window even without the contamination list — emitting the " +
          "medians-free summary; per-query medians are in the file artifact only")
      val withErrors = summary(errorList)
      // a broken build's error-name list can be registry-sized itself:
      // the terminal rung degrades it to a count, which always fits
      if (withErrors.length <= CaptureWindow) withErrors
      else summary(s"""{"errors_count":${errorNames.length}}""")
    }
  }

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
    // Warm the canary query itself before its first TIMED reading: the
    // at-0 reading used to carry q1_agg's own first-run planning/codegen
    // cost (~2x its steady state), which sat under the min-floor below
    // and made `contended` fire on every artifact — including provably
    // clean runs (r13, r14, and the r14 judge re-run alike). A canary
    // reading must price the HOST, not JVM warm-up.
    runOnce("q1_agg"); runOnce("q1_agg")
    // Contention canary: q1_agg re-timed throughout the sweep — before,
    // after every `canaryEvery` queries, and at the end. The round-11/12
    // artifacts proved a start/end-only canary has a blind spot: a
    // multi-minute mid-run contention window inflated ~10 consecutive
    // queries 3-8× across ALL their reps while both endpoint readings
    // looked clean. The series localizes inflation to the queries it
    // actually covered (see contaminatedBy).
    val canaryEvery = sys.env.getOrElse("SPARK_GRAFT_CANARY_EVERY", "12").toInt
    val canaryReadings = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def timeCanary(at: Int): Unit =
      canaryReadings += ((at, runOnce("q1_agg").getOrElse(0.0)))
    timeCanary(0)
    // Median of 3 repetitions per query: the ~0.3-1 s planning/codegen floor
    // and GC-driven run-to-run variance (up to 2x on the small queries) made
    // single-shot round-over-round deltas untrustworthy. Raw per-rep times
    // are emitted alongside the medians so a reader can tell a real
    // regression (all reps slow) from one contended rep skewing the median.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val benchNames = SparkEntry.benchQueries.filter(all.contains)
    val results = benchNames.zipWithIndex.map { case (name, i) =>
      if (i > 0 && i % canaryEvery == 0) timeCanary(i)
      val times = (1 to reps).flatMap(_ => runOnce(name))
      val median =
        if (times.isEmpty) 0.0 else times.sorted.apply(times.length / 2)
      (name, median, times, times.length == reps)
    }
    timeCanary(benchNames.length)
    val canaryStart = canaryReadings.head._2
    val canaryEnd = canaryReadings.last._2
    val canaryRatio = if (canaryStart > 0) canaryEnd / canaryStart else 0.0
    val contended = contendedRun(canaryReadings.map(_._2).toSeq)
    val contaminated = benchNames.zipWithIndex.collect {
      case (name, i) if contaminatedBy(canaryReadings.toSeq, i) => name
    }
    val canary =
      f""""canary":{"q1_start":$canaryStart%.3f,"q1_end":$canaryEnd%.3f,""" +
        f""""ratio":$canaryRatio%.2f,"contended":$contended,""" +
        s""""series":${canaryReadings.map { case (at, t) =>
          f"""{"at":$at,"sec":$t%.3f}""" }.mkString("[", ",", "]")},""" +
        s""""contaminated_queries":${contaminated
          .map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, ts, _) =>
      s"\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-query nearest canary reading — the normalization denominator a
    // cross-round comparator (tools/bench_compare.py) divides medians by,
    // so environmental drift between rounds cancels instead of reading
    // as a regression
    val canaryRef = benchNames.zipWithIndex.map { case (k, i) =>
      s"\"" + k + "\":" + f"${nearestCanary(canaryReadings.toSeq, i)}%.3f"
    }.mkString("{", ",", "}")
    val errorNames = results.collect { case (k, _, _, false) => k }
    val errors = errorNames.map("\"" + _ + "\"").mkString("[", ",", "]")
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
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"raw":$raw,"canary_ref":$canaryRef,$canary,"errors":$errors,"bench_skew":$skew,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only a bounded TAIL of stdout (~2000 chars) and
    // parses the artifact out of it; the full line above is ~5 KB, so
    // every round since r10 shipped `parsed: null`. Persist the full line
    // to a file (below) and emit a COMPACT twin — medians + canary
    // summary only, no raw/canary_ref/series arrays — as the absolute
    // LAST stdout line, small enough (~1.4 KB for 50 queries at 2
    // decimals) that the whole line survives inside the capture window
    // even with the build tool's own epilogue after it.
    val compact = compactLine(
      results.map { case (k, v, _, _) => (k, v) },
      total, contended, contaminated, errorNames, sfDir)
    // Persist the identical FULL line to a file in the working directory
    // so the complete artifact (raw reps, canary series, skew section)
    // survives regardless of capture window. Best-effort: a read-only
    // cwd must not fail the bench.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist JSON line: ${e.getMessage}")
    }
    spark.stop()
    println(compact)
  }
}
