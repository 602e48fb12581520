package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[Bench.contaminatedBy]] with synthetic canary series — the
  * deterministic stand-in for a mid-run host-contention window. Round 12's
  * artifact proved the start/end-only canary has a blind spot: ~10
  * consecutive mid-list queries ran 3-8× inflated across all reps while
  * both endpoint readings looked clean (`contended: false`). The series
  * classifier must flag exactly the queries bracketed by an inflated
  * reading, and nothing else.
  */
class BenchCanarySpec extends AnyFunSuite {

  // Canary readings: (queries completed before the reading, seconds).
  private val cleanRun = Seq((0, 0.10), (12, 0.11), (24, 0.10), (36, 0.10))

  test("a clean series flags nothing") {
    (0 until 36).foreach { i =>
      assert(!Bench.contaminatedBy(cleanRun, i), s"query $i wrongly flagged")
    }
  }

  test("a mid-run contention window flags exactly the bracketed queries") {
    // Round-12 shape: endpoints clean, one mid-run reading 5x inflated.
    val midHot = Seq((0, 0.10), (12, 0.50), (24, 0.10), (36, 0.10))
    // Queries 0..11 are bracketed by readings at 0 (clean) and 12 (hot):
    // the window could have opened any time before the hot reading, so
    // they are flagged. Queries 12..23 are bracketed by 12 (hot) and 24
    // (clean): flagged too. Queries 24..35 sit between two clean
    // readings: not flagged.
    (0 until 24).foreach(i => assert(Bench.contaminatedBy(midHot, i), s"query $i"))
    (24 until 36).foreach(i => assert(!Bench.contaminatedBy(midHot, i), s"query $i"))
  }

  test("an inflated START canary flags only the first bracket") {
    val startHot = Seq((0, 0.55), (12, 0.10), (24, 0.10))
    (0 until 12).foreach(i => assert(Bench.contaminatedBy(startHot, i)))
    (12 until 24).foreach(i => assert(!Bench.contaminatedBy(startHot, i)))
  }

  test("an inflated END canary flags only the last bracket") {
    val endHot = Seq((0, 0.10), (12, 0.10), (24, 0.47))
    (0 until 12).foreach(i => assert(!Bench.contaminatedBy(endHot, i)))
    (12 until 24).foreach(i => assert(Bench.contaminatedBy(endHot, i)))
  }

  test("a failed (zero) canary reading reads as contamination, not cleanliness") {
    val failedMid = Seq((0, 0.10), (12, 0.0), (24, 0.10))
    (0 until 24).foreach(i => assert(Bench.contaminatedBy(failedMid, i)))
    // An entirely unmeasurable series means a distressed host: flag all.
    val allFailed = Seq((0, 0.0), (12, 0.0))
    assert(Bench.contaminatedBy(allFailed, 5))
  }

  test("threshold is relative to the TYPICAL (median) reading, not the first") {
    // First reading itself mildly inflated (1.3x the floor seen later):
    // queries after the floor reading must not be flagged by it.
    val warmStart = Seq((0, 0.13), (12, 0.10), (24, 0.10))
    (12 until 24).foreach(i => assert(!Bench.contaminatedBy(warmStart, i)))
    // 1.3x is under the default 1.5 threshold: first bracket clean too.
    (0 until 12).foreach(i => assert(!Bench.contaminatedBy(warmStart, i)))
    // ...but a 1.6x first reading crosses it.
    val hotStart = Seq((0, 0.16), (12, 0.10), (24, 0.10))
    (0 until 12).foreach(i => assert(Bench.contaminatedBy(hotStart, i)))
  }

  test("one outlier-FAST reading does not flag every normal bracket") {
    // The steady readings are ~0.38; one reading dips to 0.31 (cache
    // luck) and the first reading is 0.50 — 1.61x the min but only
    // 1.32x the median. A min-based floor flagged the whole first
    // bracket of an otherwise clean run; the median floor must not.
    val dip = Seq((0, 0.50), (12, 0.38), (24, 0.38), (36, 0.38), (47, 0.31))
    (0 until 47).foreach(i => assert(!Bench.contaminatedBy(dip, i), s"query $i"))
    // a genuinely hot reading against the same median still flags
    val hot = Seq((0, 0.60), (12, 0.38), (24, 0.38), (36, 0.38), (47, 0.31))
    (0 until 12).foreach(i => assert(Bench.contaminatedBy(hot, i)))
    (12 until 47).foreach(i => assert(!Bench.contaminatedBy(hot, i)))
  }

  test("contendedRun: median floor, outlier-fast readings don't flag a clean run") {
    // the r13-r14 failure shape: a steady run with one outlier-fast
    // reading (JIT/GC settling at the end) must read clean
    assert(!Bench.contendedRun(Seq(0.36, 0.53, 0.44, 0.40, 0.38, 0.19)))
    // a genuinely inflated mid-run reading flags it
    assert(Bench.contendedRun(Seq(0.36, 0.53, 1.40, 0.40, 0.38, 0.33)))
    // an unmeasurable reading is distress, not cleanliness
    assert(Bench.contendedRun(Seq(0.36, 0.0, 0.40)))
    assert(Bench.contendedRun(Seq.empty))
    // the pre-r15 false-positive: warm-up-inflated at-0 over a clean run
    // (0.443 vs steady 0.18-0.20) no longer flags under a median floor
    // ONLY because the canary is now warmed first; with the inflated
    // reading present it still flags — the fix is the warming, the
    // median floor handles the outlier-fast side
    assert(Bench.contendedRun(Seq(0.443, 0.19, 0.18, 0.20, 0.19, 0.19)))
  }

  test("nearestCanary picks the closest reading, before-reading on ties") {
    val series = Seq((0, 0.40), (12, 0.50), (24, 0.60))
    assert(Bench.nearestCanary(series, 0) == 0.40)   // exactly at a reading
    assert(Bench.nearestCanary(series, 3) == 0.40)   // closer to the 0-reading
    assert(Bench.nearestCanary(series, 11) == 0.50)  // closer to the 12-reading
    assert(Bench.nearestCanary(series, 18) == 0.50)  // tie 12 vs 24: before wins
    assert(Bench.nearestCanary(series, 40) == 0.60)  // past the end
    // unmeasurable readings are skipped, not divided by
    assert(Bench.nearestCanary(Seq((0, 0.0), (12, 0.50)), 1) == 0.50)
    assert(Bench.nearestCanary(Seq((0, 0.0)), 1) == 0.0)
  }

  test("compact line fits the capture window at the CURRENT bench registry size") {
    // the guard this line exists for: when benchQueries grows past the
    // window, this test fails LOUDLY instead of the round artifact
    // silently degrading to the medians-free summary. Medians use the
    // WORST-CASE %.2f width (999.99 — heavy queries render 5-6 chars;
    // a minimal 9.99 here would pass while a real run overflowed)
    val medians = SparkEntry.benchQueries.map(n => n -> 999.99)
    val clean = Bench.compactLine(medians, total = 9999.99, contended = false,
      contaminated = Seq.empty, errorNames = Seq.empty,
      sfDir = "/root/testdata/sf0.1")
    assert(clean.length <= Bench.CaptureWindow,
      s"compact line ${clean.length} chars — benchQueries outgrew the window")
    SparkEntry.benchQueries.foreach(n =>
      assert(clean.contains("\"" + n + "\""), s"median for $n missing"))
    // a fully-contaminated run degrades to the count, still under budget
    val dirty = Bench.compactLine(medians, 9999.99, contended = true,
      contaminated = SparkEntry.benchQueries,
      errorNames = Seq.empty, sfDir = "/root/testdata/sf0.1")
    assert(dirty.length <= Bench.CaptureWindow)
    assert(dirty.contains("\"contaminated_count\":") ||
      dirty.contains("\"contaminated_queries\":"))
    // the last-resort summary always fits, whatever the registry size —
    // including a broken build where EVERY query is also an error (the
    // error list degrades to a count in the terminal rung)
    val huge = (1 to 500).map(i => s"very_long_query_name_number_$i" -> 1.0)
    val summary = Bench.compactLine(huge, 1.0, contended = false,
      contaminated = Seq.empty, errorNames = huge.map(_._1), sfDir = "x")
    assert(summary.length <= Bench.CaptureWindow)
    assert(summary.contains("\"queries_omitted\":500"))
    assert(summary.contains("\"errors_count\":500"))
  }
}
