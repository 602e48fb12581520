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

  test("repContaminated: the r15-driver shape — all reps slow, brackets clean — flags") {
    // dedup_repeated_spans in the r15 driver artifact: reps ~8.3-8.9 s
    // against a committed-clean prior median of 1.41 s, with clean canary
    // readings on both sides (the bracket gate missed it entirely)
    assert(Bench.repContaminated(Seq(8.58, 8.31, 8.92), prior = Some(1.41)))
    // ...and each of the other four inflated heavies from that artifact
    assert(Bench.repContaminated(Seq(7.85, 7.2, 8.1), Some(2.31)))
    assert(Bench.repContaminated(Seq(4.38, 4.1, 4.5), Some(1.88)))
    assert(Bench.repContaminated(Seq(3.93, 3.7, 4.0), Some(1.83)))
    assert(Bench.repContaminated(Seq(3.31, 3.2, 3.4), Some(0.83)))
  }

  test("repContaminated: a clean run flags nothing") {
    // reps within noise of the prior
    assert(!Bench.repContaminated(Seq(1.45, 1.38, 1.52), Some(1.41)))
    // an IMPROVED query must never flag
    assert(!Bench.repContaminated(Seq(0.7, 0.72, 0.69), Some(1.41)))
    // no prior + tight reps: nothing to compare, no spread
    assert(!Bench.repContaminated(Seq(1.45, 1.38, 1.52), None))
    // one clean rep acquits the PRIOR gate even when the median is
    // inflated — the MIN is its statistic (the spread gate still flags
    // this shape, which is the point: contaminated, not regressed)
    assert(Bench.repContaminated(Seq(1.40, 6.2, 6.4), Some(1.41)))
  }

  test("repContaminated: rep spread >2x flags, but sub-half-second jitter doesn't") {
    // two contended reps skewing a median: min clean, spread 4.4x
    assert(Bench.repContaminated(Seq(1.40, 6.2, 6.4), prior = None))
    // small-query GC jitter (documented up to ~2x under 0.5 s) stays clean
    assert(!Bench.repContaminated(Seq(0.11, 0.24, 0.12), None))
    // spread just under the gate stays clean at any size
    assert(!Bench.repContaminated(Seq(3.0, 5.5, 3.2), None))
    // an all-failed query is an ERROR, not contamination
    assert(!Bench.repContaminated(Seq.empty, Some(1.0)))
  }

  test("parsePriors reads a committed artifact's medians, same-sf only") {
    val artifact =
      """{"metric":"total","value":10.0,"unit":"sec",""" +
        """"queries":{"q1_agg":0.25,"dedup_repeated_spans":1.41},""" +
        """"errors":[],"sf":"/root/testdata/sf0.1"}"""
    val ps = Bench.parsePriors(artifact, "/root/testdata/sf0.1")
    assert(ps == Map("q1_agg" -> 0.25, "dedup_repeated_spans" -> 1.41))
    // a different sf's medians are not comparable — empty, gate disabled
    assert(Bench.parsePriors(artifact, "/root/testdata/sf0.01").isEmpty)
    // malformed/absent artifacts disable the gate, never crash the bench
    assert(Bench.parsePriors("not json", "x").isEmpty)
    assert(Bench.parsePriors("", "x").isEmpty)
  }

  test("parsePriors drops the queries the prior artifact itself flagged") {
    // a contended artifact's flagged medians carry the inflation the
    // gate divides by — using them as the "clean" denominator makes the
    // gate lenient for exactly the queries it polices; unflagged
    // entries (winning-pass medians) remain valid priors
    val artifact =
      """{"metric":"total","value":10.0,"unit":"sec",""" +
        """"queries":{"q1_agg":0.25,"t1_cdc_apply":2.9,""" +
        """"curation_release":1.8,"sessionize":0.61},""" +
        """"canary":{"contended":true,""" +
        """"contaminated_queries":["t1_cdc_apply","curation_release"],""" +
        """"rep_flagged":["curation_release"]},""" +
        """"self_compare":{"passes":2,"noise":["sessionize"]},""" +
        """"errors":[],"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parsePriors(artifact, "/root/testdata/sf0.1") ==
      Map("q1_agg" -> 0.25))
  }

  test("repContaminated: cross-pass-consistent slowness is a regression, not noise") {
    // the laundering hole: a plan change making a query consistently 2×
    // slower breaches the prior gate in BOTH passes of identical code —
    // that agreement is the regression signal, and flagging it as
    // contamination would let the comparator exclude it forever
    assert(!Bench.repContaminated(Seq(2.9, 2.8, 3.0), Some(1.41),
      crossPassConsistent = true))
    // the same reps WITHOUT the cross-pass veto (single-pass run): the
    // conservative flag stands — no agreement signal exists
    assert(Bench.repContaminated(Seq(2.9, 2.8, 3.0), Some(1.41)))
    // the veto never reaches the SPREAD half: one contended rep skewing
    // the median is intra-pass noise whatever the pass medians say
    assert(Bench.repContaminated(Seq(1.40, 6.2, 6.4), Some(1.41),
      crossPassConsistent = true))
  }

  test("contendedPriorFlagged: the r19 mid-bracket spike is tagged on a contended run only") {
    // the r19 shape: text_unigram_tokenize spiked 7.3× vs its committed
    // prior BETWEEN two clean-reading canary brackets, on a run whose
    // artifact-wide min floor had already fired `contended` — and
    // shipped untagged. On a convicted host, >2×-of-prior is the host's
    // doing: the sweep must tag it.
    val priors = Map("spiky" -> 0.30, "steady" -> 1.00)
    val medians = Seq("spiky" -> 2.19, "steady" -> 1.05, "unknown" -> 9.0)
    assert(Bench.contendedPriorFlagged(contended = true, medians, priors) ==
      Seq("spiky"))
    // a clean run NEVER fires — a genuine 2× regression must reach the
    // comparator through the clean artifact, not be pre-excluded here
    assert(Bench.contendedPriorFlagged(contended = false, medians, priors)
      .isEmpty)
    // inside the 2× attribution bar, or prior-less: untouched
    assert(Bench.contendedPriorFlagged(contended = true,
      Seq("steady" -> 1.9, "unknown" -> 9.0), priors).isEmpty)
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
    // the terminal rung keeps "errors" an ARRAY (emptied) and moves the
    // count to its own key — a fixed-schema consumer must never have to
    // type-branch on "errors"
    assert(summary.contains("\"errors\":[],\"errors_count\":500"))
  }

  // A minimal prior artifact builder for the cross-round comparator:
  // one canary reading (the floor), per-query median/raw/canary_ref.
  private def priorArtifact(
      sf: String, floor: Double,
      qs: Map[String, (Double, Seq[Double], Double)],
      dirty: Seq[String] = Nil, noise: Seq[String] = Nil): String = {
    def quoted(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":1.0,"unit":"sec",""" +
      s""""queries":${qs.map { case (k, (m, _, _)) => s""""$k":$m""" }
        .mkString("{", ",", "}")},""" +
      s""""raw":${qs.map { case (k, (_, r, _)) =>
        s""""$k":${r.mkString("[", ",", "]")}""" }.mkString("{", ",", "}")},""" +
      s""""canary_ref":${qs.map { case (k, (_, _, c)) => s""""$k":$c""" }
        .mkString("{", ",", "}")},""" +
      s""""canary":{"contended":false,"series":[{"pass":0,"at":0,"sec":$floor}],""" +
      s""""contaminated_queries":${quoted(dirty)},"rep_flagged":[]},""" +
      s""""self_compare":{"passes":2,"noise":${quoted(noise)}},""" +
      s""""errors":[],"sf":"$sf"}"""
  }

  private def parseCmp(json: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)

  test("priorCompare: a slow-everywhere query is a CLEAN regression; improvements untagged") {
    val sf = "/root/testdata/sf0.1"
    val prior = priorArtifact(sf, floor = 0.4, qs = Map(
      "a" -> (1.0, Seq(1.0, 1.1, 1.0), 0.4),
      "b" -> (1.0, Seq(1.0, 1.0, 1.2), 0.4),
      "c" -> (2.0, Seq(2.0, 2.1, 2.2), 0.4)))
    val cur = Map(
      // 2x on median AND minima, same canary units → clean regression
      "a" -> Bench.QueryRun(2.0, Seq(2.0, 2.1, 2.2), 0.4),
      // flat → not moved
      "b" -> Bench.QueryRun(1.05, Seq(1.0, 1.1, 1.05), 0.4),
      // halved → improvement, recorded with empty tag, never a "regression"
      "c" -> Bench.QueryRun(1.0, Seq(1.0, 1.0, 1.1), 0.4))
    val node = parseCmp(Bench.priorCompare(prior, sf, cur, 0.4, Set.empty))
    assert(node.path("available").asBoolean())
    assert(node.path("shared").asInt() == 3)
    assert(!node.path("drift").asBoolean())
    import scala.jdk.CollectionConverters._
    val moved = node.path("moved").elements().asScala
      .map(m => m.path("q").asText() -> m.path("tag").asText()).toMap
    assert(moved == Map("a" -> "clean", "c" -> ""))
    assert(node.path("clean_regressions").elements().asScala
      .map(_.asText()).toSeq == Seq("a"))
  }

  test("priorCompare gate ladder: contaminated, suspect, host-noise, canary-drift") {
    val sf = "/root/testdata/sf0.1"
    import scala.jdk.CollectionConverters._
    def tags(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
      node.path("moved").elements().asScala
        .map(m => m.path("q").asText() -> m.path("tag").asText()).toMap
    // CONTAMINATED: the current run flagged the query — excluded
    val p1 = priorArtifact(sf, 0.4, Map("a" -> (1.0, Seq(1.0, 1.0), 0.4)))
    val n1 = parseCmp(Bench.priorCompare(p1, sf,
      Map("a" -> Bench.QueryRun(2.0, Seq(2.0, 2.0), 0.4)), 0.4, Set("a")))
    assert(tags(n1) == Map("a" -> "contaminated"))
    assert(n1.path("clean_regressions").size() == 0)
    // SUSPECT: median doubled but per-rep minima sit flat (one clean
    // rep acquits — the r14 contended-median shape)
    val p2 = priorArtifact(sf, 0.4, Map("a" -> (1.0, Seq(1.0, 1.1), 0.4)))
    val n2 = parseCmp(Bench.priorCompare(p2, sf,
      Map("a" -> Bench.QueryRun(2.0, Seq(1.05, 2.0, 2.1), 0.4)), 0.4, Set.empty))
    assert(tags(n2) == Map("a" -> "suspect"))
    // CANARY-DRIFT: floors differ 2x (units incomparable); normalized
    // ratio breaches only because the denominator moved — raw medians
    // flat. Drift must fire BEFORE the raw-minima gate (r17 ADVICE):
    // a drift round almost always also has flat raw minima, so the old
    // order tagged every genuine drift round host-noise and made this
    // tag unreachable.
    val p3 = priorArtifact(sf, 0.8, Map("a" -> (1.0, Seq(1.0, 1.0), 0.8)))
    val n3 = parseCmp(Bench.priorCompare(p3, sf,
      Map("a" -> Bench.QueryRun(1.0, Seq(1.0, 1.0), 0.4)), 0.4, Set.empty))
    assert(n3.path("drift").asBoolean())
    assert(tags(n3)("a") == "canary-drift")
    assert(n3.path("clean_regressions").size() == 0)
    // HOST-NOISE: canary FLOORS agree (no drift) but this query's
    // nearest canary reading ran fast (0.2 vs the prior's 0.4 — an
    // internally-variable host), inflating the normalized ratio while
    // raw medians and raw minima sit flat; with drift false the
    // raw-minima gate is the one that fires
    val p4 = priorArtifact(sf, 0.4, Map("a" -> (1.0, Seq(1.0, 1.0), 0.4)))
    val n4 = parseCmp(Bench.priorCompare(p4, sf,
      Map("a" -> Bench.QueryRun(1.0, Seq(1.0, 1.0), 0.2)), 0.4, Set.empty))
    assert(!n4.path("drift").asBoolean())
    assert(tags(n4)("a") == "host-noise")
    // availability: foreign sf or no artifact → available:false, never a crash
    assert(!parseCmp(Bench.priorCompare(p3, "/other", Map.empty, 0.4, Set.empty))
      .path("available").asBoolean(true))
    assert(!parseCmp(Bench.priorCompare("", sf, Map.empty, 0.4, Set.empty))
      .path("available").asBoolean(true))
  }
}
