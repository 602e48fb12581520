package graft

/** The driver contract's internal consistency — cheap invariants that
  * turn silent registry drift into a red test:
  *  - an `oracleSql` key without a `queries` entry would never run (the
  *    driver iterates queries), so its oracle silently grades nothing;
  *  - a `benchQueries` name outside the registry is silently skipped by
  *    the bench's `.filter(all.contains)` guard;
  *  - the registry size is pinned so SURVEY §2.1's "N-query registry"
  *    claim cannot drift from HEAD unnoticed (the r14 verdict caught
  *    exactly that doc drift — update BOTH places when adding a query).
  */
class RegistrySpec extends SparkSpec {

  test("every oracle key has a runnable query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every bench name is a registry query") {
    val ghosts = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"bench names outside the registry: $ghosts")
    assert(SparkEntry.benchQueries.distinct.size == SparkEntry.benchQueries.size,
      "duplicate bench names")
  }

  test("registry size matches the documented count") {
    assert(SparkEntry.queries.size == 271,
      s"registry has ${SparkEntry.queries.size} queries — update this pin " +
        "AND SURVEY §2.1 together")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // ---- Bench rotation invariant -------------------------------------
  //
  // `benchQueries` rotates rows in and out to fit the driver's capture
  // window (r16e, r17, r18, r19 each did one). The rotation contract
  // has always been "the outgoing row's PLAN CLASS stays priced by a
  // benched sibling" — but until now it lived in comments, so a future
  // rotation could silently orphan a class. This table is the
  // contract's executable form: every registry query maps into exactly
  // one plan class (same physical-plan shape ⇒ one benched member
  // prices the class), and every class either keeps ≥1 benched
  // representative or carries an explicit exemption reason. Rotations
  // now edit THIS table or go red.
  private sealed trait Policy
  private case object Benched extends Policy
  private final case class Exempt(reason: String) extends Policy

  /** (class, first-match regex, policy). Order matters: a name joins the
    * FIRST class whose regex matches, so specific classes precede the
    * family catch-alls (e.g. the sim serve probes precede the sim
    * lifecycle catch-all). */
  private val planClasses: Seq[(String, String, Policy)] = Seq(
    ("streaming-legs", "^stream_.*",
      Exempt("micro-batch replays of batch kernels the bench already " +
        "prices; their cost is harness time, not a steady-state op")),
    ("ann-recall-diagnostics", "^ann_recall.*",
      Exempt("recall measurement vs the exact oracle — diagnostics; the " +
        "serve arms are priced by the sim_topk classes")),
    ("cdc-micro", "^(s[1-5]_|t1_decode|t1_fold|t2_|d1_|d2_|f3_|p2_|p4_).*",
      Exempt("tiny-frame plan/semantics checks; the CDC family's heavy " +
        "paths are priced by t1_cdc_apply / j1 / o1")),
    ("cdc-apply", "^(t1_cdc_apply|j1_delete_reconcile|o1_last_image)$", Benched),
    // dedup
    ("dedup-exact", "^dedup_(exact|incremental|clusters)$", Benched),
    ("dedup-minhash-lsh", "^dedup_(lsh_pairs|minhash_est|minhash_sig)$", Benched),
    ("dedup-jaccard-verify", "^dedup_(jaccard|containment)$", Benched),
    ("dedup-simhash", "^dedup_simhash$", Benched),
    ("dedup-semantic", "^dedup_(embedding.*|semantic|semdedup.*)$", Benched),
    ("dedup-spans", "^dedup_(repeated_.*|span.*|strip_keep_first)$", Benched),
    ("dedup-phash", "^dedup_phash.*$", Benched),
    ("dedup-edit-distance", "^dedup_edit_distance$", Benched),
    ("dedup-cross-corpus", "^dedup_cross_corpus.*$", Benched),
    // similarity / ANN
    ("sim-exhaustive", "^sim_topk_(brute|hash_embed)$", Benched),
    ("sim-bucket-pruned", "^sim_topk_(lsh|ivf|ivf_probed)$", Benched),
    ("sim-sq8", "^sim_topk_sq8.*$", Benched),
    ("sim-ivfpq", "^sim_topk_ivfpq.*$", Benched),
    ("sim-pq", "^sim_topk_pq.*$", Benched),
    ("sim-jl", "^sim_topk_jl.*$", Benched),
    ("sim-mmr", "^sim_(topk_mmr|mmr_diversity)$", Benched),
    ("sim-serve-probes",
      "^sim_(ivf_probe|pq_probe|jl_probe|ivfpq_rerank)_served$", Benched),
    ("sim-lifecycle", "^sim_.*(index|pinned|trained|refresh).*$",
      Exempt("their time is the index BUILD/append/refresh they replay; " +
        "the steady-state probes are the sim-serve-probes class")),
    // text
    ("text-bm25", "^text_bm25.*$", Benched),
    ("text-bpe", "^text_bpe.*$", Benched),
    ("text-unigram", "^text_unigram.*$", Benched),
    ("text-nb", "^text_nb.*$", Benched),
    ("text-ngram-lm", "^text_(bigram_lm|top_ngrams|collocations)$", Benched),
    ("text-scan", "^text_.*$", Benched),
    // retrieval
    ("retrieval-rm3", "^retrieval_rm3.*$", Benched),
    ("retrieval-sdm", "^retrieval_sdm.*$", Benched),
    ("retrieval-phrase", "^retrieval_phrase.*$", Benched),
    ("retrieval-qld", "^retrieval_qld.*$", Benched),
    ("retrieval-mmr", "^retrieval_mmr.*$", Benched),
    ("retrieval-fusion-eval", "^retrieval_(hybrid_rrf|lexical_rrf|eval_metrics)$",
      Exempt("result-sized fusions/metric folds over arms the retrieval " +
        "classes already price")),
    // curation / quality / multimodal
    ("curation-dsir", "^curation_importance.*$", Benched),
    ("curation-prototype", "^curation_(prototype_prune|d4_pipeline)$", Benched),
    ("curation-hash-decisions", "^curation_.*$", Benched),
    ("quality-scans", "^quality_.*$", Benched),
    ("multimodal-headers", "^multimodal_.*$", Benched),
    // analytics singletons
    ("analytics-scan-agg",
      "^(q1_agg|q6_selective_agg|agg_.*|cube_.*|rollup_.*|date_.*|stats_.*|" +
        "custom_agg.*|case_.*|pivot_.*|percentiles|approx_.*|quantile_.*|" +
        "cms_.*|string_funcs|sql_surface|set_ops)$", Benched),
    ("analytics-joins",
      "^(q3_revenue_topn|q5_local_supplier|semi_join|subquery_above_avg|" +
        "bloom_prune_join|interval_overlap)$", Benched),
    ("analytics-window-session",
      "^(window_.*|session.*|cohort_retention|funnel_.*|resample_ffill|" +
        "topk_.*|asof_join|range_join)$", Benched))

  test("bench rotation invariant: every plan class keeps ≥1 benched row") {
    val bench = SparkEntry.benchQueries.toSet
    def classOf(n: String): Option[String] =
      planClasses.collectFirst { case (c, re, _) if n.matches(re) => c }
    // total coverage: a NEW query must be placed into a class (or given
    // one) before it can land — unclassified rows are invisible to the
    // rotation contract
    val unclassified = SparkEntry.queries.keySet.filter(classOf(_).isEmpty)
    assert(unclassified.isEmpty,
      s"queries outside every plan class: ${unclassified.toSeq.sorted}")
    val members: Map[String, Set[String]] =
      SparkEntry.queries.keySet.groupBy(n => classOf(n).get)
    planClasses.foreach { case (c, _, policy) =>
      val m = members.getOrElse(c, Set.empty)
      assert(m.nonEmpty, s"plan class $c matches no registry query — stale")
      policy match {
        case Benched =>
          assert(m.exists(bench.contains),
            s"plan class $c ($m) lost its last benched representative — " +
              "a rotation orphaned it; bench a sibling or exempt the " +
              "class WITH a reason")
        case Exempt(_) => // documented above; nothing to price
      }
    }
    // and the partition stays honest the other way: every benched row
    // is classified (implied by total coverage, pinned for the message)
    assert(bench.forall(classOf(_).nonEmpty))
  }
}
