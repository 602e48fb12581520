package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CdcQueries, CurationQueries, LlmQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 + analytics +
  * LLM-pipeline north-star); each key with an [[oracleSql]] twin is
  * hash-checked against DuckDB at sf0.01 by the driver.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The CDC apply — change stream folded onto a base snapshot — is the
    * core semantics of the whole engine. */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.defs("t1_cdc_apply")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.defs ++ AnalyticsQueries.defs ++ LlmQueries.defs ++
      CurationQueries.defs ++
      Map(
        "stream_window_agg" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.windowedCounts(s, dir)),
        "stream_stream_join" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.clickToPurchase(s, dir)),
        "stream_dedup" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingDedup(s, dir)),
        "stream_cms" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingCms(s, dir)),
        "stream_semantic_dedup" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingSemanticDedup(s, dir)),
        "stream_semantic_dedup_growing" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingSemanticDedupGrowing(s, dir)),
        "stream_span_dedup" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingSpanDedup(s, dir)),
        "stream_span_dedup_growing" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingSpanDedupGrowing(s, dir)),
        "stream_quality_profile" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingQualityProfile(s, dir)),
        "stream_quality_gate" -> ((s: SparkSession, dir: String) =>
          streaming.StreamPipeline.streamingRowGate(s, dir)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ AnalyticsQueries.oracles ++ LlmQueries.oracles ++
      CurationQueries.oracles ++
      Map(
        "stream_window_agg" ->
          """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               event_type, count(*) AS n, round(sum(value), 4) AS total
             FROM events GROUP BY hour, event_type ORDER BY hour, event_type""",
        "stream_stream_join" ->
          """SELECT p.event_id AS p_id, c.event_id AS c_id, c.user_id
             FROM events c JOIN events p
               ON c.event_type = 'click' AND p.event_type = 'purchase'
              AND c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
             ORDER BY p_id, c_id""",
        "stream_dedup" ->
          """SELECT event_type, count(DISTINCT user_id) AS uniq_users
             FROM events GROUP BY event_type ORDER BY event_type""",
        // the streamed sketch must satisfy the same guarantees as the
        // batch twin (cms_heavy_hitters): merge associativity makes the
        // micro-batch fold equivalent to the one-pass fold
        "stream_cms" ->
          """SELECT user_id, count(*) AS n_events,
               true AS no_undercount, true AS bounded_overcount
             FROM events GROUP BY user_id ORDER BY user_id""",
        // ingest-time semantic dedup ≡ the batch LSH-bucketed pair join
        // over the same rows (stream side is stateless, so batch
        // equivalence is exact, both directions of each pair)
        "stream_semantic_dedup" ->
          """WITH toks AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             hashed AS (
               SELECT doc_id, CAST(h % 64 AS INT) AS i,
                      CASE WHEN (h // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END AS v
               FROM (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::bigint AS h
                     FROM toks WHERE tok <> '')),
             zeros AS (
               SELECT doc_id, CAST(j AS INT) AS i, 0.0 AS v
               FROM documents, (SELECT unnest(range(64)) AS j)),
             summed AS (
               SELECT doc_id, i, sum(v) AS s
               FROM (SELECT * FROM hashed UNION ALL SELECT * FROM zeros)
               GROUP BY doc_id, i),
             emb AS (
               SELECT doc_id AS vec_id, list(CAST(s AS FLOAT) ORDER BY i) AS embedding
               FROM summed GROUP BY doc_id),
             b AS (
               SELECT vec_id, embedding,
                 array_to_string(list_transform(list_slice(embedding, 1, 8),
                   x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
               FROM emb),
             pairs AS (
               SELECT a.vec_id AS doc_id, b2.vec_id AS corpus_id,
                 list_dot_product(a.embedding::double[], b2.embedding::double[]) /
                   (sqrt(list_dot_product(a.embedding::double[], a.embedding::double[])) *
                    sqrt(list_dot_product(b2.embedding::double[], b2.embedding::double[]))) AS c
               FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id)
             SELECT doc_id, corpus_id, round(c, 6) AS cosine FROM pairs
             WHERE c >= 0.9 ORDER BY doc_id, corpus_id""",
        // the GROWING-index edition: the lake (doc_id%10 < 8) is embedded
        // once; arrivals stream in as 3 deterministic micro-batches
        // (batch b = (doc_id%30)//10) and each batch both probes the
        // embed table as of the PREVIOUS batch and appends its own rows
        // via an exactly-once manifest commit — so doc_id in batch b
        // pairs with the lake or any batch < b, never its own batch,
        // replayed here without any index
        "stream_semantic_dedup_growing" ->
          """WITH toks AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             hashed AS (
               SELECT doc_id, CAST(h % 64 AS INT) AS i,
                      CASE WHEN (h // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END AS v
               FROM (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::bigint AS h
                     FROM toks WHERE tok <> '')),
             zeros AS (
               SELECT doc_id, CAST(j AS INT) AS i, 0.0 AS v
               FROM documents, (SELECT unnest(range(64)) AS j)),
             summed AS (
               SELECT doc_id, i, sum(v) AS s
               FROM (SELECT * FROM hashed UNION ALL SELECT * FROM zeros)
               GROUP BY doc_id, i),
             emb AS (
               SELECT doc_id AS vec_id, list(CAST(s AS FLOAT) ORDER BY i) AS embedding
               FROM summed GROUP BY doc_id),
             b AS (
               SELECT vec_id, embedding,
                 array_to_string(list_transform(list_slice(embedding, 1, 8),
                   x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
               FROM emb),
             pairs AS (
               SELECT a.vec_id AS doc_id, b2.vec_id AS corpus_id,
                 list_dot_product(a.embedding::double[], b2.embedding::double[]) /
                   (sqrt(list_dot_product(a.embedding::double[], a.embedding::double[])) *
                    sqrt(list_dot_product(b2.embedding::double[], b2.embedding::double[]))) AS c
               FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id
               WHERE a.vec_id % 10 >= 8
                 AND (b2.vec_id % 10 < 8
                      OR (b2.vec_id % 30) // 10 < (a.vec_id % 30) // 10))
             SELECT doc_id, corpus_id, round(c, 6) AS cosine FROM pairs
             WHERE c >= 0.9 ORDER BY doc_id, corpus_id""",
        // ingest-time span marking ≡ the batch probe of the same index:
        // delta grams whose digest the lake has seen, merged to maximal
        // per-doc spans (lake-hit grams only — intra-batch repeats are
        // the batch operator's contract)
        "stream_span_dedup" -> {
          val L = _root_.graft.queries.LlmQueries.SpanGramChars
          s"""WITH dgd AS (
               SELECT doc_id, pos,
                      ('0x' || substr(md5(substr(text, pos, $L)), 1, 15))::bigint AS h
               FROM (
                 SELECT doc_id,
                        unnest(generate_series(1, length(text) - ${L - 1}))::int AS pos,
                        text
                 FROM documents
                 WHERE doc_id % 10 >= 8 AND text IS NOT NULL
                   AND length(text) >= $L)),
             lidx AS (
               SELECT DISTINCT
                      ('0x' || substr(md5(substr(text, pos, $L)), 1, 15))::bigint AS h
               FROM (
                 SELECT unnest(generate_series(1, length(text) - ${L - 1}))::int AS pos,
                        text
                 FROM documents
                 WHERE doc_id % 10 < 8 AND text IS NOT NULL
                   AND length(text) >= $L)),
             pts AS (SELECT doc_id, pos FROM dgd WHERE h IN (SELECT h FROM lidx)),
             isl AS (
               SELECT doc_id, pos,
                      CASE WHEN pos > coalesce(max(pos + $L) OVER (
                             PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                           THEN 1 ELSE 0 END AS brk
               FROM pts),
             grp AS (
               SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM isl)
             SELECT doc_id, min(pos) AS span_start,
                    max(pos) + ${L - 1} AS span_end
             FROM grp GROUP BY doc_id, island
             ORDER BY doc_id, span_start"""
        },
        // the GROWING-index ingest: arrivals consumed as 3 deterministic
        // micro-batches (batch b = arrival docs with (doc_id%30)//10 == b,
        // in that order); each batch probes the index as of the PREVIOUS
        // batch and then appends its own grams via an exactly-once
        // manifest commit. So an arrival gram occurrence is marked iff
        // its digest is in the lake, OR an EARLIER batch carried it, OR
        // >=2 distinct docs of its OWN batch carry it — keep-first
        // across arrival order, replayed here without any index.
        "stream_span_dedup_growing" -> {
          val L = _root_.graft.queries.LlmQueries.SpanGramChars
          s"""WITH ag AS (
               SELECT doc_id, (doc_id % 30) // 10 AS b, pos,
                      ('0x' || substr(md5(substr(text, pos, $L)), 1, 15))::bigint AS h
               FROM (
                 SELECT doc_id,
                        unnest(generate_series(1, length(text) - ${L - 1}))::int AS pos,
                        text
                 FROM documents
                 WHERE doc_id % 10 >= 8 AND text IS NOT NULL
                   AND length(text) >= $L)),
             lidx AS (
               SELECT DISTINCT
                      ('0x' || substr(md5(substr(text, pos, $L)), 1, 15))::bigint AS h
               FROM (
                 SELECT unnest(generate_series(1, length(text) - ${L - 1}))::int AS pos,
                        text
                 FROM documents
                 WHERE doc_id % 10 < 8 AND text IS NOT NULL
                   AND length(text) >= $L)),
             firstb AS (SELECT h, min(b) AS minb FROM ag GROUP BY h),
             rep AS (
               SELECT h, b FROM ag
               GROUP BY h, b HAVING count(DISTINCT doc_id) >= 2),
             pts AS (
               SELECT g.doc_id, g.pos
               FROM ag g
               JOIN firstb f ON f.h = g.h
               LEFT JOIN rep r ON r.h = g.h AND r.b = g.b
               WHERE g.h IN (SELECT h FROM lidx)
                  OR g.b > f.minb
                  OR r.h IS NOT NULL),
             isl AS (
               SELECT doc_id, pos,
                      CASE WHEN pos > coalesce(max(pos + $L) OVER (
                             PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                           THEN 1 ELSE 0 END AS brk
               FROM pts),
             grp AS (
               SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM isl)
             SELECT doc_id, min(pos) AS span_start,
                    max(pos) + ${L - 1} AS span_end
             FROM grp GROUP BY doc_id, island
             ORDER BY doc_id, span_start"""
        },
        // streaming profile state folds micro-batch partials with the
        // same associative merges as the batch scan (decimal sums), so
        // the final state equals the one-shot profile over the same rows
        "stream_quality_profile" ->
          Seq("user_id", "value").map(c =>
            s"""SELECT '$c' AS "column", count(*) AS n_rows,
                  (count(*) - count($c))::bigint AS n_nulls,
                  round(min($c)::double, 6) AS min_v,
                  round(max($c)::double, 6) AS max_v,
                  round(sum($c::decimal(38,10))::double / count($c), 6) AS mean_v
                FROM events""")
            .mkString("", " UNION ALL ", " ORDER BY \"column\""),
        // per-rule violation counters accumulate as one associatively-
        // merged state row, so the final gate equals the batch census
        "stream_quality_gate" ->
          // fail-closed: a null predicate (null event_type under IN)
          // is a violation — CASE polarity puts null in the ELSE=1 arm
          """WITH v AS (
               SELECT
                 CASE WHEN event_type IN ('click','view','purchase','signup')
                      THEN 0 ELSE 1 END AS type_allowed,
                 CASE WHEN value <= 400.0 THEN 0 ELSE 1 END AS value_cap,
                 CASE WHEN value IS NULL THEN 1 ELSE 0 END AS value_nonnull
               FROM events)
             SELECT rule, n_rows FROM (
               SELECT 'type_allowed' AS rule, sum(type_allowed)::bigint AS n_rows FROM v
               UNION ALL SELECT 'value_cap', sum(value_cap)::bigint FROM v
               UNION ALL SELECT 'value_nonnull', sum(value_nonnull)::bigint FROM v
               UNION ALL SELECT '__clean',
                 sum(CASE WHEN type_allowed = 0 AND value_cap = 0
                           AND value_nonnull = 0 THEN 1 ELSE 0 END)::bigint FROM v)
             ORDER BY rule""")

  /** Headline subset timed by [[Bench]] at sf0.1 — one per operator family
    * (scan/agg, broadcast join chain, window, sessionize, CDC apply,
    * anti-join, dedup×3, ANN, text), so the benchmark tracks the plans that
    * matter at 100 TB rather than 30 near-duplicate scans. */
  val benchQueries: Seq[String] = Seq(
    "q1_agg", "q6_selective_agg", "q3_revenue_topn", "q5_local_supplier", "window_rank",
    "sessionize", "t1_cdc_apply", "j1_delete_reconcile", "o1_last_image",
    // (r18: sim_topk_brute and text_quality rotated out for the two
    // tokenizer apply paths below — brute cosine's plan class stays
    // covered by sim_topk_hash_embed, which runs the same exhaustive
    // kernel scan over derived embeddings, and text_quality's single-
    // pass codegen text scan by text_stats)
    "dedup_exact", "dedup_lsh_pairs", "dedup_jaccard", "dedup_simhash",
    "text_stats",
    // round 3-4 operator families — the most custom plans in the repo
    // (native TopKPerKey node, union-window as-of, binned range join,
    // int8 ANN, keyed funnel chain, multi-stage curation) need regression
    // signal just as much as the r1 headline set
    // (r16e: sim_topk_sq8 / sim_topk_pq / sim_topk_pq_rerank rotated out
    // for the new serve shapes — their plan classes stay covered by
    // sim_topk_sq8_rerank, sim_topk_pq_trained, and the pq/ivfpq serve
    // twins below; the compact bench line's capture-window budget caps
    // the list at ~60 worst-case-width names)
    "asof_join", "range_join", "topk_native",
    "funnel_stages", "curation_pipeline", "quantile_bin_sketch",
    "dedup_minhash_est", "sim_topk_ivf_probed", "sim_topk_sq8_rerank",
    // (r17: sim_topk_ivfpq rotated out for retrieval_mmr_served — its
    // plan class stays covered by sim_topk_ivfpq_residual, which runs
    // the same cluster-pruned ADC chain plus the residual refinement)
    "sim_topk_pq_trained",
    "sim_topk_hash_embed", "sim_topk_ivfpq_residual", "text_chunk",
    "text_bigram_lm", "dedup_edit_distance", "resample_ffill",
    // (r19: dedup_span_strip rotated out for the new-family rows — its
    // digest/probe chain stays priced by dedup_repeated_spans +
    // dedup_spans_incremental_serve, which share the plan class)
    "dedup_repeated_spans", "dedup_repeated_token_spans",
    "dedup_spans_incremental", "dedup_cross_corpus_indexed",
    // round 11 — the quality gates (single-pass scan shapes; the
    // index-lifecycle registry queries stay off the bench because their
    // time is the index BUILD they replay, not the maintenance op) and
    // the steady-state index SERVE paths (build-if-stale: the median of
    // 3 bench reps times the probe, which is what a deployment pays)
    "quality_profile", "quality_corpus_diff",
    "dedup_spans_incremental_serve", "dedup_cross_corpus_served",
    // round 13 — the persisted inverted file's and inverted index's
    // steady-state probes: the cluster-pruned scan and the term-pruned
    // postings scan are the 100 TB serve shapes (the lifecycle
    // build/append/refresh queries stay off the bench like the others)
    "sim_ivf_probe_served", "text_bm25_probe_served", "sim_pq_probe_served",
    // round 11b — corpus wordcount + bounded-heap report shape, and the
    // composed publish path (4 chained hash-decision stages + census)
    "text_top_ngrams", "curation_release",
    // round 15 — the metadata-at-scale scan (codegen'd AV container
    // header parse over every payload) and the DSIR selection pair
    // (histogram + broadcast log-ratio scoring; Gumbel-top-k draw)
    // (r19: curation_importance_resample rotated out — the DSIR pair's
    // cost is the weights leg; the Gumbel draw is a result-sized tail)
    "multimodal_av_headers", "curation_importance_weights",
    // round 15b — the two-stage feedback retrieval SERVE path (RM3 over
    // the committed inverted index: the steady-state expansion cost)
    // and cluster-scoped semantic dedup (kernel assignment + capped
    // within-cluster dominance screen)
    // (r19: the uncapped dedup_semdedup rotated out — the capped twin
    // below is the 100 TB shape and prices the same screen)
    "retrieval_rm3_served",
    // round 16 — SemDeDup with the maxCluster skew cap engaged (the
    // 100 TB boilerplate-clique shape; the uncapped twin above prices
    // the full dominance screen). The IVF-PQ growing ingest stays off
    // the bench like the other lifecycle queries: its time is the
    // build+grow replay, not a steady-state op.
    "dedup_semdedup_capped",
    // round 16b — the training-free compressed ANN serve shape (JL
    // coarse scan + exact rerank of the shortlist) and the diversified
    // re-rank (k greedy MMR steps over the relevance pool)
    "sim_topk_jl_rerank", "sim_topk_mmr",
    // round 16c — D4's data-pruning half: kernel assignment + ONE
    // cluster exchange shared by the rank and size windows
    "curation_prototype_prune",
    // round 16e — the positional serve shape (phrase probe over the
    // committed term-clustered pos table), the three-component SDM
    // ranking (the heaviest inline retrieval plan), and the trained
    // classifier's train+predict path (two wordcounts + broadcast
    // parameter join) — each a steady-state op a deployment times
    "retrieval_phrase_served", "retrieval_sdm", "text_nb_classify",
    // round 16d — the training-free compressed SERVE shape: coarse scan
    // over the STORED m-double projections (one snapshot resolves table
    // + (m, d)), exact rerank against the lake
    "sim_jl_probe_served",
    // round 17 — the diversified-page SERVE shape: exact BM25 pool off
    // the committed index + pool-member-only embeddings + k greedy
    // steps (build-if-stale, so the median times the probe). The phrase
    // growing ingest stays off the bench like every lifecycle query.
    "retrieval_mmr_served",
    // round 18 — the two tokenizer APPLY paths, the per-epoch
    // preprocessing scans a pretraining pipeline pays at full corpus
    // volume: BPE train (one wordcount + driver merges) + rank-priority
    // kernel apply, and unigram train (wordcount + driver EM) + Viterbi
    // kernel apply
    "text_bpe_tokenize", "text_unigram_tokenize",
    // round 19 — the three new operator families' production shapes:
    // byte-level BPE (byte-encode + rank-priority kernel, one
    // projection per word), pHash near-dup (codegen hash + pigeonhole
    // banded join, the image-dedup pass), and Dirichlet QLD served off
    // the committed inverted index (candidate-postings probe)
    "text_bpe_bytes", "dedup_phash", "retrieval_qld_served")
}
