package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained text classification — the "classifier filter" stage of the
  * published curation pipelines (CCNet's fastText language/quality
  * filters, DCLM's and FineWeb-Edu's quality classifiers): train on a
  * labeled seed, score the lake, keep/route by predicted label. The
  * model here is multinomial Naive Bayes with add-one smoothing — the
  * closed-form member of the linear-classifier family those pipelines
  * use: training is TWO grouped counts (no iterations, no gradients —
  * the exact-replay discipline the oracle gate demands), the parameter
  * table is vocab×labels rows (fastText's parameter shape), and
  * scoring is one broadcast join + a keyed decimal sum at scan speed.
  *
  * Scale shape (the 100 TB contract):
  *   - Train: one tokenize pass over the SEED (seeds are small by
  *     construction — labeled data is the scarce input), two wordcount
  *     aggregates, three broadcast-sized scalars/frames.
  *   - Score: the corpus tokenize stream joins the BROADCAST dense
  *     parameter table (vocab×labels — the model, not the data), one
  *     keyed sum per (doc, label), bounded-heap argmax. The corpus
  *     never shuffles except the per-doc score aggregate.
  *   - Every log value is rounded to the 1e-6 grid at the leaf and
  *     summed in DECIMAL(18,9), so predictions replay bit-for-bit in
  *     the DuckDB oracle.
  *
  * Semantics notes: out-of-vocabulary tokens are dropped at score time
  * (the standard multinomial-NB treatment — they carry no trained
  * signal); a document with NO in-vocabulary tokens is absent from the
  * output (unclassifiable — the caller decides its fate, the
  * classifier never invents a label). Ties break to the
  * lexicographically smaller label.
  */
object Classify {

  /** Hard ceiling on the UNCAPPED trainer's vocabulary. The dense
    * parameter table is vocab×labels rows and is `broadcast()` at score
    * time by contract; at this ceiling a 4-label model is ~1M rows
    * (tens of MB serialized) — the top of the comfortable broadcast
    * band. A labeled seed whose vocabulary exceeds it is no longer
    * "small by construction" and must either pass through
    * [[nbTrainCapped]] (top-V truncation, the standard fastText
    * `-hash`/vocab-prune treatment) or raise the ceiling DELIBERATELY
    * via the `maxVocab` parameter. Counted fail-loud, never a silent
    * executor OOM three stages later (the `probeBroadcastCap` /
    * `staleBroadcastCap` precedent). */
  val DefaultMaxVocab: Int = 1 << 18

  /** The trained model as one dense DataFrame of
    * `(term, label, loglik, logprior)` — vocab×labels rows, every
    * (in-vocab term, label) pair present (unseen-in-class pairs carry
    * the smoothed default ln(1/(tokens_c+|V|))), priors denormalized
    * per row so scoring needs exactly one broadcast join. Fails loud
    * (cap named) when the seed vocabulary exceeds `maxVocab` — see
    * [[DefaultMaxVocab]]; an over-cap seed wants [[nbTrainCapped]]. */
  def nbTrain(
      labeled: DataFrame, labelCol: String, textCol: String,
      maxVocab: Int = DefaultMaxVocab): DataFrame =
    nbTrainCached(labeled, labelCol, textCol, maxVocab)._1

  /** Top-V-truncated trainer — the over-cap seed's sanctioned path:
    * the vocabulary keeps the `vocabCap` terms with the highest TOTAL
    * class count (ties → lexicographically smaller term, so the kept
    * set replays exactly in the oracle); every other term drops from
    * the model VISIBLY (the `dedup_semdedup_capped` discipline — tail
    * terms carry no row, documents whose every token dropped are
    * absent-unclassifiable like any all-OOV document). Smoothing uses
    * the KEPT vocabulary size — the model is exactly multinomial NB
    * over the reduced feature set, not an approximation of the full
    * one. Selection is a bounded-heap top-k over the term totals (one
    * exchange of `vocabCap` rows, never a global sort), and the kept
    * vocab frame — cap-bounded by construction — broadcasts into the
    * count filter. */
  def nbTrainCapped(
      labeled: DataFrame, labelCol: String, textCol: String,
      vocabCap: Int): DataFrame =
    cappedModelFrom(labeled, labelCol, textCol,
      classTermCounts(labeled, labelCol, textCol), vocabCap)

  /** The top-V trainer over an already-built (cached) count frame —
    * shared by [[nbTrainCapped]] (lazy return, harness-released cache)
    * and [[buildNbModelM]]'s capped path (eager write, finally-released
    * cache). */
  private def cappedModelFrom(
      labeled: DataFrame, labelCol: String, textCol: String,
      ctc: DataFrame, vocabCap: Int): DataFrame = {
    require(vocabCap > 0, s"vocabCap=$vocabCap must be positive")
    val vocab = TopK.perKey(
        ctc.groupBy(col("term"))
          .agg(sum(col("cnt")).cast("long").as("__tc"))
          .withColumn("__g", lit(0)),
        Seq("__g"), Seq(col("__tc").desc, col("term").asc), vocabCap)
      .select(col("term"))
    modelFrom(labeled, labelCol, textCol,
      ctc.join(broadcast(vocab), Seq("term")), vsizeKnown = None)
  }

  /** [[nbTrain]] plus the class-term-count cache HANDLE, so a caller
    * that materializes the model eagerly ([[buildNbModelM]]) can
    * release the cached blocks in a finally instead of leaking them for
    * the session's lifetime. The plain [[nbTrain]]'s lazy return keeps
    * the cache alive by necessity — registry/bench paths are covered by
    * the harness-global unpersist, and a long-lived service should
    * train through the model store (which cleans up) or materialize and
    * release persistent RDDs itself. */
  private def nbTrainCached(
      labeled: DataFrame, labelCol: String, textCol: String,
      maxVocab: Int): (DataFrame, DataFrame) = {
    val ctc = classTermCounts(labeled, labelCol, textCol)
    // the guard's count is the one eager action this builder runs (the
    // cap must fail at call time, not three stages later); when it
    // throws — or the count itself dies — the just-persisted count frame
    // must not leak for the session's lifetime, since the thrower's
    // caller never receives a handle to release
    val vsize =
      try {
        val v = ctc.select(col("term")).distinct().count()
        require(v <= maxVocab,
          s"nbTrain: seed vocabulary $v exceeds maxVocab=$maxVocab — the " +
            "dense vocab×labels parameter table is broadcast at score time; " +
            "truncate with nbTrainCapped(vocabCap) or raise maxVocab deliberately")
        v
      } catch { case t: Throwable =>
        ctc.unpersist(blocking = false)
        throw t
      }
    (modelFrom(labeled, labelCol, textCol, ctc, vsizeKnown = Some(vsize)), ctc)
  }

  /** One tokenize pass over the seed → per-(label, term) counts,
    * CACHED: the aggregate feeds three consumers (the vocab scalar /
    * top-V selection, the per-label token totals, and the densify
    * join) — lazy, evictable; see [[nbTrainCached]] for the lifecycle
    * contract. */
  private def classTermCounts(
      labeled: DataFrame, labelCol: String, textCol: String): DataFrame =
    // NOT widened (r21 A/B): neutral-to-loss on the r21 host (seeds are
    // small by construction; numbers in OPTIMIZATION_r21.md)
    labeled.filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .persist()

  /** The closed-form model over an (already vocab-restricted) count
    * frame `(label, term, cnt)`: per-label priors and token totals,
    * add-one smoothing over the frame's own vocabulary, densified to
    * vocab×labels. Shared by the capped and uncapped trainers. */
  private def modelFrom(
      labeled: DataFrame, labelCol: String, textCol: String,
      ctc: DataFrame, vsizeKnown: Option[Long]): DataFrame = {
    // vocab size and doc totals: contract-small driver scalars (the
    // corpusStats precedent); the uncapped path already counted it for
    // the maxVocab guard and threads it through instead of recounting
    val vsize = vsizeKnown.getOrElse(
      ctc.select(col("term")).distinct().count())
    require(vsize > 0, "nbTrain: the labeled seed has no non-empty tokens")
    val docsPerLabel = labeled
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("dn"))
    val nDocs = labeled
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull).count()
    val tokC = ctc.groupBy(col("label"))
      .agg(sum(col("cnt")).cast("long").as("tok_c"))
    // per-label scalars: logprior + the unseen-in-class default — a
    // labels-sized frame, broadcast everywhere below
    val pri = docsPerLabel.join(tokC, Seq("label"))
      .select(col("label"),
        round(log(col("dn").cast("double") / lit(nDocs.toDouble)), 6)
          .as("logprior"),
        round(log(lit(1.0) / (col("tok_c") + lit(vsize)).cast("double")), 6)
          .as("logdef"),
        col("tok_c"))
    // densify to vocab×labels so a score-time join never misses a
    // (term, label) pair: broadcast-small-by-contract cross of the
    // vocab frame with the labels frame
    ctc.select(col("term")).distinct()
      .crossJoin(broadcast(pri))
      .join(ctc, Seq("term", "label"), "left")
      .select(col("term"), col("label"),
        coalesce(
          round(log((col("cnt") + lit(1)).cast("double") /
            (col("tok_c") + lit(vsize)).cast("double")), 6),
          col("logdef")).as("loglik"),
        col("logprior"))
  }

  /** Per-document label scores against a trained model:
    * `(id, label, score)` for every label, score = logprior +
    * Σ_tokens loglik (multiplicity counted), round-6/decimal-summed. */
  def nbScores(
      model: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .join(broadcast(model), Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(round(
        sum(col("loglik").cast("decimal(18,9)")) +
          max(col("logprior")).cast("decimal(18,9)"), 6)
        .cast("double").as("score"))

  /** Labels past this count fall back to the generic heap-argmax path:
    * the fused classifier below generates one sum aggregate and one
    * CASE-fold arm per label, which is the fast shape for the handful-
    * of-classes models NB serves but a degenerate expression tree for a
    * pathological thousand-label frame. */
  val FusedArgmaxLabelCap: Int = 64

  /** Classify: the argmax label per document (ties → smaller label).
    * Output `(id, predicted, score)`.
    *
    * r20 shape (guide §2.3 — aggregate fewer rows): the label set is a
    * handful of rows with a constant per-label prior (both trainers and
    * the model store densify exactly that), so it collects to the
    * driver (contract-small, the centroid/codebook class) and the dense
    * vocab×labels table pivots to ONE row per term (L conditional
    * decimal-sum columns — duplicate (term, label) rows sum exactly as
    * the heap path sums them). Scoring then
    * joins each token ONCE (not once per label), aggregates L parallel
    * decimal sums keyed by id alone, and the argmax is a driver-built
    * CASE fold over the L score columns — labels sorted ascending and
    * replaced only on strictly-greater score, which IS the heap's
    * (score DESC, label ASC) tie rule. The corpus-sized token stream
    * shrinks ×L through the join and the aggregate, and the heap
    * exchange disappears; every addend, decimal cast, and round is the
    * one the per-(id, label) sum fed, so scores are bit-identical
    * (ClassifySpec + the four nb oracle rows pin it). Models that break
    * the dense contract (non-constant per-label prior) or exceed
    * [[FusedArgmaxLabelCap]] keep the generic heap path.
    *
    * CACHE LIFECYCLE: the model frame persists (lazily, evictable) for
    * the life of the returned lazy plan — it feeds both the label
    * collect here and the pivot/scoring join at execution time, so it
    * cannot be unpersisted inside this call. Registry/bench paths are
    * covered by the harness-global unpersist after each query; a
    * long-lived service should either classify through the model store
    * (parquet-backed, nothing to cache) or release persistent RDDs
    * after materializing the result (the [[importanceWeights]]
    * precedent). */
  def nbClassify(
      model: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // the parameter frame feeds TWO consumers (the label/prior collect
    // and the pivot) — cache it so the inline trainer's densify plan
    // computes once (lazy, evictable; the harness-global unpersist and
    // the model store's parquet scan cover the lifecycle, the nbTrain
    // ctc precedent)
    val m = model.persist()
    val labels = m.select(col("label"), col("logprior")).distinct()
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val dense = labels.nonEmpty && labels.length <= FusedArgmaxLabelCap &&
      labels.map(_._1).distinct.length == labels.length
    if (!dense) {
      val sc = nbScores(m, docs, idCol, textCol)
      return TopK.perKey(sc, Seq(idCol),
          Seq(col("score").desc, col("label").asc), 1)
        .select(col(idCol), col("label").as("predicted"), col("score"))
    }
    // One pivoted row per term: L conditional decimal sums instead of a
    // map_from_entries build — same one-broadcast-join shape, but (a) no
    // per-row map allocation / element_at lookups, and (b) a model with
    // duplicate (term, label) rows SUMS their logliks exactly as the
    // generic heap path does (map_from_entries would throw under the
    // default EXCEPTION key-dedup policy — the r20 dense-gate hole).
    // Decimal addition is associative, so pre-summing duplicates per
    // (term, label) before the per-document sum is bit-identical to the
    // old flat sum over token×label rows.
    val pivotAggs = labels.indices.map(i =>
      sum(when(col("label") === labels(i)._1, col("loglik"))
        .cast("decimal(18,9)")).as(s"__p$i"))
    val pivoted = m.groupBy(col("term"))
      .agg(pivotAggs.head, pivotAggs.tail: _*)
    val sums = labels.indices.map(i =>
      sum(col(s"__p$i")).as(s"__s$i"))
    val scoreCols = labels.indices.map(i =>
      round(col(s"__s$i") +
          lit(labels(i)._2).cast("decimal(18,9)"), 6)
        .cast("double").as(s"__sc$i"))
    val scored = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .join(broadcast(pivoted), Seq("term"))
      .groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol) +: scoreCols: _*)
    // argmax as greatest() + a LINEAR first-match when-chain (the
    // first score column equal to the max belongs to the smallest
    // label — exactly the heap's (score DESC, label ASC) tie rule). A
    // pairwise when-fold here duplicates the running-best expression
    // into both branches of every step — exponential tree growth that
    // measured as tens of seconds of optimizer time.
    val scs = labels.indices.map(i => col(s"__sc$i"))
    val bestS = if (scs.length == 1) scs.head else greatest(scs: _*)
    val bestL = labels.indices.drop(1).foldLeft(
        when(scs(0) === col("__best"), lit(labels(0)._1))) { (acc, i) =>
      acc.when(scs(i) === col("__best"), lit(labels(i)._1))
    }
    scored.withColumn("__best", bestS)
      .select(col(idCol), bestL.as("predicted"), col("__best").as("score"))
  }

  // ---- Model store under the atomic manifest protocol ------------------
  //
  // The train-once / serve-forever deployment shape: the dense
  // parameter table persists as one committed manifest table, so every
  // scoring job (batch backfill, streaming ingest, a replayed release)
  // reads the SAME frozen parameters — retraining commits a replacement
  // segment atomically (expect-guarded), and `at` pins the model
  // version a release actually shipped with.

  private val ParamsTable = "params"

  /** Train and commit the model at `root`. A retrain over the same root
    * swaps the params table in one atomic commit (never a partial mix
    * of old and new parameters); concurrent readers keep resolving the
    * version their snapshot pinned. */
  def buildNbModelM(
      labeled: DataFrame, labelCol: String, textCol: String,
      root: String, maxVocab: Int = DefaultMaxVocab,
      vocabCap: Option[Int] = None): Long = {
    val spark = labeled.sparkSession
    val cur = graft.index.IndexManifest.currentVersion(spark, root)
    val snap =
      if (cur > 0L) Some(graft.index.IndexManifest.snapshotAt(spark, root, cur))
      else None
    val seg = graft.index.IndexManifest.newSegment(ParamsTable)
    // the parquet write MATERIALIZES the model, so the seed's class-term
    // count cache releases here eagerly instead of leaking for the
    // session's lifetime (the importanceResample discipline). vocabCap
    // routes an over-cap seed through the top-V trainer — the sanctioned
    // remedy must be reachable ON the train-once/serve-forever path, not
    // just named in the fail-loud message.
    val (model, cache) = vocabCap match {
      case Some(cap) =>
        val ctc = classTermCounts(labeled, labelCol, textCol)
        (cappedModelFrom(labeled, labelCol, textCol, ctc, cap), ctc)
      case None => nbTrainCached(labeled, labelCol, textCol, maxVocab)
    }
    try model.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$seg")
    finally cache.unpersist()
    graft.index.IndexManifest.commit(spark, root,
      snap.map(_.tables).getOrElse(Map.empty)
        .updated(ParamsTable, Seq(seg)),
      expect = snap.map(_.version),
      meta = Map("family" -> "nbmodel"))
  }

  /** Classify against a committed model version (`at` pins one). */
  def nbClassifyM(
      spark: org.apache.spark.sql.SparkSession, root: String,
      docs: DataFrame, idCol: String, textCol: String,
      at: Option[Long] = None): DataFrame = {
    val snap = at
      .map(v => graft.index.IndexManifest.snapshotAt(spark, root, v))
      .getOrElse(graft.index.IndexManifest.snapshot(spark, root))
    nbClassify(
      graft.index.IndexManifest.readAt(spark, root, snap, ParamsTable),
      docs, idCol, textCol)
  }
}
