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

  /** The trained model as one dense DataFrame of
    * `(term, label, loglik, logprior)` — vocab×labels rows, every
    * (in-vocab term, label) pair present (unseen-in-class pairs carry
    * the smoothed default ln(1/(tokens_c+|V|))), priors denormalized
    * per row so scoring needs exactly one broadcast join. */
  def nbTrain(
      labeled: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val toks = labeled
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    // the class-term counts feed THREE consumers (the vocab-size scalar,
    // the per-label token totals, and the densify join) — cache the
    // aggregate once instead of re-tokenizing the seed per consumer
    // (lazy, evictable; the importanceWeights precedent: the cache must
    // outlive this call because the returned model is lazy — registry/
    // bench paths are covered by the harness-global unpersist, and a
    // long-lived service should materialize the model and release
    // persistent RDDs itself)
    val ctc = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    // vocab size and doc totals: contract-small driver scalars (the
    // corpusStats precedent)
    val vsize = ctc.select(col("term")).distinct().count()
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

  /** Classify: the argmax label per document (ties → smaller label),
    * via the bounded-heap top-k. Output `(id, predicted, score)`. */
  def nbClassify(
      model: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sc = nbScores(model, docs, idCol, textCol)
    TopK.perKey(sc, Seq(idCol),
        Seq(col("score").desc, col("label").asc), 1)
      .select(col(idCol), col("label").as("predicted"), col("score"))
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
      root: String): Long = {
    val spark = labeled.sparkSession
    val cur = graft.index.IndexManifest.currentVersion(spark, root)
    val snap =
      if (cur > 0L) Some(graft.index.IndexManifest.snapshotAt(spark, root, cur))
      else None
    val seg = graft.index.IndexManifest.newSegment(ParamsTable)
    nbTrain(labeled, labelCol, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$seg")
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
