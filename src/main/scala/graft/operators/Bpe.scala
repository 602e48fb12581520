package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the TOKENIZER-TRAINING primitive
  * of an LLM data pipeline (Sennrich, Haddow & Birch 2016; the same
  * word-level trainer shape sentencepiece/HF-tokenizers run): count the
  * corpus into a word-frequency table ONCE, then learn merges on that
  * vocab-sized frame — each step counts adjacent symbol pairs weighted
  * by word frequency, merges the most frequent pair (ties → smaller
  * (left, right) pair, so the merge list replays exactly in the
  * oracle), and rewrites the vocabulary. This is the GPT-2-style
  * intra-word variant (no end-of-word marker): merges never cross word
  * boundaries because symbols live inside per-word sequences.
  *
  * Scale shape (the whole point of the word-level trainer): the corpus
  * is touched EXACTLY ONCE (a wordcount — map-side combined, the
  * text_top_ngrams shape) plus once more at apply time; every merge
  * step runs on the capped word-frequency frame (`maxWords` top words
  * by (freq DESC, word ASC) through the bounded heap — the visible-drop
  * cap precedent; dropped tail words simply don't vote, exactly
  * sentencepiece's `vocab_size`/`min_frequency` pruning). The chosen
  * pair per step is a one-row driver scalar (the Lloyd-round
  * precedent), and APPLYING the learned merges is a stateless chain of
  * N string replaces — a pure map a 100 TB corpus runs at scan speed.
  *
  * Symbol mechanics, shared bit-for-bit with the DuckDB oracle: a
  * word's symbol sequence is one delimiter-wrapped string
  * `␟s1␟␟s2␟…␟sn␟` (␟ = U+001F, absent from any whitespace-split
  * token), and merging pair (a, b) is `replace(sym, "␟a␟␟b␟",
  * "␟ab␟")` — left-to-right, non-overlapping, each symbol's own
  * wrapping keeps shared-delimiter overlaps impossible ([a,a,a,a] under
  * (a,a) → [aa,aa], never [aa,a,a]), and both engines' `replace`
  * implement exactly that scan. BPE's standard string-identity caveat
  * applies: a merged symbol IS its concatenated string.
  */
object Bpe {

  /** Symbol delimiter (U+001F unit separator). Contract: it cannot
    * occur in corpus tokens — it is not producible by the whitespace
    * tokenization of any text column this repo's tables carry, and a
    * violating corpus would corrupt symbol boundaries silently, so
    * EVERY encode path ([[guardWord]] inside [[encodeWord]] — train and
    * apply alike) fails loud rather than trusting the caller. */
  private val D = "\u001f"

  private def encodeWord(word: Column): Column =
    concat(lit(D), array_join(split(guardWord(word), ""), D + D), lit(D))

  /** Fail-loud on a delimiter-bearing token — at TRAIN and APPLY alike:
    * tokenizeM's whole point is applying a pinned merge table to NEW
    * corpora, where a U+001F in the text would silently splice symbol
    * boundaries if only the training vocabulary were guarded. One
    * codegen'd contains() per token. */
  private def guardWord(word: Column): Column =
    when(word.contains(D),
      raise_error(lit("Bpe: corpus token contains the U+001F symbol " +
        "delimiter — symbol boundaries would corrupt")))
      .otherwise(word)

  private def decodeSyms(sym: Column): Column =
    split(sym.substr(lit(2), length(sym) - 2), D + D)

  /** The training table: ONE corpus wordcount, capped to the `maxWords`
    * most frequent words (ties → smaller word) via the bounded heap —
    * `(word, n, sym)` with `sym` the char-level symbol encoding. */
  def wordFreqs(
      docs: DataFrame, textCol: String, maxWords: Int): DataFrame = {
    require(maxWords > 0, s"maxWords=$maxWords must be positive")
    val wf = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    TopK.perKey(wf.withColumn("__g", lit(0)), Seq("__g"),
        Seq(col("n").desc, col("word").asc), maxWords)
      .drop("__g")
      .select(col("word"), col("n"), encodeWord(col("word")).as("sym"))
  }

  /** Learn `nMerges` BPE merges over the corpus. Returns the merge
    * table `(step, lhs, rhs, pair_count)` — step 1-based in learning
    * order, `pair_count` the frequency-weighted adjacent-pair count the
    * step merged. Stops early (fewer rows) if the vocabulary runs out
    * of adjacent pairs. Driver loop over PLAN construction: each step
    * is one vocab-sized pair aggregate + a one-row collect + one
    * appended string replace; the frame re-checkpoints every
    * [[CheckpointEvery]] steps so the replace chain (and its
    * re-execution cost) stays bounded for real vocab-scale merge
    * counts. */
  def learnMerges(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnedMerges(docs, textCol, nMerges, maxWords)
      .toDF("step", "lhs", "rhs", "pair_count")
  }

  /** How many chained replace steps accumulate before the vocabulary
    * frame re-materializes: each step's aggregate re-executes the whole
    * chain above the last checkpoint, so unbounded chaining would cost
    * O(steps²) replaces (and an ever-growing plan) over a real
    * tokenizer's thousands of merges. */
  private val CheckpointEvery = 8

  /** Release a localCheckpoint'd frame's backing blocks. `Dataset
    * .unpersist` is a NO-OP for checkpointed frames — it only uncaches
    * CacheManager (`.persist()`) entries, while the checkpoint's blocks
    * belong to the LogicalRDD it left behind (probed empirically on
    * this Spark: getPersistentRDDs is unchanged by Dataset.unpersist
    * and emptied by the RDD-level call). */
  private def releaseCkpt(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** The learning loop, returning the merge tuples driver-side — shared
    * by [[learnMerges]] (frame output) and [[tokenizeWithMerges]]'s
    * registry composition (merge list input). Releases every vocabulary
    * checkpoint before returning. */
  def learnedMerges(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int): Seq[(Int, String, String, Long)] = {
    val (merges, _, release) = learnLoop(docs, textCol, nMerges, maxWords)
    release()
    merges
  }

  /** The loop's full state: merge tuples, the FINAL rewritten vocabulary
    * frame (lazy, chained on the last checkpoint — [[vocab]] aggregates
    * it instead of re-learning + re-scanning the corpus), and the
    * release handle for the one checkpoint still held. Superseded
    * checkpoints release AS the loop runs ([[releaseCkpt]] — at a real
    * tokenizer's thousands of merges, O(steps/8) retained vocab frames
    * would otherwise pile into the block manager). */
  private def learnLoop(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int): (Seq[(Int, String, String, Long)], DataFrame, () => Unit) = {
    require(nMerges > 0, s"nMerges=$nMerges must be positive")
    var ckpt = wordFreqs(docs, textCol, maxWords).localCheckpoint()
    var cur = ckpt
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= nMerges && !exhausted) {
      val syms = decodeSyms(col("sym"))
      val pairs = cur.select(col("n"),
          explode(zip_with(
            slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("n")).cast("long").as("cnt"))
      // the winning pair: a ONE-ROW driver scalar (the Lloyd-round
      // precedent) — ties break to the smaller (a, b) for exact replay
      val best = pairs.orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((t, a, b, cnt))
        cur = cur.withColumn("sym", call_function("replace", col("sym"),
          lit(D + a + D + D + b + D), lit(D + a + b + D)))
        if (t % CheckpointEvery == 0) {
          val next = cur.localCheckpoint()
          releaseCkpt(ckpt)
          ckpt = next
          cur = next
        }
        t += 1
      }
    }
    val held = ckpt
    (out.result(), cur, () => releaseCkpt(held))
  }

  /** The learned tokenizer's VOCABULARY census — the artifact a
    * fertility/coverage analysis consumes: after `nMerges` merges, the
    * symbol inventory of the (capped) training word table with
    * frequency-weighted occurrence counts — `(symbol, n_occ)`. Bounded
    * by |distinct chars| + nMerges symbols; derived from the SAME
    * capped word-frequency frame the merges trained on, so counts are
    * the training-corpus census (tail words beyond `maxWords` don't
    * count here either — consistent with their zero training vote). */
  def vocab(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int): DataFrame = {
    // the loop's FINAL frame already holds the rewritten vocabulary —
    // aggregating it avoids a second corpus scan and a replayed merge
    // fold; the symbol-sized result materializes eagerly so the loop's
    // checkpoint releases in the finally
    val (_, fin, release) = learnLoop(docs, textCol, nMerges, maxWords)
    try fin
      .select(col("n"), explode(decodeSyms(col("sym"))).as("symbol"))
      .groupBy(col("symbol"))
      .agg(sum(col("n")).cast("long").as("n_occ"))
      .localCheckpoint(true)
    finally release()
  }

  /** APPLY learned merges to the corpus — the deployment half: every
    * document's tokens run the same N-replace chain (a stateless,
    * WholeStageCodegen'd pure map — at 100 TB this is the scan-speed
    * tokenization pass a training-data pipeline pays per epoch of
    * preprocessing), and the per-doc output is the token accounting a
    * packing/budgeting stage consumes: `(id, n_words, n_bpe_tokens)`.
    * NULL-text docs are absent (nothing to tokenize — the classifier's
    * absent-unclassifiable contract). */
  // ---- Merge-table model store under the atomic manifest protocol -----
  //
  // TOKENIZER VERSIONING — the reproducibility contract an LLM pipeline
  // actually signs: the merge list IS the tokenizer, and the dataset a
  // training run packed must replay with the exact merge table it was
  // tokenized with, not whatever a later retrain produced. Same shape as
  // the NB model store: one committed table, retrain = one atomic
  // expect-guarded swap, `at` pins the version a release shipped with.

  private val MergesTable = "merges"

  /** Learn and commit the merge table at `root`. A retrain over the
    * same root swaps the table in one atomic commit; concurrent readers
    * keep resolving the version their snapshot pinned. */
  def buildBpeModelM(
      docs: DataFrame, textCol: String, nMerges: Int, maxWords: Int,
      root: String): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cur = graft.index.IndexManifest.currentVersion(spark, root)
    val snap =
      if (cur > 0L) Some(graft.index.IndexManifest.snapshotAt(spark, root, cur))
      else None
    val seg = graft.index.IndexManifest.newSegment(MergesTable)
    learnedMerges(docs, textCol, nMerges, maxWords)
      .toDF("step", "lhs", "rhs", "pair_count")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$seg")
    graft.index.IndexManifest.commit(spark, root,
      snap.map(_.tables).getOrElse(Map.empty)
        .updated(MergesTable, Seq(seg)),
      expect = snap.map(_.version),
      meta = Map("family" -> "bpemodel"))
  }

  /** The committed merge list in learning order (`at` pins a version) —
    * an N-row driver scalar, the model every tokenization plan inlines. */
  def mergesM(
      spark: org.apache.spark.sql.SparkSession, root: String,
      at: Option[Long] = None): Seq[(String, String)] = {
    val snap = at
      .map(v => graft.index.IndexManifest.snapshotAt(spark, root, v))
      .getOrElse(graft.index.IndexManifest.snapshot(spark, root))
    graft.index.IndexManifest.readAt(spark, root, snap, MergesTable)
      .orderBy(col("step"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Tokenize against a committed merge-table version. */
  def tokenizeM(
      spark: org.apache.spark.sql.SparkSession, root: String,
      docs: DataFrame, idCol: String, textCol: String,
      at: Option[Long] = None): DataFrame =
    tokenizeWithMerges(docs, idCol, textCol, mergesM(spark, root, at))

  def tokenizeWithMerges(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sym0 = encodeWord(col("word"))
    val symN = merges.foldLeft(sym0) { case (s, (a, b)) =>
      call_function("replace", s, lit(D + a + D + D + b + D), lit(D + a + b + D))
    }
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col(idCol), size(split(symN, D + D)).as("__k"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__k")).cast("long").as("n_bpe_tokens"))
  }
}
