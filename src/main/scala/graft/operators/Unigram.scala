package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{UnigramKernel, UnigramPieceTableRef, UnigramTokenCount}

/** Unigram-LM tokenizer training (Kudo 2018 — the sentencepiece
  * subword-regularization model's inference-time core): a piece
  * vocabulary with log-probabilities, under which a word tokenizes to
  * its maximum-likelihood segmentation (Viterbi). The OTHER half of the
  * tokenizer-training surface an LLM pipeline chooses between —
  * [[Bpe]] grows symbols bottom-up by merge rank; unigram starts from
  * an over-complete substring seed and keeps the pieces the corpus's
  * own best segmentations actually use.
  *
  * This implementation is the DETERMINISTIC, oracle-replayable member
  * of the family (the Lloyd/NB exact-replay discipline): hard EM
  * (Viterbi counts, not forward-backward expectations) for a FIXED
  * iteration count, add-one smoothing, micro-log integer probabilities
  * (`round(ln p · 10⁶)` — the round-6 grid as a Long, so every DP
  * comparison is exact integer arithmetic), and total-order tie-breaks
  * everywhere (count DESC, piece ASC by codepoint; in the DP: cost
  * DESC, pieces ASC, length DESC). Kudo's full recipe runs soft EM
  * with pruning-by-likelihood-loss; hard EM with count pruning is the
  * standard deterministic simplification and keeps the entire training
  * replayable as unrolled SQL.
  *
  * Scale shape — the [[Bpe]] contract exactly: ONE corpus wordcount
  * (capped top-`maxWords` through the bounded heap — the visible-drop
  * precedent), seed/EM/pruning driver-side over the contract-small
  * collected table (each EM iteration is one Viterbi pass over
  * ≤ maxWords words — milliseconds), and tokenization a stateless
  * per-row kernel projection ([[graft.functions.UnigramTokenCount]],
  * O(len × maxPieceLen) per word) a 100 TB corpus runs at scan speed.
  *
  * Coverage: every single codepoint of the capped training words is a
  * piece (sentencepiece's character coverage); a codepoint NEVER seen
  * in training scores the fixed [[UnigramKernel.UnkLlkMicro]] penalty
  * as its own UNK piece, so every word segments deterministically.
  */
object Unigram {

  /** The trained model: pieces with micro-log probabilities, plus the
    * DP's piece-length bound. */
  final case class UnigramModel(
      pieces: Seq[(String, Long)], maxPieceLen: Int) {
    def ref: UnigramPieceTableRef = new UnigramPieceTableRef(
      pieces.map(_._1).toArray, pieces.map(_._2).toArray, maxPieceLen)
  }

  /** `round(ln(c / tot) · 10⁶)` half away from zero — Spark `round`'s
    * own BigDecimal(valueOf) path (the PqKernel.round6 precedent), so
    * the oracle's `round(ln(c::double / tot) * 1000000)::bigint`
    * replays it exactly. */
  private def microLog(c: Long, tot: Long): Long =
    BigDecimal(Math.log(c.toDouble / tot.toDouble) * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  private def cpSplitLens(w: String): Int = w.codePointCount(0, w.length)

  /** Learn a unigram-LM tokenizer. One Spark job (the capped
    * wordcount); everything after runs driver-side on the collected
    * table. Steps, each deterministic and oracle-unrolled:
    *  1. SEED: every substring of 1..`maxPieceLen` codepoints of every
    *     capped word, counted freq-weighted (with multiplicity). ALL
    *     single-codepoint pieces are kept; multi-codepoint pieces keep
    *     the top `seedMulti` by (count DESC, piece ASC). Initial
    *     probabilities ∝ seed counts.
    *  2. EM × `emIters`: E: Viterbi-segment every capped word under
    *     the current probabilities; count pieces freq-weighted. M:
    *     add-one smoothing over the WHOLE seed (unused pieces stay
    *     alive at count 1), renormalize, re-quantize to micro-log.
    *  3. PRUNE: keep all singles + the top `vocabMulti` multi pieces
    *     by final smoothed count (ties → smaller piece); renormalize
    *     over the kept set — the final model.
    */
  def learn(
      docs: DataFrame, textCol: String, maxWords: Int,
      maxPieceLen: Int, seedMulti: Int, vocabMulti: Int,
      emIters: Int): UnigramModel = {
    require(maxPieceLen > 0, s"maxPieceLen=$maxPieceLen must be positive")
    require(seedMulti >= vocabMulti,
      s"seedMulti=$seedMulti must be >= vocabMulti=$vocabMulti")
    require(emIters >= 0, s"emIters=$emIters must be non-negative")
    require(maxWords <= Bpe.DriverLearnMaxWords,
      s"Unigram.learn: maxWords=$maxWords exceeds " +
        s"DriverLearnMaxWords=${Bpe.DriverLearnMaxWords}")
    val table = Bpe.wordFreqs(docs, textCol, maxWords)
      .select(col("word"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnLocal(table, maxPieceLen, seedMulti, vocabMulti, emIters)
  }

  /** The driver-side trainer over an already-capped word table. */
  def learnLocal(
      wordFreq: Seq[(String, Long)], maxPieceLen: Int,
      seedMulti: Int, vocabMulti: Int, emIters: Int): UnigramModel = {
    // 1. seed counts: all substrings of 1..maxPieceLen codepoints
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, n) =>
      val nCp = cpSplitLens(w)
      val start = UnigramKernel.cpStarts(w)
      var i = 0
      while (i < nCp) {
        var l = 1
        while (l <= maxPieceLen && i + l <= nCp) {
          val p = w.substring(start(i), start(i + l))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          l += 1
        }
        i += 1
      }
    }
    val (singles, multis) =
      counts.toSeq.partition(p => cpSplitLens(p._1) == 1)
    def topBy(xs: Seq[(String, Long)], k: Int): Seq[(String, Long)] =
      xs.sortWith { case ((pa, ca), (pb, cb)) =>
        ca > cb || (ca == cb && Bpe.cpCompare(pa, pb) < 0)
      }.take(k)
    var vocab: Seq[(String, Long)] = singles ++ topBy(multis, seedMulti)
    def quantize(v: Seq[(String, Long)]): UnigramModel = {
      val tot = v.map(_._2).sum
      UnigramModel(
        v.map { case (p, c) => (p, microLog(c, tot)) }
          .sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0),
        maxPieceLen)
    }
    // 2. hard EM: Viterbi counts + add-one smoothing over the seed
    var iter = 0
    while (iter < emIters) {
      val model = quantize(vocab)
      val ref = model.ref
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      wordFreq.foreach { case (w, n) =>
        val out = new java.util.ArrayList[String]()
        UnigramKernel.viterbi(w, ref, out)
        var i = 0
        while (i < out.size()) {
          val p = out.get(i)
          used.update(p, used.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      vocab = vocab.map { case (p, _) => (p, used.getOrElse(p, 0L) + 1L) }
      iter += 1
    }
    // 3. prune to singles + top vocabMulti multis, renormalize
    val (s2, m2) = vocab.partition(p => cpSplitLens(p._1) == 1)
    quantize(s2 ++ topBy(m2, vocabMulti))
  }

  /** The model as a frame — `(piece, llk)` with llk the micro-log
    * integer (the store/pieces-census artifact). */
  def piecesFrame(
      spark: org.apache.spark.sql.SparkSession,
      model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "llk")
  }

  /** Tokenize the corpus — `(id, n_words, n_unigram_tokens)`: the
    * whitespace words of every doc run the Viterbi kernel as a pure
    * projection; NULL-text docs are absent (the [[Bpe]] contract). */
  def tokenize(
      docs: DataFrame, idCol: String, textCol: String,
      model: UnigramModel): DataFrame = {
    val kCount = org.apache.spark.sql.GraftSqlBridge.column(
      UnigramTokenCount(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quoted("word"),
        model.ref))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col(idCol), kCount.as("__k"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__k")).cast("long").as("n_unigram_tokens"))
  }

  // ---- Piece-table model store under the atomic manifest protocol -----
  //
  // The same TOKENIZER-VERSIONING contract as the BPE store: the piece
  // table IS the tokenizer; retrain = one atomic expect-guarded swap,
  // `at` pins the version a release packed with.

  private val PiecesTable = "pieces"

  /** Learn and commit the piece table at `root`. */
  def buildUnigramModelM(
      docs: DataFrame, textCol: String, maxWords: Int,
      maxPieceLen: Int, seedMulti: Int, vocabMulti: Int, emIters: Int,
      root: String): Long = {
    val spark = docs.sparkSession
    val model = learn(docs, textCol, maxWords, maxPieceLen, seedMulti,
      vocabMulti, emIters)
    val cur = graft.index.IndexManifest.currentVersion(spark, root)
    val snap =
      if (cur > 0L) Some(graft.index.IndexManifest.snapshotAt(spark, root, cur))
      else None
    val seg = graft.index.IndexManifest.newSegment(PiecesTable)
    piecesFrame(spark, model)
      .withColumn("max_piece_len", lit(model.maxPieceLen))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/$seg")
    graft.index.IndexManifest.commit(spark, root,
      snap.map(_.tables).getOrElse(Map.empty)
        .updated(PiecesTable, Seq(seg)),
      expect = snap.map(_.version),
      meta = Map("family" -> "unigrammodel"))
  }

  /** The committed model (`at` pins a version) — a vocab-sized driver
    * scalar, the model every tokenization plan inlines. */
  def modelM(
      spark: org.apache.spark.sql.SparkSession, root: String,
      at: Option[Long] = None): UnigramModel = {
    val snap = at
      .map(v => graft.index.IndexManifest.snapshotAt(spark, root, v))
      .getOrElse(graft.index.IndexManifest.snapshot(spark, root))
    val rows = graft.index.IndexManifest
      .readAt(spark, root, snap, PiecesTable)
      .select(col("piece"), col("llk"), col("max_piece_len"))
      .collect()
    require(rows.nonEmpty, s"unigram model at $root is empty")
    UnigramModel(
      rows.map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortWith((a, b) => Bpe.cpCompare(a._1, b._1) < 0),
      rows.head.getInt(2))
  }

  /** Tokenize against a committed piece-table version. */
  def tokenizeM(
      spark: org.apache.spark.sql.SparkSession, root: String,
      docs: DataFrame, idCol: String, textCol: String,
      at: Option[Long] = None): DataFrame =
    tokenize(docs, idCol, textCol, modelM(spark, root, at))
}
