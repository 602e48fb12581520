package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval — BM25 ranked search over the corpus, inline
  * and over a persisted inverted (postings) index.
  *
  * Why it belongs in a training-data engine: ranked lexical retrieval is
  * the workhorse behind (a) corpus exploration/debugging at curation time,
  * (b) contamination forensics ("which training docs score high against
  * this eval question?"), and (c) hard-negative mining for embedding-model
  * training data (high-BM25 non-positives are the classic negatives).
  * The reference engine has no search surface; this is Spark-first new
  * capability in the same family as the LSH/PQ/gram index lifecycles.
  *
  * Scale shape (the 100 TB contract):
  *   - The postings build is ONE keyed aggregate over exploded tokens —
  *     wordcount shape, map-side combine, no joins, no windows.
  *   - A probe never scans the corpus: query terms are a tiny broadcast,
  *     the postings scan carries a pushed `term IN (...)` filter (term-
  *     clustered files → row-group pruning), per-term df stats reduce to
  *     a broadcast-sized frame, and only candidate postings (docs sharing
  *     ≥1 query term) reach the scoring aggregate. The final ranking is
  *     the bounded-heap [[TopK.perKey]] node — queries×k rows through the
  *     last exchange, no tail sort.
  *   - Scoring is cross-engine bit-stable: each per-term contribution is
  *     rounded to the 1e-6 grid, summed in DECIMAL(38,10) (order-free,
  *     exact), one final double round — the repo's established pattern
  *     for float aggregates under the DuckDB hash gate.
  *
  * BM25 constants k1=1.2, b=0.75; idf is the Lucene-style non-negative
  * `ln(1 + (n - df + 0.5)/(df + 0.5))`.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** Inverted-index rows: one per (term, doc) — `(term, doc_id, tf, dl)`.
    * dl (doc length in tokens, empties included, mirroring the oracle's
    * `len(string_split(...))`) is denormalized onto every posting so a
    * probe never needs a doc-side join to normalize tf. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus scalars the BM25 normalization needs: (nDocs, sumDl). One tiny
    * aggregate job; the result is two longs on the driver (contract-small,
    * same shape as the tfidf `docs.count()` precedent). */
  def corpusStats(docs: DataFrame, textCol: String): (Long, Long) = {
    val r = docs.agg(
      count(lit(1)).cast("long"),
      sum(size(split(col(textCol), " "))).cast("long")).head
    (r.getLong(0), r.getLong(1))
  }

  /** A query batch as a DataFrame of (query_id, term) — distinct terms per
    * query (qtf folds to 1; repeated words in a query string are dropped,
    * matching the oracle's DISTINCT VALUES list). */
  def queryTerms(spark: SparkSession, queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    queries
      .flatMap { case (qid, text) =>
        text.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
      }
      .toDF("query_id", "term")
  }

  /** The shared scoring tail: candidate postings × query terms × df stats
    * → per-(query, doc) BM25 → top-k per query with rank.
    *
    * `posts` must be `(term, doc_id, tf, dl)`, already restricted (or
    * restrictable by Catalyst) to the query's terms; `dfStats` is
    * `(term, df)` for at least the query terms. Both query frames are
    * broadcast — the only shuffle is the per-(query_id, doc_id) partial
    * sum, whose input is candidate postings only. */
  def bm25Rank(
      posts: DataFrame, dfStats: DataFrame, qterms: DataFrame,
      nDocs: Long, sumDl: Long, k: Int): DataFrame =
    rankTopK(bm25Scored(posts, dfStats, qterms, nDocs, sumDl), k)

  /** The scoring core without the ranking tail: per-(query_id, doc_id)
    * BM25 over candidate postings. Exposed so compositions (hard-negative
    * mining's self-exclusion) can filter between scoring and ranking. */
  def bm25Scored(
      posts: DataFrame, dfStats: DataFrame, qterms: DataFrame,
      nDocs: Long, sumDl: Long): DataFrame = {
    val avgdl = sumDl.toDouble / nDocs
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * (col("dl") / lit(avgdl))))
    val contrib = round(idf * tfn, 6)
    posts
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfStats), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        contrib.cast("decimal(38,10)").as("w"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("w")).cast("double"), 6).as("score"))
  }

  /** Bounded-heap top-k + rank over a (query_id, doc_id, score) frame. */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("score").desc, col("doc_id").asc)
    TopK.perKey(scored, Seq("query_id"), order, k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(order: _*)))
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Hard-negative mining for contrastive-pair training data: each anchor
    * document's distinct terms become its query; the corpus is ranked by
    * BM25 and the anchor itself excluded — the top-k survivors are the
    * "lexically close but not the positive" negatives an embedding-model
    * batch wants. Anchors are a tiny broadcast frame; everything else is
    * the shared retrieval path, so the cost is the anchors' posting
    * lists, not a corpus cross-product. */
  def hardNegatives(
      docs: DataFrame, idCol: String, textCol: String,
      anchorIds: Seq[Long], k: Int): DataFrame = {
    val posts = postings(docs, idCol, textCol)
    val qterms = docs
      .filter(col(idCol).isin(anchorIds: _*))
      .select(col(idCol).as("query_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    val termSet = qterms.select("term").distinct()
    val cand = posts.join(broadcast(termSet), Seq("term"))
    val dfStats = cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val (n, sumDl) = corpusStats(docs, textCol)
    rankTopK(
      bm25Scored(cand, dfStats, qterms, n, sumDl)
        .filter(col("query_id") =!= col("doc_id")),
      k)
  }

  /** Inline BM25 top-k: postings, df, and corpus stats derived from the
    * corpus in-query. Two corpus passes (stats scalar + postings), then
    * the shared ranking tail. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = docs.sparkSession
    val posts = postings(docs, idCol, textCol)
    val qt = queryTerms(spark, queries)
    val terms = qt.select("term").distinct().collect().map(_.getString(0)).toSeq
    val cand = posts.filter(col("term").isin(terms: _*))
    val dfStats = cand.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val (n, sumDl) = corpusStats(docs, textCol)
    bm25Rank(cand, dfStats, qt, n, sumDl, k)
  }

  /** Persist the inverted index: `path/postings` term-clustered parquet
    * (repartitioned + sorted by term so a probe's pushed `term IN` prunes
    * row groups), `path/stats` per-term df SEGMENT rows (mergeable — probe
    * sums them), `path/corpus` one (n_docs, sum_dl) SEGMENT row. Segment
    * rows make [[appendIndex]] a pure parquet append: nothing is ever
    * rewritten, df/n/avgdl re-derive by summation at probe time. */
  def writeIndex(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val posts = postings(docs, idCol, textCol)
    posts
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(mode).parquet(s"$path/postings")
    posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode(mode).parquet(s"$path/stats")
    val (n, sumDl) = corpusStats(docs, textCol)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((n, sumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode(mode).parquet(s"$path/corpus")
  }

  /** Append a delta corpus to a persisted index. Exact under disjoint doc
    * ids: postings rows are per-(term, doc) so new docs only ADD rows; df
    * and corpus segments sum at probe time. No stored row is read or
    * rewritten — ingest cost is the delta's wordcount, independent of the
    * lake's size. */
  def appendIndex(
      delta: DataFrame, idCol: String, textCol: String, path: String): Unit =
    writeIndex(delta, idCol, textCol, path, SaveMode.Append)

  /** Probe a persisted index: ranks `queries` against the indexed corpus
    * without touching the corpus itself. The postings/stats scans carry
    * pushed `term IN (...)` filters; stats segments merge AFTER that
    * filter (sum over query terms only), so the probe's work is
    * proportional to the query terms' posting lists, not the lake. */
  def bm25Probe(
      spark: SparkSession, path: String,
      queries: Seq[(Int, String)], k: Int): DataFrame = {
    val qt = queryTerms(spark, queries)
    val terms = qt.select("term").distinct().collect().map(_.getString(0)).toSeq
    val posts = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms: _*))
    val dfStats = spark.read.parquet(s"$path/stats")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
    val c = spark.read.parquet(s"$path/corpus")
      .agg(sum(col("n_docs")).cast("long"), sum(col("sum_dl")).cast("long")).head
    bm25Rank(posts, dfStats, qt, c.getLong(0), c.getLong(1), k)
  }
}
