package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines (north-star in
  * BASELINE.json). Absent from the reference (SURVEY §2 "absent" list) —
  * designed Spark-first for 100 TB:
  *
  *  - exact dedup: one hash-shuffle on a 32-byte digest, never on the text;
  *  - MinHash/LSH: explode → two key-shuffles (doc×seed, then band) with
  *    map-side combine; candidate verification joins only within buckets,
  *    never all-pairs;
  *  - SimHash: single pass, no shuffle until the pair join;
  *  - n-gram Jaccard: inverted-index self-join (shingle → docs), skew-safe
  *    by dropping ubiquitous shingles (`maxDocFreq`) — the classic
  *    stop-shingle cut that bounds the per-key fanout at scale.
  *
  * Hashes are md5-based so the DuckDB oracle can reproduce them exactly.
  */
object Dedup {

  /** Exact dedup: annotate each row with its content digest and whether it
    * is the canonical (minimum-id) representative of its duplicate group. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = Window.partitionBy(h)
    df.select(
      col(idCol),
      h.as("content_hash"),
      (col(idCol) === min(col(idCol)).over(w)).as("is_canonical"),
      count(lit(1)).over(w).as("dup_count"))
  }

  /** Word n-gram shingles of the token array; docs shorter than `n` tokens
    * shingle to the whole text. Matches the DuckDB range/list_slice twin. */
  def shingles(textCol: Column, n: Int): Column = {
    val t = textCol.toString
    expr(s"""
      CASE WHEN size(split($t, ' ')) >= $n
           THEN transform(sequence(1, size(split($t, ' ')) - ${n - 1}),
                          i -> concat_ws(' ', slice(split($t, ' '), i, $n)))
           ELSE array($t) END""")
  }

  /** Distinct (id, shingle) pairs — the inverted-index input. */
  def explodedShingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("shingle")).distinct()

  /** MinHash signatures: k permutations simulated as md5(seed || ':' ||
    * shingle), signature element = per-seed minimum digest. Returns
    * (id, seed, minhash). One shuffle on (id, seed) with partial min
    * aggregation map-side. */
  def minhash(shingled: DataFrame, idCol: String, k: Int): DataFrame = {
    val seeds = explode(lit((0 until k).toArray)).as("seed")
    shingled
      .select(col(idCol), col("shingle"), seeds)
      .groupBy(col(idCol), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle")))).as("minhash"))
  }

  /** LSH banding: group the k signature rows into `bands` bands and hash
    * each band; docs sharing any (band, band_hash) are candidates.
    * Returns (id, band, band_hash). */
  def lshBands(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    sig
      .withColumn("band", col("seed") / lit(rowsPerBand) cast "int")
      .groupBy(col(idCol), col("band"))
      .agg(md5(concat_ws("|", array_sort(collect_list(concat(col("seed"), lit(":"), col("minhash")))))).as("band_hash"))
  }

  /** Candidate near-duplicate pairs from band buckets (a < b). */
  def lshCandidates(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col(s"a.band") === col(s"b.band") &&
        col(s"a.band_hash") === col(s"b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.
    * `maxDocFreq` drops shingles appearing in more than that many docs
    * before the self-join — the skew guard that keeps the join fanout
    * bounded at 100 TB (a ubiquitous shingle would otherwise produce a
    * quadratic bucket). */
  def ngramJaccardPairs(
      shingled: DataFrame,
      idCol: String,
      threshold: Double,
      maxDocFreq: Long = 1000L): DataFrame = {
    val sizes = shingled.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val filtered = {
      val df = shingled.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      shingled.join(df.filter(col("df") <= maxDocFreq), Seq("shingle"))
    }
    val a = filtered.select(col(idCol).as("id_a"), col("shingle"))
    val b = filtered.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: hamming distance over 60-bit signatures, with
    * a 12-bit prefix bucket as the scale path (near-dups almost always
    * share the prefix; brute-force only within buckets). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int): DataFrame = {
    val sigs = df.select(col(idCol), TextAnalysis.simhash60(col(textCol)).as("sig"))
      .withColumn("bucket", expr("sig div cast(pow(2, 48) as bigint)")) // top-12-bit prefix
    val a = sigs.as("a"); val b = sigs.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("hamming", expr("bit_count(a.sig ^ b.sig)"))
      .filter(col("hamming") <= maxHamming)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("hamming"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold within sign-LSH buckets
    * (see [[Similarity.signBucket]]) — the bucelocated variant of the
    * all-pairs check that survives a 100× corpus. */
  def embeddingDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, signBits: Int = 8): DataFrame = {
    val withBucket = emb.withColumn("bucket", Similarity.signBucket(col(vecCol), signBits))
    val a = withBucket.as("a"); val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine", Similarity.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cosine") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cosine"))
  }
}
