package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`) — north-star operator, absent from the
  * reference. Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k, broadcast the (small) query
  *    set against the corpus — the correctness baseline; one pass over the
  *    corpus, no corpus shuffle, per-partition top-k before the final
  *    merge (the window only sees `queries × k̃` candidates).
  *  - [[signLshTopK]] / [[ivfTopK]]: bucketed variants — queries only scan
  *    their own bucket/cluster, the 100 TB scale path.
  *
  * All float math widens to double BEFORE multiplying and folds
  * left-to-right, matching DuckDB's `list_*` double semantics so the
  * oracle hash-matches bit-for-bit.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double —
    * composed-builtins form (SQL-expressible; used for oracle parity docs).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Cosine via the native codegen expression
    * [[graft.functions.CosineSimilarity]] — bit-identical to [[cosine]],
    * ~an order of magnitude cheaper per row (tight primitive loop, no
    * intermediate array). Requires [[graft.functions.GraftFunctions
    * .register]] on the session; every DataFrame-level operator here does
    * that itself. */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Sign-pattern LSH bucket over the first `bits` dimensions: a coarse,
    * deterministic random-hyperplane surrogate (axis-aligned planes). */
  def signBucket(vec: Column, bits: Int): Column =
    concat_ws("", (1 to bits).map(i =>
      when(element_at(vec, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * broadcast-small (it is hinted); ranking uses (rounded cosine desc,
    * neighbor id asc) so results are stable across engines. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineNative(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Bucketed ANN: both sides keyed by sign-LSH bucket; each query scans
    * only its bucket. Recall < 1 by construction; the bucket join shuffles
    * corpus once on a low-cardinality key — salt `bits` up as data grows. */
  def signLshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signBucket(col(vecCol), bits).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineNative(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style ANN: a deterministic centroid set (caller-provided, e.g. a
    * sampled subset), every vector assigned to its nearest centroid, then
    * per-query search restricted to the query's cluster. Centroid
    * assignment = broadcast-join + argmin — corpus shuffles once on
    * cluster id. */
  def assignClusters(
      vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val cen = broadcast(centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("__cen")))
    val scored = vectors.crossJoin(cen)
      .withColumn("__sim", round(cosineNative(col(vecCol), col("__cen")), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(vectors.columns.toSeq.map(col) :+ col("centroid_id").as("cluster"): _*)
  }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val clustered = assignClusters(corpus, centroids, idCol, vecCol)
    val qClustered = assignClusters(queries, centroids, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("cluster"))
    val c = clustered.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("cluster"))
    val scored = broadcast(qClustered).join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineNative(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cluster"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
