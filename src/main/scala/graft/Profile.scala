package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: stage-by-stage timing of the heavy dedup chains.
  * Run: sbt "runMain graft.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, dir, "documents").cache()
    println(s"docs: ${docs.count()}")

    time("tokens")(docs.select(explode(split(col("text"), " "))).count())
    val sh = operators.Dedup.explodedShingles(docs, "text", "doc_id", 5)
    time("shingles_distinct")(sh.count())
    val shc = sh.cache(); shc.count()
    time("minhash_wide_from_cached") {
      operators.Dedup.minhashBands(shc, "doc_id", 16, 4).count()
    }
    val banded = operators.Dedup.minhashBands(shc, "doc_id", 16, 4).cache()
    banded.count()
    time("candidates_from_cached_bands") {
      operators.Dedup.lshCandidates(banded, "doc_id").count()
    }
    time("full_lsh_chain") {
      val sh2 = operators.Dedup.rawShingles(docs, "text", "doc_id", 5)
      operators.Dedup.lshCandidates(
        operators.Dedup.minhashBands(sh2, "doc_id", 16, 4), "doc_id").count()
    }
    time("raw_shingles_only") {
      operators.Dedup.rawShingles(docs, "text", "doc_id", 5).count()
    }
    time("minhash_from_raw_no_checkpoint") {
      operators.Dedup.minhashBands(
        operators.Dedup.rawShingles(docs, "text", "doc_id", 5), "doc_id", 16, 4).count()
    }
    time("jaccard_full") {
      val sh2 = operators.Dedup.explodedShingles(docs, "text", "doc_id", 5)
      operators.Dedup.ngramJaccardPairs(sh2, "doc_id", 0.1, 1000L).count()
    }
    time("jaccard_digested_full") {
      val sh2 = operators.Dedup.digestShingles(docs, "text", "doc_id", 5)
      operators.Dedup.ngramJaccardPairs(sh2, "doc_id", 0.1, 1000L).count()
    }
    time("jaccard_digest_distinct_only") {
      operators.Dedup.digestShingles(docs, "text", "doc_id", 5).count()
    }
    val dsh = operators.Dedup.digestShingles(docs, "text", "doc_id", 5).cache()
    dsh.count()
    time("jaccard_pairs_from_cached_index") {
      operators.Dedup.ngramJaccardPairs(dsh, "doc_id", 0.1, 1000L).count()
    }
    val emb = Tables.load(spark, dir, "embeddings").cache(); emb.count()
    functions.GraftFunctions.installAll(spark)
    // one scored frame, two ranking formulations — the arms differ ONLY
    // in the top-k operator
    val qs = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv")))
    val cs = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    val scored = qs.join(cs, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(operators.Similarity.cosineNative(col("__qv"), col("__cv")), 6))
    (1 to 2).foreach { rep =>
      time(s"brute_topk_salted_window_$rep") {
        operators.Similarity.topKPerQuery(scored, 5).count()
      }
      time(s"brute_topk_custom_heap_$rep") {
        operators.Similarity.topKPerQueryNative(scored, 5).count()
      }
    }
    spark.stop()
  }
}

/** Stage-by-stage timing of the exact-substring span chain (the newest
  * heavy dedup path). Run: sbt "runMain graft.ProfileSpans /root/testdata/sf0.1"
  */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.installAll(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents").cache()
    println(s"docs: ${docs.count()}")
    val L = 30
    def gramsComposed = docs
      .filter(col("text").isNotNull && length(col("text")) >= L)
      .select(col("doc_id"), posexplode(
          transform(sequence(lit(1), length(col("text")) - (L - 1)),
            i => call_function("graft_digest60", col("text").substr(i, lit(L)))))
        .as(Seq("__p0", "__h")))
    def grams = docs
      .filter(col("text").isNotNull && length(col("text")) >= L)
      .select(col("doc_id"), posexplode(
          call_function("graft_gram_digests", col("text"), lit(L)))
        .as(Seq("__p0", "__h")))
    (1 to 2).foreach { rep =>
      time(s"gram_digests_composed_$rep")(gramsComposed.count())
      time(s"gram_digests_kernel_$rep")(grams.count())
      time(s"rep_count_distinct_$rep") {
        grams.groupBy(col("__h")).agg(count_distinct(col("doc_id")).as("n"))
          .filter(col("n") >= 2).count()
      }
      time(s"rep_via_distinct_then_count_$rep") {
        grams.select(col("__h"), col("doc_id")).distinct()
          .groupBy(col("__h")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2).count()
      }
      time(s"rep_via_minmax_$rep") {
        grams.groupBy(col("__h"))
          .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
          .filter(col("lo") =!= col("hi")).count()
      }
      time(s"full_repeated_spans_$rep") {
        operators.Dedup.repeatedSpans(docs, "doc_id", "text", L).count()
      }
      time(s"full_span_strip_$rep") {
        operators.Dedup.stripSpans(docs,
          operators.Dedup.repeatedSpans(docs, "doc_id", "text", L),
          "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
