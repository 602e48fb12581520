package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the harness's FIXED per-operation floors at bench scale
  * (guide §1: before attributing cost to an operator, know what an
  * empty job / one exchange / one broadcast / one codegen'd aggregate
  * costs on this host at `local[$SPARK_GRAFT_CPUS]`): each probe runs 3
  * reps of a minimal plan over the 2000-row embeddings / 5000-row
  * documents tables, printing per-rep wall seconds. Everything the
  * bench times is a sum of these floors plus real work — at sf0.1 the
  * floors dominate several rows, which is exactly why exchange/job
  * count, not bytes, is the local lever (and the same counts are the
  * 100 TB lever for different reasons).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installAll(spark)
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    emb.count(); docs.count()
    def probe(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[fp] $name%-44s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    probe("count(parquet 2k rows)")(emb.count())
    probe("count(parquet 600k lineitem)")(
      graft.Tables.load(spark, sfDir, "lineitem").count())
    probe("groupBy(1 exchange, 2k rows)")(
      emb.groupBy(col("vec_id") % 7).agg(count(lit(1))).count())
    probe("groupBy+orderBy(2 exchanges)")(
      emb.groupBy((col("vec_id") % 7).as("k")).agg(count(lit(1)).as("n"))
        .orderBy("k").count())
    probe("broadcast join build(2k)")(
      emb.join(broadcast(emb.select(col("vec_id"))), Seq("vec_id")).count())
    probe("kernel cosine proj (2k x scan)")(
      emb.select(round(graft.operators.Similarity.cosineNative(
        col("embedding"), col("embedding")), 6)).agg(sum(lit(1))).count())
    probe("wide decimal agg (16 sums, 1 exch)")(
      emb.groupBy(col("vec_id") % 7)
        .agg(count(lit(1)).as("n"),
          (0 until 16).map(i => sum(element_at(col("embedding"), i + 1)
            .cast("decimal(38,10)")).as(s"s$i")): _*).count())
    probe("localCheckpoint(2k rows)")(
      emb.localCheckpoint().count())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    probe("docs tokenize explode agg")(
      docs.select(explode(split(col("text"), " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1))).count())
    spark.stop()
  }
}
