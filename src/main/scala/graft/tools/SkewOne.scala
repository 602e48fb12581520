package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a SUBSET of SkewBench paths by name (args) at the bench fixture
  * size — skew-triage without the full 12-path sweep. */
object SkewOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installAll(spark)
    graft.SkewBench.run(spark, nRows = 1000000L, nDocs = 5000L,
        only = args.toSet)
      .foreach { case (n, s, u) =>
        println(f"[skew] $n%-24s skew=$s%.3f uniform=$u%.3f ratio=${s / u}%.2f")
      }
    spark.stop()
  }
}
