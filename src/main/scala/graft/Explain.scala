package graft

import org.apache.spark.sql.SparkSession

/** Dev plan-audit main: prints formatted physical plans for the named
  * queries (default: the bench set) so shuffle/broadcast/pushdown shape can
  * be reviewed. Run: sbt "runMain graft.Explain q1_agg q3_revenue_topn"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    val all = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      all(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
