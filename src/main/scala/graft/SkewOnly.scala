package graft

import org.apache.spark.sql.SparkSession

/** Standalone skew-stress driver: the bench's skew section alone, so a
  * skew-shape change can be measured without the 4-minute query sweep. */
object SkewOnly {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "1000000").toLong
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "5000").toLong
    SkewBench.run(spark, nRows, nDocs).foreach { case (name, s, u) =>
      val ratio = if (u > 0) s / u else 0.0
      println(f"[skew] $name%-24s skew=$s%7.3f uniform=$u%7.3f ratio=$ratio%5.2f")
    }
    spark.stop()
  }
}
