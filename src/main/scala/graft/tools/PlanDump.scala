package graft.tools

import org.apache.spark.sql.SparkSession

object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.installAll(spark)
    args.foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
