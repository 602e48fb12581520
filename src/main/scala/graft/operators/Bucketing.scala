package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-layout helpers — the storage-side half of shuffle elimination.
  *
  * At 100 TB the dominant cost of the CDC apply and of fact-fact joins is
  * re-shuffling the big table on its key every batch/query. Writing the
  * sink table bucketed by the join/apply key means Spark's bucketing-aware
  * planner joins/aggregates WITHOUT any exchange on the bucketed side
  * (`spark.sql.sources.bucketing.enabled`, on by default) — the shuffle is
  * paid once at write time, then amortized over every subsequent read.
  * This is the Spark-native equivalent of the reference sink's primary-key
  * layout (`mysql.go:183-198`).
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (parquet). `sortCols` adds
    * within-bucket ordering so merge joins skip their sort too.
    *
    * A managed table's warehouse directory outlives the (in-memory)
    * catalog that created it, so a fresh session re-creating the same
    * table name would hit LOCATION_ALREADY_EXISTS — drop the catalog
    * entry AND the stale location before writing. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * a plain `spark.read.parquet(path)` would lose it). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
