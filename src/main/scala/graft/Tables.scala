package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet test tables (TESTDATA.md).
  *
  * The `events` table is written with nanosecond parquet timestamps, which
  * Spark only reads via `spark.sql.legacy.parquet.nanosAsLong` — `ts` then
  * surfaces as a `LongType` of nanoseconds since the epoch. All query code
  * canonicalizes to microseconds (`ts div 1000`) because the DuckDB oracle
  * reads the same column truncated to microsecond TIMESTAMP.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session-level runtime conf: harmless for non-nanos files, required
    // for events.parquet. Set once per session, idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so queries can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
