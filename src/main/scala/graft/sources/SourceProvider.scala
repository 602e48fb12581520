package graft.sources

import graft.config.TableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The seam between replication logic and the physical source — what a
  * production deployment swaps first. The reference couples its loop
  * directly to a Mongo client (snapshot reads `Collection.Find`,
  * `mongo.go:569-593`; the feed tails `local.oplog.rs`,
  * `mongo.go:456-539`); here the [[graft.Replicator]] lifecycle is
  * written against this trait, with two bindings:
  *
  *  - [[ParquetHarnessProvider]] — the driver-testdata/oplog-segment
  *    binding every oracle row and spec runs through;
  *  - [[MongoSourceProvider]] — the mongo-spark-connector binding,
  *    COMPILED but unexercised in this sandbox (no MongoDB, and the
  *    connector jar ships with the deployment, resolved by format name
  *    at runtime — nothing here links against it at compile time).
  *
  * All three methods return frames in the shapes the downstream
  * pipeline already consumes: snapshots in the collection's natural
  * schema ([[graft.operators.Transforms.projectTo]] projects to the
  * declared sink schema), change feeds in [[ChangeFeed.SegmentSchema]]
  * (op/ns/ts/o/o2 with JSON-text payloads) ready for
  * [[ChangeFeed.decode]].
  */
trait SourceProvider {

  /** Full-collection snapshot (reference S1, `mongo.go:569-593`). */
  def snapshot(spec: TableSpec): DataFrame

  /** Batch replay of the change feed after `afterTs` — used by the
    * from-scratch pin scan and offset-bounded replays (S2/F1,
    * `mongo.go:456-539`). */
  def changes(replicated: Set[String], afterTs: Long): DataFrame

  /** Streaming tail of the change feed — the tailable-cursor analog. */
  def changeStream(replicated: Set[String], afterTs: Long): DataFrame
}

/** The sandbox/test binding: snapshots from parquet files, the change
  * feed from JSONL oplog segments via the `graft-oplog` DSv2 source
  * (ns/ts pushdown, growing-file streaming). This is also a faithful
  * production shape for REPLAYS — oplog dumps land in object storage as
  * segment files, and a 100 TB backfill reads those, not a live cursor. */
final class ParquetHarnessProvider(
    spark: SparkSession, snapshotDir: String, val segmentsDir: String)
    extends SourceProvider {

  override def snapshot(spec: TableSpec): DataFrame =
    spark.read.parquet(s"$snapshotDir/${spec.name}.parquet")

  override def changes(replicated: Set[String], afterTs: Long): DataFrame =
    ChangeFeed.readBatch(spark, segmentsDir, replicated, afterTs)

  override def changeStream(replicated: Set[String], afterTs: Long): DataFrame =
    ChangeFeed.readStream(spark, segmentsDir, replicated, afterTs)
}

/** The live-MongoDB binding over the mongo-spark-connector (the
  * `mongodb` DSv2 format, resolved by NAME at runtime — the deployment
  * ships the connector jar; this file never links against it, so it
  * compiles in the connector-less sandbox and is exactly as unexercised
  * here as it is documented to be).
  *
  *  - [[snapshot]] reads the collection itself — the connector's
  *    partitioned scan replaces the reference's single `Find` cursor
  *    (`mongo.go:569-593`) with one split per executor.
  *  - [[changes]] replays `local.oplog.rs` (what the reference tails,
  *    `mongo.go:456-539`): oplog documents carry the same op/ns/ts/o/o2
  *    fields the segment files do; payloads re-serialize to JSON text so
  *    [[ChangeFeed.decode]] sees its one input shape. The ts filter and
  *    ns membership apply AFTER the mapping, mirroring
  *    [[ChangeFeed]]'s feed predicate (the connector pushes the
  *    aggregation pipeline down where it can).
  *  - [[changeStream]] uses the connector's continuous micro-batch
  *    stream over the same collection.
  *
  * BSON timestamps surface via the connector as structs with `t`
  * (seconds) and `i` (increment); the reference packs them into one
  * uint64 as `t << 32 | i` (`mongo.go:100-103` obj2plain) — the same
  * packing lands `ts` in the Long offset-clock domain the apply path
  * orders by. */
final class MongoSourceProvider(
    spark: SparkSession, uri: String, database: String)
    extends SourceProvider {

  override def snapshot(spec: TableSpec): DataFrame =
    spark.read.format("mongodb")
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", spec.name)
      .load()

  /** op/ns/ts/o/o2 projection of a raw oplog frame — shared by the batch
    * and streaming legs so the mapping exists once. */
  private def toSegmentShape(
      oplog: DataFrame, replicated: Set[String], afterTs: Long): DataFrame =
    oplog.select(
        col("op").cast("string").as("op"),
        col("ns").cast("string").as("ns"),
        (col("ts.t").cast("long").bitwiseAND(lit(0xffffffffL)) * lit(1L << 32) +
          col("ts.i").cast("long").bitwiseAND(lit(0xffffffffL))).as("ts"),
        to_json(col("o")).as("o"),
        to_json(col("o2")).as("o2"),
        lit(null).cast("string").as("_corrupt_record"))
      .filter(col("ts") > lit(afterTs) &&
        (col("ns").isin(replicated.toSeq: _*) || col("ns") === "admin.$cmd"))

  override def changes(replicated: Set[String], afterTs: Long): DataFrame =
    toSegmentShape(
      spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", "local")
        .option("collection", "oplog.rs")
        .load(),
      replicated, afterTs)

  override def changeStream(replicated: Set[String], afterTs: Long): DataFrame =
    toSegmentShape(
      spark.readStream.format("mongodb")
        .option("connection.uri", uri)
        .option("database", "local")
        .option("collection", "oplog.rs")
        .load(),
      replicated, afterTs)
}

object SourceProvider {

  /** Config wiring: a `mongodb://` source URI selects the live binding
    * (the reference's `-inp` flag shape, `run.go:62`); anything else is
    * the parquet/segment harness rooted at the given directories. */
  def forConfig(
      spark: SparkSession, sourceUri: String,
      snapshotDir: String, segmentsDir: String): SourceProvider =
    if (sourceUri.startsWith("mongodb://") ||
        sourceUri.startsWith("mongodb+srv://"))
      new MongoSourceProvider(spark, sourceUri,
        sourceUri.split('/').lastOption.filter(_.nonEmpty).getOrElse("db"))
    else new ParquetHarnessProvider(spark, snapshotDir, segmentsDir)
}
