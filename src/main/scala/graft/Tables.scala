package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * plan runs unchanged from sf0.001 smoke data to a 100 TB production layout —
  * only the path (and at scale, the partitioning of the underlying store)
  * changes. Scans stay declarative (`spark.read.parquet`) so Catalyst keeps
  * filter pushdown / column pruning / partition pruning.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects as a
    * timestamp type. Read it as raw nanos (legacy long mode) and surface a
    * standard microsecond `TimestampType` column — floor-division truncation,
    * matching DuckDB's ns→µs epoch_us() semantics.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Reader for a snapshot-committed table ([[graft.ops.Layout.snapshotCommit]]):
    * the latest committed version by default, or a pinned `asOfVersion`
    * (time travel). The file list is resolved from the version's manifest
    * at call time, so the returned frame keeps reading THAT snapshot's
    * files even while later versions commit concurrently — a long
    * analytics job is never torn across versions by a writer (files are
    * immutable until [[graft.ops.Layout.snapshotExpire]] drops the
    * version). */
  def snapshot(s: SparkSession, dir: String,
      asOfVersion: Long = -1L): DataFrame =
    graft.ops.Layout.snapshotRead(s, dir, asOfVersion)
}
