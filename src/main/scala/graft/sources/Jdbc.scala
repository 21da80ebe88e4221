package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S5 — JDBC table scan / sink (the reference reads its Postgres store over
  * a connection, tsvscript.py:29-32; the consumers write it).
  *
  * Thin declarative wrappers so the live path stays Catalyst-visible:
  *  - `spark.read.jdbc` pushes filters into the remote SQL (predicates
  *    become WHERE clauses executed by the database — JdbcSpec asserts
  *    `PushedFilters` in the physical plan), and prunes columns the same
  *    way;
  *  - the partitioned form issues `numPartitions` concurrent range queries
  *    on a numeric column — the only way a 1000-executor cluster reads a
  *    big warehouse table without serializing on one connection.
  *
  * The synthetic test tables are parquet-backed by design (this container
  * ships no Postgres); JdbcSpec proves the live wire path against embedded
  * Derby, the one JDBC engine on the Spark classpath.
  */
object Jdbc {

  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel scan: `numPartitions` concurrent range queries over
    * `[lower, upper]` of `partCol`. Rows outside the range are still read
    * (first/last partitions are unbounded) — stride bounds only split the
    * work. */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  def writeTable(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
