package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All judged queries are declared as [[QuerySpec]]s in the `graft.queries`
  * and `graft.ops` registries; this object just flattens them into the
  * driver's Map-shaped contract.
  */
object SparkEntry {

  /** Every judged query, in registration order. */
  def allSpecs: Seq[QuerySpec] =
    _root_.graft.queries.CoreRelational.specs ++
      _root_.graft.queries.EtlParity.specs ++
      _root_.graft.queries.TrainingData.specs ++
      _root_.graft.queries.Advanced.specs ++
      _root_.graft.queries.SqlSurface.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 5-way star join (q04). */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.find(_.name == "q04_join_multiway").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketch-based queries) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
