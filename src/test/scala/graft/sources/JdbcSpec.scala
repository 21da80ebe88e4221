package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S5 live-wire evidence: a real `spark.read.jdbc` / `write.jdbc`
  * round-trip against embedded Derby (the JDBC engine on the Spark
  * classpath), standing in for the reference's Postgres connection
  * (tsvscript.py:29-32). Proves the exact API the parquet-backed store
  * substitutes for — schema round-trip, filter pushdown into the remote
  * SQL, and the partitioned parallel scan. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft;create=true"

  private lazy val trips = Seq(
    (1, 65, 4008, "Weekday", "Out"),
    (2, 70, 4009, "Saturday", "Back"),
    (3, 65, 4008, "Sunday", "Out"))
    .toDF("trip_id", "route_id", "vehicle_id", "service_key", "direction")

  test("S5: write.jdbc → read.jdbc round-trips rows and schema") {
    Jdbc.writeTable(trips, url, "trip_rt", SaveMode.Overwrite)
    val back = Jdbc.readTable(spark, url, "trip_rt")
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).sorted === trips.columns.sorted)
    assert(back.orderBy($"trip_id").collect().map(_.getInt(1)).toSeq === Seq(65, 70, 65))
  }

  test("S5: predicates push down into the database-side SQL") {
    Jdbc.writeTable(trips, url, "trip_push", SaveMode.Overwrite)
    val filtered = Jdbc.readTable(spark, url, "trip_push")
      .filter($"trip_id" === 1).select($"route_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(trip_id,1)"),
      s"expected the equality filter pushed to JDBC:\n$plan")
    assert(filtered.head().getInt(0) === 65)
  }

  test("S5: partitioned scan issues parallel range queries") {
    Jdbc.writeTable(trips, url, "trip_part", SaveMode.Overwrite)
    val part = Jdbc.readTablePartitioned(spark, url, "trip_part",
      partCol = "trip_id", lower = 1L, upper = 30L, numPartitions = 3)
    assert(part.rdd.getNumPartitions === 3)
    assert(part.count() === 3) // stride bounds split work, never drop rows
  }
}
