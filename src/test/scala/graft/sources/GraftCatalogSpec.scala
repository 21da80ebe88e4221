package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Layout

/** The DSv2 catalog door: named snapshot tables in SQL text —
  * CREATE/INSERT/INSERT OVERWRITE land manifest commits through the
  * same machinery as the Scala API, SELECT reads the pinned manifest's
  * file list, VERSION/TIMESTAMP AS OF time-travel, and a live
  * merge-on-read overlay refuses the stock-scan path honestly. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): (String, String) = {
    // unique catalog name per test: a session caches catalog instances
    // by name, so a reused name would pin the first test's root
    val name = s"gc${System.nanoTime()}"
    val root = tmpDir("graftcat")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  test("CREATE + INSERT INTO lands append manifests; SELECT reads them") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'c')")
    // three commits: the CREATE's empty schema commit + two appends
    val dir = s"$root/db/t"
    assert(Layout.snapshotVersions(spark, dir) === Seq(1L, 2L, 3L))
    // the INSERTs are APPEND manifests: v3 carries v2's files forward
    assert(Layout.snapshotChanges(spark, dir, 2L, 3L)
      .as[(Long, String)].collect().toSet === Set((3L, "c")))
    assert(spark.sql(s"SELECT k, s FROM $cat.db.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // both doors see the same table: the Scala API reads what SQL wrote
    assert(Layout.snapshotRead(spark, dir).count() === 3)
    // and SQL reads what the Scala API writes
    Layout.snapshotAppend(Seq((4L, "d")).toDF("k", "s"), dir)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").head().getLong(0)
      === 4)
  }

  test("INSERT OVERWRITE is a full-rewrite commit; VERSION AS OF time-travels") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT OVERWRITE $cat.db.t VALUES (9, 'z')")
    assert(spark.sql(s"SELECT k, s FROM $cat.db.t")
      .as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    // history survives: the pre-overwrite version still reads
    assert(spark.sql(s"SELECT k FROM $cat.db.t VERSION AS OF 2 ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // TIMESTAMP AS OF now = the latest version
    val nowIso = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(
        System.currentTimeMillis() + 60000), java.time.ZoneOffset.UTC)
      .toString.replace('T', ' ')
    assert(spark.sql(
      s"SELECT k FROM $cat.db.t TIMESTAMP AS OF '$nowIso'")
      .as[Long].collect().toSeq === Seq(9L))
  }

  test("predicate pushdown and pruning reach the delegated parquet scan") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, s STRING)")
    spark.sql(
      s"INSERT INTO $cat.db.p SELECT id, CAST(id AS STRING) FROM RANGE(100)")
    val plan = spark.sql(s"SELECT k FROM $cat.db.p WHERE k > 90")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"),
      s"expected parquet pushdown in:\n$plan")
    assert(spark.sql(s"SELECT k FROM $cat.db.p WHERE k > 90").count() === 9)
  }

  test("a live merge-on-read overlay refuses catalog reads with a clear error") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.m (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.m VALUES (1, 'a'), (2, 'b')")
    Layout.snapshotDeleteKeys(spark, s"$root/db/m",
      Seq(1L).toDF("k"), Seq("k"))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.m").collect()
    }
    assert(e.getMessage.contains("merge-on-read") ||
      Option(e.getCause).exists(_.getMessage.contains("merge-on-read")))
    // the overlay-aware Scala read still works; after compaction the
    // catalog reads again
    Layout.snapshotCompact(spark, s"$root/db/m")
    assert(spark.sql(s"SELECT k FROM $cat.db.m").as[Long].collect()
      .toSeq === Seq(2L))
  }

  test("tableExists / listTables / dropTable; duplicate CREATE refuses") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.a (k BIGINT)")
    spark.sql(s"CREATE TABLE $cat.ns.b (k BIGINT)")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).toSet === Set("a", "b"))
    intercept[Exception] { spark.sql(s"CREATE TABLE $cat.ns.a (k BIGINT)") }
    spark.sql(s"DROP TABLE $cat.ns.a")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).toSet === Set("b"))
  }

  test("INSERT INTO schema drift refuses through the same commit contract") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.s (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.s VALUES (1, 'a')")
    // the analyzer itself rejects arity drift; type drift that survives
    // analysis (here: an implicit cast would be needed) hits the
    // manifest schema check
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.db.s VALUES (2, 'b', 3)").collect()
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.s").head().getLong(0)
      === 1)
  }
}
