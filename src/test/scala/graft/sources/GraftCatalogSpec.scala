package graft.sources

import org.apache.hadoop.fs.Path
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

  test("CREATE TABLE AS SELECT lands a create + append through the same doors") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.c AS " +
      "SELECT id AS k, CAST(id % 3 AS STRING) AS s FROM RANGE(30)")
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $cat.db.c").head()
      === org.apache.spark.sql.Row(30L, 435L))
    // the CTAS is real snapshot history: create commit + data commit
    assert(Layout.snapshotVersions(spark, s"$root/db/c").nonEmpty)
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

  test("ALTER TABLE RENAME TO moves the table whole — history intact") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.old (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns.old VALUES (1), (2)")
    spark.sql(s"INSERT INTO $cat.ns.old VALUES (3)")
    spark.sql(s"ALTER TABLE $cat.ns.old RENAME TO ns.fresh")
    assert(spark.sql(s"SELECT sum(k) FROM $cat.ns.fresh").head().getLong(0)
      === 6)
    // relative manifest paths mean time travel survives the move
    assert(spark.sql(s"SELECT k FROM $cat.ns.fresh VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.ns.old") }
    // renaming onto an existing table refuses
    spark.sql(s"CREATE TABLE $cat.ns.other (k BIGINT)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.fresh RENAME TO ns.other")
    }
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

  test("ALTER TABLE ADD COLUMNS evolves; RENAME COLUMN maps field IDs") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.e (k BIGINT, price DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.e VALUES (1, 10.0), (2, 20.0)")
    spark.sql(s"ALTER TABLE $cat.db.e ADD COLUMNS (note STRING)")
    spark.sql(s"INSERT INTO $cat.db.e VALUES (3, 30.0, 'x')")
    assert(spark.sql(
      s"SELECT k, note FROM $cat.db.e WHERE note IS NULL ORDER BY k")
      .as[(Long, Option[String])].collect().toSeq
      === Seq((1L, None), (2L, None)))
    spark.sql(s"ALTER TABLE $cat.db.e RENAME COLUMN price TO amount")
    // the stock-scan door refuses while generations mix…
    val e = intercept[Exception] {
      spark.sql(s"SELECT amount FROM $cat.db.e").collect()
    }
    assert(e.getMessage.contains("snapshotRename"))
    // …the rename-aware Scala reader resolves the log…
    val dir = s"$root/db/e"
    assert(Layout.snapshotRead(spark, dir).select("k", "amount")
      .as[(Long, Double)].collect().sorted.toSeq
      === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // …and compaction materializes it for SQL
    Layout.snapshotCompact(spark, dir)
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.db.e").head()
      .getDouble(0) === 60.0)
    // DROP COLUMN is a metadata-only commit: the column disappears,
    // history below the drop still carries it
    val preDrop = Layout.snapshotVersions(spark, dir).last
    spark.sql(s"ALTER TABLE $cat.db.e DROP COLUMN note")
    assert(!spark.sql(s"SELECT * FROM $cat.db.e").columns.contains("note"))
    assert(Layout.snapshotRead(spark, dir, preDrop).columns
      .contains("note"))
  }

  test("declared keys (graft.key): SQL UPDATE and DELETE record typed-feed cdc") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.k (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.key' = 'k')")
    x.sql(s"INSERT INTO $cat.db.k VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val dir = s"$root/db/k"
    assert(Layout.snapshotKeyCols(x, dir) === Seq("k"))
    assert(x.sql(s"SHOW TBLPROPERTIES $cat.db.k").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .contains(("graft.key", "k")))
    // SQL UPDATE on a keyed table: the typed feed replays it
    x.sql(s"UPDATE $cat.db.k SET s = 'B' WHERE k = 2")
    val v = Layout.snapshotVersions(x, dir).last
    assert(Layout.snapshotChangesTyped(x, dir, v - 1, v)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
      === Set(("delete", 2L), ("insert", 2L)))
    // ...and the SQL door records pre-images like the Scala door, so
    // the image-mode feed shows the old AND new row for the update
    assert(Layout.snapshotChangesTyped(x, dir, v - 1, v,
        updateImages = true)
      .select("_change_type", "k", "s")
      .as[(String, Long, String)].collect().toSet
      === Set(("update_preimage", 2L, "b"),
        ("update_postimage", 2L, "B")))
    // SQL DELETE likewise
    x.sql(s"DELETE FROM $cat.db.k WHERE k = 1")
    val v2 = Layout.snapshotVersions(x, dir).last
    assert(Layout.snapshotChangesTyped(x, dir, v2 - 1, v2)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
      === Set(("delete", 1L)))
    // the declaration survives an ADD COLUMNS evolve
    x.sql(s"ALTER TABLE $cat.db.k ADD COLUMNS (note STRING)")
    assert(Layout.snapshotKeyCols(x, dir) === Seq("k"))
    // declaring a key on an EXISTING append-created table (Scala door)
    val d2 = s"$root/db/plain"
    Layout.snapshotAppend(Seq((1L, "x"), (2L, "y")).toDF("k", "s"), d2)
    assert(Layout.snapshotKeyCols(x, d2).isEmpty)
    Layout.snapshotDeclareKeys(x, d2, Seq("k"))
    assert(Layout.snapshotKeyCols(x, d2) === Seq("k"))
    Layout.snapshotUpdateWhere(x, d2, col("k") === 2L,
      Seq("s" -> lit("Y")), keyCols = Layout.snapshotKeyCols(x, d2))
    val v3 = Layout.snapshotVersions(x, d2).last
    assert(Layout.snapshotChangesTyped(x, d2, v3 - 1, v3)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
      === Set(("delete", 2L), ("insert", 2L)))
    // a bad key column in TBLPROPERTIES refuses at CREATE
    intercept[Exception] {
      x.sql(s"CREATE TABLE $cat.db.bad (k BIGINT) " +
        "TBLPROPERTIES ('graft.key' = 'nope')")
    }
  }

  test("extensions session: SQL reads apply a live MOR overlay instead of refusing") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.o (k BIGINT, s STRING)")
    x.sql(s"INSERT INTO $cat.db.o VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val dir = s"$root/db/o"
    Layout.snapshotDeleteKeys(x, dir, Seq(1L).toDF("k"), Seq("k"))
    // the plain session still refuses (honest: no rule to apply the
    // overlay)…
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.db.o").collect() }
    // …the extensions session answers, overlay applied
    assert(x.sql(s"SELECT k, s FROM $cat.db.o ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((2L, "b"), (3L, "c")))
    // aggregation over the rewritten read binds references unchanged
    assert(x.sql(s"SELECT count(*), sum(k) FROM $cat.db.o WHERE k > 0")
      .head() === org.apache.spark.sql.Row(2L, 5L))
    // time travel at the overlaid version applies its overlay too; the
    // version BELOW the delete still reads in full
    val vDel = Layout.snapshotVersions(x, dir).last
    assert(x.sql(s"SELECT k FROM $cat.db.o VERSION AS OF $vDel ORDER BY k")
      .as[Long].collect().toSeq === Seq(2L, 3L))
    assert(x.sql(
      s"SELECT k FROM $cat.db.o VERSION AS OF ${vDel - 1} ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // WRITE positions stay exempt: an append lands (the overlay never
    // touches newer files), and the read after it composes both
    x.sql(s"INSERT INTO $cat.db.o VALUES (4, 'd')")
    assert(x.sql(s"SELECT k FROM $cat.db.o ORDER BY k")
      .as[Long].collect().toSeq === Seq(2L, 3L, 4L))
    // the read side of INSERT…SELECT from the SAME overlaid table is a
    // read: overlay-applied rows flow into the append
    x.sql(s"INSERT INTO $cat.db.o SELECT k + 100, s FROM $cat.db.o " +
      "WHERE k = 2")
    assert(x.sql(s"SELECT k FROM $cat.db.o ORDER BY k")
      .as[Long].collect().toSeq === Seq(2L, 3L, 4L, 102L))
    // the file-granular DML commits keep their own live-overlay
    // refusal — the rule must NOT have rewritten the DELETE's target
    val e = intercept[Exception] {
      x.sql(s"DELETE FROM $cat.db.o WHERE k = 3")
    }
    assert(e.getMessage.contains("merge-on-read") ||
      Option(e.getCause).exists(_.getMessage.contains("merge-on-read")))
  }

  test("extensions session: SQL reads resolve mixed rename generations") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.r (k BIGINT, price DOUBLE)")
    x.sql(s"INSERT INTO $cat.db.r VALUES (1, 10.0), (2, 20.0)")
    x.sql(s"ALTER TABLE $cat.db.r RENAME COLUMN price TO amount")
    x.sql(s"INSERT INTO $cat.db.r VALUES (3, 30.0)")
    // plain session refuses while generations mix; extensions resolve
    // the field-ID log per file generation
    intercept[Exception] {
      spark.sql(s"SELECT amount FROM $cat.db.r").collect()
    }
    assert(x.sql(s"SELECT k, amount FROM $cat.db.r ORDER BY k")
      .as[(Long, Double)].collect().toSeq
      === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // once compacted, the SAME statement goes back to the stock
    // delegated parquet scan (the rule only fires when needed)
    Layout.snapshotCompact(x, s"$root/db/r")
    val plan = x.sql(s"SELECT amount FROM $cat.db.r WHERE amount > 15")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"expected stock scan in:\n$plan")
  }

  test("TBLPROPERTIES graft.cluster declares the maintenance order") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.cl (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.cluster' = 'k')")
    val dir = s"$root/db/cl"
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("k"))
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.db.cl").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .contains(("graft.cluster", "k")))
    // the declaration survives SQL-door inserts (append carries the
    // schema of record forward)
    spark.sql(s"INSERT INTO $cat.db.cl VALUES (2, 'b'), (1, 'a')")
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("k"))
    // a bad column refuses at CREATE
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.bad2 (k BIGINT) " +
        "TBLPROPERTIES ('graft.cluster' = 'nope')")
    }
    // SET/UNSET TBLPROPERTIES re-declare on a LIVE table
    spark.sql(s"ALTER TABLE $cat.db.cl " +
      "SET TBLPROPERTIES ('graft.cluster' = 's')")
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("s"))
    spark.sql(s"ALTER TABLE $cat.db.cl " +
      "SET TBLPROPERTIES ('graft.key' = 'k')")
    assert(Layout.snapshotKeyCols(spark, dir) === Seq("k"))
    spark.sql(s"ALTER TABLE $cat.db.cl UNSET TBLPROPERTIES ('graft.cluster')")
    assert(Layout.snapshotClusterCols(spark, dir).isEmpty)
    // arbitrary properties and UNSET of keys refuse
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.cl SET TBLPROPERTIES ('x' = 'y')")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.cl UNSET TBLPROPERTIES ('graft.key')")
    }
  }

  test("ALTER TABLE t@branch ADD COLUMNS stages on the branch; other " +
      "change kinds refuse with the land-on-main remedy") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.mg (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.key' = 'k')")
    x.sql(s"INSERT INTO $cat.db.mg VALUES (1, 'a'), (2, 'b')")
    val dir = s"$root/db/mg"
    x.sql(s"CALL $cat.system.branch('db.mg', 'mig')")
    x.sql(s"ALTER TABLE $cat.db.`mg@mig` ADD COLUMNS (note STRING)")
    assert(x.table(s"$cat.db.mg").columns.toSeq === Seq("k", "s"),
      "the staged ADD must be invisible to the main identifier")
    assert(x.table(s"$cat.db.`mg@mig`").columns.toSeq ===
      Seq("k", "s", "note"))
    // backfill on the branch through the SQL UPDATE door, then publish
    x.sql(s"UPDATE $cat.db.`mg@mig` SET note = concat('n', s)")
    x.sql(s"CALL $cat.system.fast_forward('db.mg', 'mig')")
    assert(x.sql(s"SELECT k, note FROM $cat.db.mg ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "na"), (2L, "nb")),
      "ONE publish ships the ALTER and its backfill")
    assert(Layout.snapshotKeyCols(x, dir) === Seq("k"),
      "the key declaration survives the staged evolve")
    // RENAME COLUMN stages too (round 17), ALTER COLUMN TYPE too
    // (round 18) — here both refuse on the LIVE overlay the published
    // backfill left (key files carry the current names/types); DROP
    // keeps the land-on-main refusal
    x.sql(s"CALL $cat.system.branch('db.mg', 'mig2')")
    assert(intercept[Exception] {
      x.sql(s"ALTER TABLE $cat.db.`mg@mig2` RENAME COLUMN s TO label")
    }.getMessage.contains("overlay"))
    assert(intercept[Exception] {
      x.sql(s"ALTER TABLE $cat.db.`mg@mig2` ALTER COLUMN k TYPE DOUBLE")
    }.getMessage.contains("overlay"))
    assert(intercept[Exception] {
      x.sql(s"ALTER TABLE $cat.db.`mg@mig2` DROP COLUMN s")
    }.getMessage.contains("land it on main"))
  }

  test("snapshot_takedowns resolves a CATALOG identifier (round 18): " +
      "an auditor in a SQL-only session needs no physical path") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.docs (doc_id BIGINT, text STRING)")
    spark.sql(s"INSERT INTO $cat.db.docs VALUES (1, 'a'), (2, 'b'), " +
      "(3, 'c')")
    val dir = s"$root/db/docs"
    graft.ops.Govern.takedownCascade(spark, dir,
      Seq(2L).toDF("doc_id"), Seq("doc_id"), Nil)
    graft.plans.SnapshotTvf.ensureSqlDoor(spark)
    // identifier form == directory form, row for row
    val viaIdent = spark.sql(
      s"SELECT * FROM snapshot_takedowns('$cat.db.docs')").collect()
    val viaDir = spark.sql(
      s"SELECT * FROM snapshot_takedowns('$dir')").collect()
    assert(viaIdent.toSeq === viaDir.toSeq && viaIdent.nonEmpty)
    assert(spark.sql(s"SELECT count(*) FROM " +
        s"snapshot_takedowns('$cat.db.docs') WHERE completed AND " +
        "opened_at IS NOT NULL AND completed_at IS NOT NULL")
      .as[Long].head() === 1L,
      "the identifier door serves the instant-bearing evidence")
  }

  test("DELETE FROM lands a file-granular copy-on-write commit") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.d (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.d VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"INSERT INTO $cat.db.d VALUES (4, 'd'), (5, 'e')")
    spark.sql(s"DELETE FROM $cat.db.d WHERE k <= 2 OR s = 'e'")
    assert(spark.sql(s"SELECT k FROM $cat.db.d ORDER BY k")
      .as[Long].collect().toSeq === Seq(3L, 4L))
    // the delete was a new snapshot commit — time travel still sees all
    val dir = s"$root/db/d"
    val versions = Layout.snapshotVersions(spark, dir)
    assert(versions.size === 4) // create, 2 inserts, delete
    assert(Layout.snapshotRead(spark, dir, versions(2)).count() === 5)
    // both doors agree after the SQL delete
    assert(Layout.snapshotRead(spark, dir).count() === 2)
    // TRUNCATE rides SupportsDelete's default (deleteWhere(true)) — a
    // copy-on-write commit too, so history above it still time-travels
    spark.sql(s"TRUNCATE TABLE $cat.db.d")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d").head().getLong(0)
      === 0)
    assert(Layout.snapshotRead(spark, dir,
      Layout.snapshotVersions(spark, dir).last - 1).count() === 2)
  }

  test("RENAME TO refuses when the destination PATH exists in any form") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.src (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns.src VALUES (1)")
    // an obstruction that is NOT a committed table: a plain directory
    // (namespace dir / torn CREATE leftover). Hadoop's rename would
    // move the source INSIDE it and report success — the table would
    // land at ns/dst/src, unreachable under both identifiers.
    val obstruction = new Path(s"$root/ns/dst")
    val fs = obstruction.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(obstruction)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.src RENAME TO ns.dst")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // nothing moved: the source still answers, the obstruction is empty
    assert(spark.sql(s"SELECT k FROM $cat.ns.src").head().getLong(0) === 1)
    assert(!fs.exists(new Path(obstruction, "src")))
  }

  test("ALTER TABLE mixing change kinds refuses; one kind per statement") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.m (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.m VALUES (1, 'a')")
    // two property declarations = two separate metadata commits — a
    // mid-sequence failure would leave the table half-altered
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.m SET TBLPROPERTIES " +
        "('graft.key' = 'k', 'graft.cluster' = 'k')")
    }
    assert(e.getMessage.contains("ONE change kind"), e.getMessage)
    // split into one statement per kind, both land
    spark.sql(s"ALTER TABLE $cat.db.m SET TBLPROPERTIES ('graft.key' = 'k')")
    spark.sql(
      s"ALTER TABLE $cat.db.m SET TBLPROPERTIES ('graft.cluster' = 'k')")
    val dir = s"$root/db/m"
    assert(Layout.snapshotKeyCols(spark, dir) === Seq("k"))
    assert(Layout.snapshotClusterCols(spark, dir) === Seq("k"))
    // and no half-altered state survived the refusal path: the refused
    // statement committed NOTHING (history holds create + insert +
    // exactly two declare commits)
    assert(Layout.snapshotVersions(spark, dir).size === 4)
  }

  test("nested struct evolution: ADD inside a struct is real " +
      "(null-backfilled across generations); rename/drop stay pinned " +
      "refusals with the full-rewrite remedy") {
    val (cat, dir0) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.n (k BIGINT, " +
      "meta STRUCT<width: INT, codec: STRING, deep: STRUCT<x: INT>>)")
    spark.sql(s"INSERT INTO $cat.db.n VALUES " +
      "(1, struct(640, 'h264', struct(7)))")
    // ADD a field INSIDE the struct: metadata-only evolve; the
    // generation-1 file above never rewrites
    val filesBefore = Layout.snapshotRead(spark, s"$dir0/db/n")
      .inputFiles.toSet
    spark.sql(s"ALTER TABLE $cat.db.n ADD COLUMNS (meta.lang STRING)")
    spark.sql(s"INSERT INTO $cat.db.n VALUES " +
      "(2, struct(1280, 'av1', struct(9), 'en'))")
    // read across generations: the old file null-fills meta.lang, the
    // new one carries it; nested projections resolve on both
    val rows = spark.sql(
      s"SELECT k, meta.codec, meta.lang FROM $cat.db.n ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2))))
    assert(rows.toSeq === Seq((1L, "h264", None), (2L, "av1", Some("en"))))
    assert(filesBefore.subsetOf(
      Layout.snapshotRead(spark, s"$dir0/db/n").inputFiles.toSet),
      "the nested add must be metadata-only (no rewrite of old files)")
    // appends now contract on the WIDENED struct: a batch with the old
    // narrow shape refuses (same-schema append contract)
    val narrow = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.db.n VALUES (3, " +
        "named_struct('width', 1, 'codec', 'x', 'deep', struct(1)))")
    }.getMessage.toLowerCase
    assert(narrow.contains("schema") || narrow.contains("missing fields"),
      narrow)
    // ADD recurses to any struct depth (by-name null-fill is recursive)
    spark.sql(s"ALTER TABLE $cat.db.n ADD COLUMNS (meta.deep.f INT)")
    spark.sql(s"INSERT INTO $cat.db.n VALUES " +
      "(5, struct(320, 'vp9', struct(3, 42), 'fr'))")
    val deep = spark.sql(
      s"SELECT k, meta.deep.f FROM $cat.db.n WHERE k IN (1, 5) ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(deep.toSeq === Seq((1L, None), (5L, Some(42))),
      "old generations null-fill the depth-2 added field")
    // a missing parent and a non-struct parent refuse with the mistake
    // (the analyzer catches the missing parent before the catalog does)
    val miss = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.n ADD COLUMNS (nope.f INT)")
    }.getMessage
    assert(miss.contains("no column") ||
      miss.contains("cannot be resolved"), miss)
    val nonStruct = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.n ADD COLUMNS (k.f INT)")
    }.getMessage
    assert(nonStruct.contains("not a struct") ||
      nonStruct.toLowerCase.contains("struct"), nonStruct)
    // duplicate nested field refuses
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.n ADD COLUMNS (meta.lang STRING)")
    }.getMessage.contains("already exists"))
    // rename/drop INSIDE a struct: the pinned refusal, with the
    // reasoned remedy — never corrupt
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.n RENAME COLUMN meta.codec TO fmt")
    }
    assert(e.getMessage.contains("top-level") &&
      e.getMessage.contains("full rewrite"), e.getMessage)
    val d = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.n DROP COLUMN meta.width")
    }
    assert(d.getMessage.contains("top-level") &&
      d.getMessage.contains("full rewrite"), d.getMessage)
    // the table is untouched and still answers
    assert(spark.sql(s"SELECT meta.codec FROM $cat.db.n WHERE k = 1")
      .head().getString(0) === "h264")
  }

  test("CALL system.compact: a SQL-only session goes from MOR refusal to served") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.c VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    // a takedown lands as a merge-on-read overlay: zero file churn
    val dir = s"$root/db/c"
    Layout.snapshotDeleteKeys(spark, dir, Seq(2L).toDF("k"), Seq("k"))
    // the plain delegated scan refuses (this suite's session has no
    // extensions overlay rule) and the remedy names snapshotCompact...
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.c").collect()
    }
    assert(e.getMessage.contains("snapshotCompact"), e.getMessage)
    // ...which a SQL-only session can now actually RUN
    val v = spark.sql(s"CALL $cat.system.compact('db.c')")
      .head().getLong(0)
    assert(v === Layout.snapshotVersions(spark, dir).last)
    assert(spark.sql(s"SELECT k FROM $cat.db.c ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L))
  }

  test("CALL system.cluster / zorder: SQL-only re-clustering with the " +
      "stats-pruning payoff") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.z (k BIGINT, xb BIGINT, yb BIGINT)")
    // four interleaved inserts: every file spans the whole domain on
    // both dims, so a range read pre-cluster opens everything
    (0 to 3).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.z SELECT id, id % 100, (id * 7) % 100 " +
        s"FROM range(${i * 2000}, ${i * 2000 + 2000})"))
    val dir = s"$root/db/z"
    def boxFiles: Int = Layout.snapshotReadWhere(spark, dir,
      org.apache.spark.sql.functions.col("xb") < 10 &&
        org.apache.spark.sql.functions.col("yb") < 10).inputFiles.length
    val v = spark.sql(
      s"CALL $cat.system.zorder('db.z', 'xb', 'yb', ${16L << 10})")
      .head().getLong(0)
    assert(v === Layout.snapshotVersions(spark, dir).last)
    val total = Layout.snapshotRead(spark, dir).inputFiles.length
    assert(total > 2 && boxFiles < total,
      s"z-ordered 2-D box read must prune ($boxFiles of $total)")
    // values are layout-independent
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.z " +
      "WHERE xb < 10 AND yb < 10").head().getLong(0) ===
      spark.range(0, 8000).filter(c => c % 100 < 10 && (c * 7) % 100 < 10)
        .count())
    // the 1-D sibling: range re-cluster by k, range reads prune
    val v2 = spark.sql(
      s"CALL $cat.system.cluster('db.z', 'k', ${16L << 10})")
      .head().getLong(0)
    assert(v2 > v)
    val kFiles = Layout.snapshotReadWhere(spark, dir,
      org.apache.spark.sql.functions.col("k") < 500).inputFiles.length
    val kTotal = Layout.snapshotRead(spark, dir).inputFiles.length
    assert(kTotal > 2 && kFiles < kTotal,
      s"clustered range read must prune ($kFiles of $kTotal)")
    // refusal: empty column list
    assert(intercept[Exception] {
      spark.sql(s"CALL $cat.system.cluster('db.z', ' ')").collect()
    }.getMessage.contains("at least one column"))
  }

  test("DELETE FROM a branch identifier: a keyed table stages the " +
      "takedown; an unkeyed one refuses at analysis") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.bd (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.key' = 'k')")
    x.sql(s"INSERT INTO $cat.db.bd VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    x.sql(s"CALL $cat.system.branch('db.bd', 'audit')")
    x.sql(s"INSERT INTO $cat.db.`bd@audit` VALUES (4, 'd'), (5, 'e')")
    x.sql(s"DELETE FROM $cat.db.`bd@audit` WHERE k = 2 OR k = 5")
    // invisible to main; the branch serves net of the staged takedown
    assert(x.sql(s"SELECT k FROM $cat.db.bd ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    assert(x.sql(s"SELECT k FROM $cat.db.`bd@audit` ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L, 4L))
    x.sql(s"CALL $cat.system.fast_forward('db.bd', 'audit')")
    assert(x.sql(s"SELECT k FROM $cat.db.bd ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L, 4L))
    // no key contract → the door refuses while planning, not mid-write
    x.sql(s"CREATE TABLE $cat.db.nk (k BIGINT)")
    x.sql(s"INSERT INTO $cat.db.nk VALUES (1)")
    x.sql(s"CALL $cat.system.branch('db.nk', 'audit')")
    intercept[Exception] {
      x.sql(s"DELETE FROM $cat.db.`nk@audit` WHERE k = 1")
    }
    // a delete-ALL (TRUNCATE routes through the same door) is not a
    // staged takedown even on a keyed table — wiping the base rows is
    // the restore/drop_branch contract, not an audit
    x.sql(s"CALL $cat.system.branch('db.bd', 'audit2')")
    intercept[Exception] {
      x.sql(s"TRUNCATE TABLE $cat.db.`bd@audit2`")
    }
    intercept[Exception] {
      x.sql(s"DELETE FROM $cat.db.`bd@audit2` WHERE true")
    }
  }

  test("CALL system.restore/tag/drop_tag/expire: the version story in SQL text") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.r (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.r VALUES (1, 'a'), (2, 'b')")   // v2
    val tagged = spark.sql(s"CALL $cat.system.tag('db.r', 'release-1')")
      .head().getLong(0)
    assert(tagged === 2L)
    // the bad write: an overwrite clobbers the corpus               v3
    spark.sql(s"INSERT OVERWRITE $cat.db.r VALUES (9, 'BAD')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.r")
      .head().getLong(0) === 1)
    // rollback by tag name, pure SQL                                v4
    val r = spark.sql(s"CALL $cat.system.restore('db.r', 'release-1')")
      .head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    assert(spark.sql(s"SELECT k FROM $cat.db.r ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // maintenance doors: expire respects the tag, drop_tag releases it
    assert(spark.sql(
      s"CALL $cat.system.expire('db.r', 1, orphan_grace_ms => 0)")
      .head().getInt(0) >= 1)
    assert(spark.sql(s"SELECT k FROM $cat.db.r VERSION AS OF 'release-1'")
      .count() === 2)
    assert(spark.sql(s"CALL $cat.system.drop_tag('db.r', 'release-1')")
      .head().getBoolean(0))
    // unknown procedure refuses at load; the cause names the inventory
    val p = intercept[Exception] {
      spark.sql(s"CALL $cat.system.vacuum('db.r')")
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(p.getMessage.contains("FAILED_TO_LOAD_ROUTINE") &&
      chain(p).contains("compact"), chain(p))
    val dir = s"$root/db/r"
    assert(Layout.snapshotVersions(spark, dir).nonEmpty)
  }

  test("CALL system.branch/fast_forward/drop_branch: write-audit-publish " +
      "in SQL text") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.w (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.w VALUES (1, 'a'), (2, 'b')")   // v2
    val dir = s"$root/db/w"
    val base = spark.sql(s"CALL $cat.system.branch('db.w', 'audit')")
      .head().getLong(0)
    assert(base === 2L)
    Layout.snapshotBranchAppend(Seq((3L, "c"), (4L, "d")).toDF("k", "s"),
      dir, "audit")
    // staged rows invisible through the catalog read
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.w")
      .head().getLong(0) === 2)
    val pub = spark.sql(s"CALL $cat.system.fast_forward('db.w', 'audit')")
      .head().getLong(0)
    assert(pub === 3L)
    assert(spark.sql(s"SELECT k FROM $cat.db.w ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
    assert(spark.sql(s"CALL $cat.system.drop_branch('db.w', 'audit')")
      .head().getBoolean(0))
    assert(Layout.snapshotBranches(spark, dir).isEmpty)
  }

  test("t@branch: the SQL-only write-audit-publish cycle — stage by " +
      "INSERT, audit by SELECT, publish by CALL") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.b (k BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.b VALUES (1, 'a'), (2, 'b')")   // v2
    spark.sql(s"CALL $cat.system.branch('db.b', 'audit')")
    // STAGE through SQL: the branch-qualified identifier routes the
    // append to the branch namespace
    spark.sql(s"INSERT INTO $cat.db.`b@audit` VALUES (3, 'c'), (4, 'd')")
    // AUDIT through SQL: branch read serves base + staged …
    assert(spark.sql(s"SELECT k FROM $cat.db.`b@audit` ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
    // … while main still serves only its own rows
    assert(spark.sql(s"SELECT k FROM $cat.db.b ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // PUBLISH through SQL
    spark.sql(s"CALL $cat.system.fast_forward('db.b', 'audit')")
    assert(spark.sql(s"SELECT k FROM $cat.db.b ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
    // refusals: heavier DML and time travel stay off branches
    assert(intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.db.`b@audit` VALUES (9, 'x')")
    }.getMessage.contains("stage appends"))
    assert(intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.db.`b@audit` WHERE k = 1")
    }.getMessage.toLowerCase.contains("delete"))
    assert(intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.`b@audit` VERSION AS OF 2")
    }.getMessage.contains("branch"))
    assert(intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.`b@nope`").collect()
    }.getMessage.contains("no branch"))
    assert(intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.`x@y` (k BIGINT)")
    }.getMessage.contains("reserved"))
  }

  test("t@branch read under extensions: a live base takedown rides the " +
      "branch's overlay-aware read") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.bo (k BIGINT, s STRING)")
    x.sql(s"INSERT INTO $cat.db.bo VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = s"$root/db/bo"
    // live merge-on-read takedown on MAIN, then branch: the branch
    // carries the overlay line
    Layout.snapshotDeleteKeys(x, dir, Seq(2L).toDF("k"), Seq("k"))
    x.sql(s"CALL $cat.system.branch('db.bo', 'audit')")
    Layout.snapshotBranchAppend(Seq((4L, "d")).toDF("k", "s"), dir,
      "audit")
    // without extensions the delegated branch scan refuses honestly
    assert(intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.`bo@audit`").collect()
    }.getMessage.contains("snapshotCompact"))
    // with extensions the overlay rule swaps in the branch read
    assert(x.sql(s"SELECT k FROM $cat.db.`bo@audit` ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L, 4L))
  }

  test("CALL system.maintain: policy compaction + retention in one SQL verb") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.mm (k BIGINT)")
    (1 to 10).foreach(i => spark.sql(s"INSERT INTO $cat.db.mm VALUES ($i)"))
    val dir = s"$root/db/mm"
    val nFilesBefore = Layout.snapshotRead(spark, dir).inputFiles.length
    assert(nFilesBefore >= 10)
    val row = spark.sql(s"CALL $cat.system.maintain('db.mm', " +
      "keep_age_ms => 0, orphan_grace_ms => 0)").head()
    assert(row.getBoolean(0), "small-file sprawl must trigger compaction")
    assert(row.getInt(1) >= 1, "aged history must expire")
    assert(Layout.snapshotRead(spark, dir).inputFiles.length < nFilesBefore)
    assert(spark.sql(s"SELECT sum(k) FROM $cat.db.mm").head().getLong(0)
      === 55)
  }

  test("CALL restore to an overlay-live version: extensions reads serve it") {
    val (cat, root) = newCatalog()
    val x = org.apache.spark.sql.GraftSessionBridge
      .withGraftExtensions(spark)
    x.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$cat.root", root)
    x.sql(s"CREATE TABLE $cat.db.rv (k BIGINT, s STRING)")
    x.sql(s"INSERT INTO $cat.db.rv VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = s"$root/db/rv"
    Layout.snapshotDeleteKeys(x, dir, Seq(2L).toDF("k"), Seq("k")) // v3
    x.sql(s"CALL $cat.system.tag('db.rv', 'takedown')")
    x.sql(s"CALL $cat.system.compact('db.rv')")   // materialize    v4
    x.sql(s"INSERT INTO $cat.db.rv VALUES (9,'z')")               // v5
    // roll back to the overlay-LIVE tagged version: the restored HEAD
    // carries the delete line + pre-compaction files, so the plain
    // delegated scan cannot serve it — the extensions overlay rule
    // must, with the overlay applied
    x.sql(s"CALL $cat.system.restore('db.rv', 'takedown')")        // v6
    assert(x.sql(s"SELECT k FROM $cat.db.rv ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L))
    // a session WITHOUT extensions refuses the same read honestly,
    // naming the CALL-able remedy
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.rv").collect()
    }
    assert(e.getMessage.contains("snapshotCompact"), e.getMessage)
    spark.sql(s"CALL $cat.system.compact('db.rv')")
    assert(spark.sql(s"SELECT k FROM $cat.db.rv ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L))
  }
}
