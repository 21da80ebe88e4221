package graft.plans

import org.apache.spark.sql.{GraftSessionBridge, SparkSession}

import graft.SparkSpec
import graft.ops.Layout

/** SQL `MERGE INTO` against catalog snapshot tables
  * ([[SnapshotMergeRule]]): every branch shape lands in the same
  * [[Layout.snapshotMergeInto]] commit the Scala API uses, unsupported
  * shapes refuse at analysis with a pointer at the Scala API, and both
  * doors observe each other's writes. */
class SnapshotMergeSqlSpec extends SparkSpec {

  private lazy val x: SparkSession =
    GraftSessionBridge.withGraftExtensions(spark)

  private def newTable(rows: String): (String, String) = {
    val name = s"gm${System.nanoTime()}"
    val root = tmpDir("graftmerge")
    x.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$name.root", root)
    x.sql(s"CREATE TABLE $name.db.t (k BIGINT, s STRING, v DOUBLE)")
    x.sql(s"INSERT INTO $name.db.t VALUES $rows")
    (s"$name.db.t", s"$root/db/t")
  }

  test("upsert fast path: symmetric UPDATE SET * / INSERT * branches") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    val out = x.sql(s"""
      MERGE INTO $t AS t
      USING (SELECT * FROM VALUES (2, 'B', 20.0), (9, 'i', 9.0)
             AS src(k, s, v)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect()
    // the command reports the committed snapshot version
    assert(out.map(_.getLong(0)).toSeq ===
      Seq(Layout.snapshotVersions(x, dir).last))
    assert(x.sql(s"SELECT k, s, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0), (9L, "i", 9.0)))
  }

  test("MERGE INTO a branch stages the keyed upsert (takedown + append), " +
      "invisible to main until publish; the feed replays old/new values") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    val cat = t.split('.').head
    x.sql(s"CALL $cat.system.branch('db.t', 'audit')")
    x.sql(s"INSERT INTO $cat.db.`t@audit` VALUES (4, 'd', 4.0)")
    x.sql(s"""
      MERGE INTO $cat.db.`t@audit` AS t
      USING (SELECT * FROM VALUES (2, 'B', 20.0), (4, 'D', 40.0),
             (9, 'i', 9.0) AS src(k, s, v)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    def rowsOf(q: String) = x.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // the staged upsert is invisible to main…
    assert(rowsOf(s"SELECT k, s, v FROM $t ORDER BY k") ===
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    // …while the branch identifier serves the merged state: committed
    // row updated, staged row updated, new key inserted
    assert(rowsOf(s"SELECT k, s, v FROM $cat.db.`t@audit` ORDER BY k") ===
      Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
        (4L, "D", 40.0), (9L, "i", 9.0)))
    x.sql(s"CALL $cat.system.fast_forward('db.t', 'audit')")        // v3
    assert(rowsOf(s"SELECT k, s, v FROM $t ORDER BY k") ===
      Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
        (4L, "D", 40.0), (9L, "i", 9.0)))
    // the typed feed across the publish: the replaced committed row as
    // a delete with its OLD values, everything new as inserts (a
    // staged-then-updated row was never visible to main and emits only
    // its final value)
    import x.implicits._
    val delta = Layout.snapshotChangesTyped(x, dir, 2L, 3L)
      .select("_change_type", "k", "s", "v")
      .as[(String, Long, String, Double)].collect().toSet
    assert(delta === Set(
      ("delete", 2L, "b", 2.0),
      ("insert", 2L, "B", 20.0),
      ("insert", 4L, "D", 40.0),
      ("insert", 9L, "i", 9.0)))
  }

  test("branch MERGE: an all-new-keys upsert stages ONE append (no " +
      "pointless overlay); a MATCHED DELETE stages tombstones") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    val cat = t.split('.').head
    x.sql(s"CALL $cat.system.branch('db.t', 'audit')")
    val tipBefore = Layout.snapshotBranches(x, dir)("audit")._2
    x.sql(s"""
      MERGE INTO $cat.db.`t@audit` AS t
      USING (SELECT * FROM VALUES (8, 'h', 8.0), (9, 'i', 9.0)
             AS src(k, s, v)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val tipAfter = Layout.snapshotBranches(x, dir)("audit")._2
    assert(tipAfter === tipBefore + 1,
      "an all-new-keys upsert must stage exactly one append commit — " +
        "no takedown for keys the branch never held")
    // MERGE-shaped staged takedown: matched keys delete, rest untouched
    x.sql(s"""
      MERGE INTO $cat.db.`t@audit` AS t
      USING (SELECT * FROM VALUES (CAST(1 AS BIGINT)) AS src(k)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(x.sql(s"SELECT k FROM $cat.db.`t@audit` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 8L, 9L))
    assert(x.sql(s"SELECT k FROM $t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L),
      "a staged MERGE DELETE must stay invisible to main")
  }

  test("UPDATE a branch stages the keyed rewrite through the MOR " +
      "grammar; undeclared tables and key-column assignment refuse") {
    val name = s"gu${System.nanoTime()}"
    val root = tmpDir("graftupd")
    x.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    x.conf.set(s"spark.sql.catalog.$name.root", root)
    x.sql(s"CREATE TABLE $name.db.t (k BIGINT, s STRING, v DOUBLE) " +
      "TBLPROPERTIES ('graft.key' = 'k')")
    x.sql(s"INSERT INTO $name.db.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    x.sql(s"CALL $name.system.branch('db.t', 'audit')")
    x.sql(s"INSERT INTO $name.db.`t@audit` VALUES (3, 'c', 3.0)")
    // the staged rewrite touches a committed row AND a staged row
    x.sql(s"UPDATE $name.db.`t@audit` SET v = v + 10, s = upper(s) " +
      "WHERE k >= 2")
    def rowsOf(t: String) = x.sql(s"SELECT k, s, v FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(rowsOf(s"$name.db.t") ===
      Seq((1L, "a", 1.0), (2L, "b", 2.0)),
      "a staged UPDATE must be invisible to main")
    assert(rowsOf(s"$name.db.`t@audit`") ===
      Seq((1L, "a", 1.0), (2L, "B", 12.0), (3L, "C", 13.0)))
    x.sql(s"CALL $name.system.fast_forward('db.t', 'audit')")
    assert(rowsOf(s"$name.db.t") ===
      Seq((1L, "a", 1.0), (2L, "B", 12.0), (3L, "C", 13.0)))
    // refusal 1: assigning a key column on a branch (identity change)
    x.sql(s"CALL $name.system.branch('db.t', 'again')")
    val e1 = intercept[Exception] {
      x.sql(s"UPDATE $name.db.`t@again` SET k = k + 100 WHERE k = 1")
    }
    assert(e1.getMessage.contains("key column"), e1.getMessage)
    // refusal 2: an undeclared table names the declare-or-MERGE remedy
    x.sql(s"CREATE TABLE $name.db.u (k BIGINT, v DOUBLE)")
    x.sql(s"INSERT INTO $name.db.u VALUES (1, 1.0)")
    x.sql(s"CALL $name.system.branch('db.u', 'a')")
    val e2 = intercept[Exception] {
      x.sql(s"UPDATE $name.db.`u@a` SET v = 2.0 WHERE k = 1")
    }
    assert(e2.getMessage.contains("declares no keys") &&
      e2.getMessage.contains("MERGE"), e2.getMessage)
  }

  test("explicit assignments with source-side expressions and casts") {
    val (t, _) = newTable("(1, 'a', 1.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 1 AS kk, 'z' AS name) s
      ON t.k = s.kk
      WHEN MATCHED THEN
        UPDATE SET k = s.kk, s = upper(s.name), v = s.kk * 2 + 0.5""")
    assert(x.sql(s"SELECT k, s, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "Z", 2.5)))
  }

  test("guarded CDC: MATCHED DELETE + UPDATE + guarded INSERT (general path)") {
    val (t, _) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT * FROM VALUES
               (1, 'x', 0.0, 'D'),   -- matched tombstone → delete
               (2, 'B', 22.0, 'U'),  -- matched update
               (7, 'g', 7.0, 'U'),   -- unmatched insert
               (8, 'h', 0.0, 'D')    -- unmatched tombstone → no-op
             AS src(k, s, v, op)) s
      ON t.k = s.k
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET k = s.k, s = s.s, v = s.v
      WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, s, v)
        VALUES (s.k, s.s, s.v)""")
    assert(x.sql(s"SELECT k, s, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((2L, "B", 22.0), (3L, "c", 3.0), (7L, "g", 7.0)))
  }

  test("update-only: unmatched source rows do NOT insert") {
    val (t, _) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT * FROM VALUES (2, 'B', 20.0), (9, 'i', 9.0)
             AS src(k, s, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""")
    assert(x.sql(s"SELECT k, s FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B")))
  }

  test("insert-only: matched source rows do NOT update (insert-if-absent)") {
    val (t, _) = newTable("(1, 'a', 1.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT * FROM VALUES (1, 'CLOBBER', 0.0), (2, 'b', 2.0)
             AS src(k, s, v)) s
      ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    assert(x.sql(s"SELECT k, s FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }

  test("delete-only and NOT MATCHED BY SOURCE DELETE (full sync)") {
    val (t, _) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 2 AS k) s
      ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(x.sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // full sync: keep only keys present in the source
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 3 AS k, 'C' AS s, 30.0 AS v) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(x.sql(s"SELECT k, s FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((3L, "C")))
  }

  test("partial INSERT null-fills unlisted columns") {
    val (t, _) = newTable("(1, 'a', 1.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 5 AS k, 'e' AS s) s
      ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, s) VALUES (s.k, s.s)""")
    assert(x.sql(s"SELECT k, s, v FROM $t WHERE k = 5").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).toSeq ===
      Seq((5L, "e", true)))
  }

  test("the merge is one commit, visible to the Scala API with history intact") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    val before = Layout.snapshotVersions(x, dir).size
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 2 AS k, 'B' AS s, 20.0 AS v) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val versions = Layout.snapshotVersions(x, dir)
    assert(versions.size === before + 1)
    // time travel below the merge sees the old row
    assert(Layout.snapshotRead(x, dir, versions(before - 1))
      .where("k = 2").select("s").collect().head.getString(0) === "b")
    assert(Layout.snapshotRead(x, dir).where("k = 2")
      .select("s").collect().head.getString(0) === "B")
  }

  test("SQL UPDATE: file-granular copy-on-write, assignments read the row") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    val out = x.sql(
      s"UPDATE $t SET v = v + 10, s = upper(s) WHERE k >= 2").collect()
    assert(out.map(_.getLong(0)).toSeq ===
      Seq(Layout.snapshotVersions(x, dir).last))
    assert(x.sql(s"SELECT k, s, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 1.0), (2L, "B", 12.0), (3L, "C", 13.0)))
    // unconditioned UPDATE hits every row; it is still a commit with
    // history (time travel below it sees the old values)
    x.sql(s"UPDATE $t SET v = 0.5")
    assert(x.sql(s"SELECT DISTINCT v FROM $t").collect()
      .map(_.getDouble(0)).toSeq === Seq(0.5))
    val versions = Layout.snapshotVersions(x, dir)
    assert(Layout.snapshotRead(x, dir, versions(versions.size - 2))
      .where("k = 1").select("v").collect().head.getDouble(0) === 1.0)
    // a subquery predicate refuses with a pointer at the remedy
    val e = intercept[Exception] { x.sql(
      s"UPDATE $t SET v = 1.0 WHERE k IN (SELECT k FROM $t WHERE v > 0)") }
    assert(e.getMessage.contains("subquery"), e.getMessage)
  }

  test("target-reading conditions: the last-writer-wins guard (AND s.seq > t.v)") {
    val (t, _) = newTable("(1, 'a', 5.0), (2, 'b', 2.0)")
    // row 1's incoming seq (3) is STALE vs the table's v=5 → no update;
    // row 2's seq 9 wins → updated; both through the LWW guard that a
    // row-level CDC apply needs
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT * FROM VALUES (1, 'STALE', 3.0), (2, 'B', 9.0)
             AS src(k, s, v)) s
      ON t.k = s.k
      WHEN MATCHED AND s.v > t.v THEN UPDATE SET *""")
    assert(x.sql(s"SELECT k, s, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 5.0), (2L, "B", 9.0)))
  }

  test("partial UPDATE keeps the target's unassigned columns; values may mix sides") {
    val (t, _) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 1 AS k, 10.0 AS dv) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + s.dv""")
    assert(x.sql(s"SELECT k, s, v FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 11.0), (2L, "b", 2.0)),
      "unassigned column s must keep the target's value")
  }

  test("NOT MATCHED BY SOURCE DELETE honors a target-side condition") {
    val (t, _) = newTable("(1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    // source names only k=1; of the unmatched {2, 3}, the guard keeps 2
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 1 AS k, 'a' AS s, 1.0 AS v) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED BY SOURCE AND t.v > 2.5 THEN DELETE""")
    assert(x.sql(s"SELECT k FROM $t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("unsupported shapes refuse at analysis with a pointer at the Scala API") {
    val (t, _) = newTable("(1, 'a', 1.0)")
    // non-equality ON conjunct
    val e1 = intercept[Exception] { x.sql(s"""
      MERGE INTO $t t USING (SELECT 1 AS k, 'z' AS s, 0.5 AS v) s
      ON t.k = s.k AND t.v > s.v
      WHEN MATCHED THEN UPDATE SET *""") }
    assert(e1.getMessage.contains("key-granular"), e1.getMessage)
    // a NOT MATCHED condition cannot read the target (no row exists)
    val e2 = intercept[Exception] { x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 1 AS k, 'z' AS s, 9.0 AS v) s
      ON t.k = s.k
      WHEN NOT MATCHED AND t.v > 1.0 THEN INSERT *""") }
    assert(e2.getMessage.contains("source only") ||
      e2.getMessage.toLowerCase.contains("cannot be resolved"),
      e2.getMessage)
    // a time-travel target cannot be merged into
    val e4 = intercept[Exception] { x.sql(s"""
      MERGE INTO $t VERSION AS OF 2 t
      USING (SELECT 1 AS k, 'z' AS s, 9.0 AS v) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""") }
    assert(e4.getMessage.contains("time-travel") ||
      e4.getMessage.toLowerCase.contains("syntax"), e4.getMessage)
    // nothing above committed
    assert(x.sql(s"SELECT s FROM $t").collect().head.getString(0) === "a")
  }

  test("graft.cdc.updateImages TBLPROPERTY: SQL MERGE persists " +
      "pre-images; unset tables keep the delete+insert back-compat") {
    import org.apache.spark.sql.functions.col
    def mergeOnce(t: String): Unit = x.sql(s"""
      MERGE INTO $t t
      USING (SELECT * FROM VALUES (2, 'B', 20.0), (9, 'i', 9.0)
             AS src(k, s, v)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    def feedTypes(dir: String): Map[String, Seq[Long]] = {
      val v = Layout.snapshotVersions(x, dir).last
      Layout.snapshotChangesTyped(x, dir, v - 1, v, updateImages = true)
        .select(col("_change_type"), col("k"))
        .collect().groupBy(_.getString(0))
        .map { case (ct, rs) => ct -> rs.map(_.getLong(1)).toSeq.sorted }
    }
    // UNSET property: the merge door's legacy default — no pre record,
    // image-mode feed degrades honestly to delete + insert
    val (t0, dir0) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    mergeOnce(t0)
    val f0 = feedTypes(dir0)
    assert(!f0.contains("update_preimage"), f0.toString)
    assert(f0("delete") === Seq(2L) && f0("insert") === Seq(2L, 9L))
    // property declared in DDL on a LIVE table (one metadata commit),
    // same merge now replays as image pairs + plain insert
    val (t1, dir1) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    x.sql(s"ALTER TABLE $t1 SET TBLPROPERTIES " +
      "('graft.cdc.updateImages' = 'true')")
    assert(Layout.snapshotCdcUpdateImages(x, dir1) === Some(true))
    mergeOnce(t1)
    val f1 = feedTypes(dir1)
    assert(f1("update_preimage") === Seq(2L))
    assert(f1("update_postimage") === Seq(2L))
    assert(f1("insert") === Seq(9L))
    assert(!f1.contains("delete"), f1.toString)
    // 'false' also opts the UPDATE door OUT of its default pre-images
    x.sql(s"ALTER TABLE $t1 SET TBLPROPERTIES " +
      "('graft.cdc.updateImages' = 'false')")
    x.sql(s"ALTER TABLE $t1 SET TBLPROPERTIES ('graft.key' = 'k')")
    x.sql(s"UPDATE $t1 SET v = v + 1.0 WHERE k = 1")
    val f2 = feedTypes(dir1)
    assert(!f2.contains("update_preimage"), f2.toString)
    assert(f2("delete") === Seq(1L) && f2("insert") === Seq(1L))
    // a typo'd value refuses at DDL time
    assert(intercept[Exception] {
      x.sql(s"ALTER TABLE $t1 SET TBLPROPERTIES " +
        "('graft.cdc.updateImages' = 'yes')")
    }.getMessage.contains("true"))
    // UNSET returns the table to the doors' own defaults
    x.sql(s"ALTER TABLE $t1 UNSET TBLPROPERTIES " +
      "('graft.cdc.updateImages')")
    assert(Layout.snapshotCdcUpdateImages(x, dir1) === None)
  }

  test("the declared image policy survives a Scala-door evolve (the " +
      "batch's fields carry no metadata)") {
    val (t, dir) = newTable("(1, 'a', 1.0), (2, 'b', 2.0)")
    x.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.cdc.updateImages' = 'true')")
    x.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.key' = 'k')")
    // a plain Scala evolve with a metadata-less user batch must not
    // silently erase the declared policy (or the key flags)
    import x.implicits._
    Layout.snapshotEvolve(
      Seq((3L, "c", 3.0, "x")).toDF("k", "s", "v", "extra"), dir)
    assert(Layout.snapshotCdcUpdateImages(x, dir) === Some(true),
      "graft.cdc.updateImages must survive snapshotEvolve")
    assert(Layout.snapshotKeyCols(x, dir) === Seq("k"))
    // and the NEW column carries the table-wide policy too (the flag
    // rides every field so no later drop can lose it)
    x.sql(s"""
      MERGE INTO $t t
      USING (SELECT 2 AS k, 'B' AS s, 20.0 AS v, 'y' AS extra) s
      ON t.k = s.k WHEN MATCHED THEN UPDATE SET *""")
    val v = Layout.snapshotVersions(x, dir).last
    val types = Layout.snapshotChangesTyped(x, dir, v - 1, v,
      updateImages = true)
      .select("_change_type").distinct().as[String].collect().toSet
    assert(types === Set("update_preimage", "update_postimage"),
      s"post-evolve MERGE must still persist images, got $types")
    // the TABLE's declared policy is authoritative over stray batch
    // metadata: evolving with a frame read from ANOTHER graft table
    // (whose fields carry that table's flag) neither flips this
    // table's policy nor conjures one onto an undeclared table
    val (tOther, dirOther) = newTable("(1, 'a', 1.0)")
    x.sql(s"ALTER TABLE $tOther SET TBLPROPERTIES " +
      "('graft.cdc.updateImages' = 'false')")
    val strayBatch = Layout.snapshotRead(x, dirOther)
      .withColumn("extra2", org.apache.spark.sql.functions.lit("z"))
    Layout.snapshotEvolve(strayBatch
      .withColumn("extra", org.apache.spark.sql.functions.lit("w"))
      .select("k", "s", "v", "extra", "extra2"), dir)
    assert(Layout.snapshotCdcUpdateImages(x, dir) === Some(true),
      "another table's false flag must not flip this table's policy")
    val (t3, dir3) = newTable("(1, 'a', 1.0)")
    Layout.snapshotEvolve(Layout.snapshotRead(x, dirOther)
      .withColumn("extra", org.apache.spark.sql.functions.lit("w")),
      dir3)
    assert(Layout.snapshotCdcUpdateImages(x, dir3) === None,
      "stray metadata must not conjure a policy onto an undeclared table")
  }

  test("racing tip-derived branch MERGEs lose no increment: the door " +
      "pins the tip and recomputes on a bounce (first-committer-wins)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 3).foreach { round =>
      val (t, dir) = newTable("(1, 'a', 10.0), (2, 'b', 20.0)")
      val cat = t.split('.').head
      x.sql(s"CALL $cat.system.branch('db.t', 'audit')")
      // each statement reads the TARGET (SET v = t.v + s.dv): a lost
      // update would make the final value reflect only one increment
      def bump(dv: Double): Unit = x.sql(s"""
        MERGE INTO $cat.db.`t@audit` AS t
        USING (SELECT * FROM VALUES (CAST(1 AS BIGINT),
               CAST($dv AS DOUBLE)) AS src(k, dv)) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = t.v + s.dv""")
      val f1 = Future(bump(1.0))
      val f2 = Future(bump(2.0))
      Await.result(f1, 300.seconds); Await.result(f2, 300.seconds)
      val got = x.sql(s"SELECT v FROM $cat.db.`t@audit` WHERE k = 1")
        .collect().map(_.getDouble(0)).toSeq
      assert(got === Seq(13.0),
        s"round $round: BOTH increments must land (10 + 1 + 2), " +
          s"got $got — a lost update means the CAS pin is broken")
      x.sql(s"CALL $cat.system.fast_forward('db.t', 'audit')")
      assert(x.sql(s"SELECT v FROM $t WHERE k = 1").head().getDouble(0)
        === 13.0)
    }
  }
}
