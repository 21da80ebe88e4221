package graft.queries

import graft.{QuerySpec, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-text query surface (the reference shipped its analytics as SQL
  * strings — §3.3): outer joins, correlated/IN subqueries, grouping sets,
  * and the scalar string/date function battery, each run through
  * `spark.sql` over registered views so the engine's SQL front door is
  * exercised, not just the DataFrame API. Oracle SQL differs only where
  * DuckDB's function names differ (strpos/instr, date_diff).
  */
object SqlSurface {

  private def views(s: SparkSession, d: String): Unit = {
    T.customer(s, d).createOrReplaceTempView("customer")
    T.orders(s, d).createOrReplaceTempView("orders")
    T.nation(s, d).createOrReplaceTempView("nation")
    T.supplier(s, d).createOrReplaceTempView("supplier")
    T.lineitem(s, d).createOrReplaceTempView("lineitem")
  }

  private def sql(q: String)(s: SparkSession, d: String): DataFrame = {
    views(s, d); s.sql(q)
  }

  val specs: Seq[QuerySpec] = Seq(

    // --------------------------------------------------------------- q125
    // The DSv2 catalog door (graft.sources.GraftCatalog): the snapshot
    // table as a NAMED SQL table — `FROM graft.t` resolves the latest
    // manifest and delegates the scan to Spark's stock parquet path
    // (pushdown/pruning/vectorization intact), `VERSION AS OF` pins a
    // historical manifest. The fixture is q109's three-append table
    // (v1 = keys % 3 == 0, latest = all orders), so the oracle replays
    // both snapshots from the base table with key arithmetic — and
    // hash-equality proves the catalog reads the same bytes the Scala
    // API committed. The WRITE half (CREATE/INSERT landing append
    // manifests through the same commit machinery) is pinned in
    // GraftCatalogSpec.
    QuerySpec(
      "q125_catalog_sql",
      (s, d) => {
        val dir = Fits.snapshotTableDir(s, d)
        val root = new org.apache.hadoop.fs.Path(dir).getParent.toString
        // catalog instances are cached by name per session — derive the
        // name from the root so a process never rebinds a live name
        val cat = "graft_" +
          java.lang.Integer.toHexString(root.hashCode & 0x7fffffff)
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(s"""
          SELECT 'latest' AS snap, o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_price
          FROM $cat.t GROUP BY o_orderstatus
          UNION ALL
          SELECT 'v1' AS snap, o_orderstatus, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_price
          FROM $cat.t VERSION AS OF 1 GROUP BY o_orderstatus
          ORDER BY snap, o_orderstatus""")
      },
      Some("""SELECT 'latest' AS snap, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT 'v1' AS snap, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus
        ORDER BY snap, o_orderstatus""")),

    // ---------------------------------------------------------------- q40
    // LEFT OUTER join + null-aware aggregation (customers with no orders
    // keep their row; COUNT(col) skips the nulls).
    QuerySpec(
      "q40_left_join",
      sql("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(CAST(MAX(o_orderdate) AS STRING), 'never') AS last_order
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey ORDER BY c_custkey"""),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(CAST(MAX(o_orderdate) AS VARCHAR), 'never') AS last_order
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q41
    // FULL OUTER join between two aggregates — both null sides survive.
    QuerySpec(
      "q41_full_outer",
      sql("""SELECT COALESCE(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
             FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                   FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
             FULL OUTER JOIN
                  (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                   FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
             ON c.nk = s.nk
             ORDER BY nk"""),
      Some("""SELECT COALESCE(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
             FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                   FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
             FULL OUTER JOIN
                  (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                   FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
             ON c.nk = s.nk
             ORDER BY nk""")),

    // ---------------------------------------------------------------- q42
    // Correlated scalar subquery (decorrelated by Catalyst into a join —
    // no per-row re-execution) + IN subquery.
    QuerySpec(
      "q42_subqueries",
      sql("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM orders o
             WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                       WHERE o2.o_custkey = o.o_custkey)
               AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
             ORDER BY o_orderkey"""),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             FROM orders o
             WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                       WHERE o2.o_custkey = o.o_custkey)
               AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
             ORDER BY o_orderkey""")),

    // ---------------------------------------------------------------- q43
    // Explicit GROUPING SETS (finer control than rollup/cube) — one hash
    // aggregate pass over the expanded sets.
    QuerySpec(
      "q43_grouping_sets",
      sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             FROM orders
             GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n"""),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             FROM orders
             GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n""")),

    // ---------------------------------------------------------------- q44
    // Scalar string battery (§2.8): case, substring, trim/pad, replace,
    // position, regexp_replace, concat.
    QuerySpec(
      "q44_string_funcs",
      sql("""SELECT c_custkey,
               UPPER(c_name) AS uname,
               SUBSTRING(c_name, 1, 8) AS prefix,
               LPAD(CAST(c_custkey AS STRING), 8, '0') AS padded,
               REPLACE(c_name, '#', '-') AS dashed,
               CAST(INSTR(c_name, '0') AS BIGINT) AS zero_at,
               REGEXP_REPLACE(c_name, '[0-9]', 'N') AS masked,
               c_name || '/' || c_mktsegment AS tagged
             FROM customer ORDER BY c_custkey"""),
      Some("""SELECT c_custkey,
               UPPER(c_name) AS uname,
               SUBSTRING(c_name, 1, 8) AS prefix,
               LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               REPLACE(c_name, '#', '-') AS dashed,
               CAST(STRPOS(c_name, '0') AS BIGINT) AS zero_at,
               REGEXP_REPLACE(c_name, '[0-9]', 'N', 'g') AS masked,
               c_name || '/' || c_mktsegment AS tagged
             FROM customer ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q45
    // Scalar date battery (§2.8): parts, trunc, last_day, day arithmetic.
    QuerySpec(
      "q45_date_funcs",
      sql("""SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS y,
               CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
               CAST(MONTH(o_orderdate) AS BIGINT) AS m,
               CAST(DAY(o_orderdate) AS BIGINT) AS dom,
               CAST(DATE_TRUNC('MONTH', o_orderdate) AS DATE) AS month_start,
               LAST_DAY(o_orderdate) AS month_end,
               CAST(DATEDIFF(DATE '1998-12-31', o_orderdate) AS BIGINT) AS days_to_eoy
             FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""),
      Some("""SELECT o_orderkey,
               YEAR(o_orderdate) AS y,
               QUARTER(o_orderdate) AS q,
               MONTH(o_orderdate) AS m,
               DAY(o_orderdate) AS dom,
               CAST(DATE_TRUNC('MONTH', o_orderdate) AS DATE) AS month_start,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
               DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
             FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ---------------------------------------------------------------- q84
    // Row-level provenance via the parquet `_metadata` hidden column —
    // the lineage audit every curated dataset ships with ("which input
    // file did each row come from, and what key range does each file
    // hold?"). Per-file summaries aggregate AT THE SCAN (map-side: the
    // file name is constant within a split), so the exchange carries one
    // row per file, never per record; at a 100 TB layout this is the
    // manifest builder that later feeds file-skipping. DuckDB twin:
    // read_parquet(..., filename=true).
    QuerySpec(
      "q84_provenance",
      (s, d) => {
        import org.apache.spark.sql.functions._
        def perFile(name: String, keyCol: String) =
          T.table(s, d, name)
            .select(col(keyCol), col("_metadata.file_name").as("file_name"))
            .groupBy(col("file_name"))
            .agg(count(lit(1)).as("n_rows"),
              min(col(keyCol)).cast("long").as("min_key"),
              max(col(keyCol)).cast("long").as("max_key"))
            .select(lit(name).as("table_name"), col("file_name"),
              col("n_rows"), col("min_key"), col("max_key"))
        perFile("documents", "doc_id")
          .unionByName(perFile("orders", "o_orderkey"))
          .unionByName(perFile("lineitem", "l_orderkey"))
          .orderBy(col("table_name"), col("file_name"))
      },
      Some {
        def perFile(name: String, keyCol: String, dir: String) =
          s"""SELECT '$name' AS table_name, parse_filename(filename) AS file_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN($keyCol) AS BIGINT) AS min_key,
               CAST(MAX($keyCol) AS BIGINT) AS max_key
             FROM read_parquet('$dir/$name.parquet', filename=true)
             GROUP BY filename"""
        // the driver substitutes the sf dir when creating views, but this
        // query addresses files directly; {SF_DIR} is replaced by Verify
        s"""${perFile("documents", "doc_id", "{SF_DIR}")}
        UNION ALL ${perFile("orders", "o_orderkey", "{SF_DIR}")}
        UNION ALL ${perFile("lineitem", "l_orderkey", "{SF_DIR}")}
        ORDER BY table_name, file_name"""
      }),

    // --------------------------------------------------------------- q102
    // Correlated LATERAL join — top-2 orders PER CUSTOMER as the inner
    // table of a lateral subquery with ORDER BY + LIMIT. Catalyst
    // decorrelates this into a window/rank plan (DecorrelateInnerQuery),
    // so the declared per-row-subquery shape executes as ONE set-based
    // pass, not |customers| probes — the SQL front door's equivalent of
    // q07's WindowGroupLimit. DuckDB runs the identical text.
    QuerySpec(
      "q102_lateral_topk",
      sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             WHERE c.c_acctbal > 9900
             ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey"""),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             WHERE c.c_acctbal > 9900
             ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey"""))
  )
}
