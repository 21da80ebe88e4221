package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, GraftSessionBridge, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkSpec

/** The DuckDB-parity `ASOF [LEFT] JOIN` SQL syntax (AsOfSqlRewrite +
  * GraftSqlParser + AsOfSyntaxRule → AsOfJoinPlan). Semantics pinned
  * against the Scala API on the same data; the physical plan is asserted
  * to be the native operator; malformed shapes raise targeted errors
  * instead of silently planning a plain join. */
class AsOfSyntaxSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  /** extensions-built sibling session — the only way to carry a parser */
  private lazy val xs: SparkSession =
    GraftSessionBridge.withGraftExtensions(spark)

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val ready: Unit = {
    import xs.implicits._
    Seq(("msft", ts(100), 1.0), ("msft", ts(200), 2.0),
      ("msft", ts(300), 3.0), ("goog", ts(150), 10.0),
      ("amzn", ts(999), 99.0))
      .toDF("sym", "qts", "px").createOrReplaceTempView("q")
    Seq(("msft", ts(50), 1L), ("msft", ts(200), 2L), ("msft", ts(250), 3L),
      ("msft", ts(900), 4L), ("goog", ts(151), 5L), ("nvda", ts(100), 6L))
      .toDF("sym", "tts", "tid").createOrReplaceTempView("t")
  }

  private def sql(text: String): DataFrame = { ready; xs.sql(text) }

  private def backPx(df: DataFrame): Map[Long, Option[Double]] = {
    import xs.implicits._
    df.select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
  }

  // ------------------------------------------------------------ rewrite unit

  test("rewrite: ASOF LEFT JOIN gains the marker, ASOF token dropped") {
    val out = AsOfSqlRewrite.rewrite(
      "SELECT * FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.tts >= q.qts")
    assert(!out.toUpperCase.matches(".*\\bASOF\\b.*")) // keyword gone
    assert(out.contains("ON graft_asof_marker() AND") &&
      out.contains("t.sym = q.sym AND t.tts >= q.qts"))
  }

  test("rewrite: asof inside strings/comments/backticks is untouched") {
    val s = "SELECT 'x ASOF JOIN y' AS a, `asof join` FROM t -- ASOF JOIN\n" +
      "/* ASOF JOIN */ WHERE a <> 'ASOF'"
    assert(AsOfSqlRewrite.rewrite(s) === s)
  }

  test("rewrite: a table explicitly aliased AS asof is not the keyword") {
    val s = "SELECT * FROM t AS asof JOIN q ON asof.sym = q.sym"
    assert(AsOfSqlRewrite.rewrite(s) === s)
  }

  test("rewrite: nested join criteria pair before the asof ON binds") {
    // the right side is itself a join — its ON must not steal the marker
    val out = AsOfSqlRewrite.rewrite(
      "SELECT * FROM t ASOF JOIN (SELECT q.*, r.v FROM q JOIN r ON q.k = r.k) p " +
        "ON t.sym = p.sym AND t.tts >= p.qts")
    assert(out.contains("ON t.sym") === false || true) // position checked below
    assert(out.indexOf("graft_asof_marker") > out.indexOf(") p"),
      s"marker landed inside the subquery: $out")
  }

  test("rewrite: unsupported shapes raise targeted errors") {
    def err(s: String): String =
      intercept[IllegalArgumentException](AsOfSqlRewrite.rewrite(s)).getMessage
    assert(err("SELECT * FROM t ASOF RIGHT JOIN q ON 1=1")
      .contains("ASOF RIGHT JOIN is not supported"))
    assert(err("SELECT * FROM t ASOF JOIN q USING (sym)")
      .contains("USING is not supported"))
    assert(err("SELECT * FROM t ASOF JOIN q WHERE 1=1")
      .contains("requires an ON condition"))
  }

  // ----------------------------------------------------------- end-to-end

  test("ASOF LEFT JOIN matches the Scala API (backward)") {
    val viaSql = sql("""SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
      ON t.sym = q.sym AND t.tts >= q.qts""")
    assert(backPx(viaSql) === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(10.0), 6L -> None))
  }

  test("plans the native operator, not a plain join") {
    val df = sql("""SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
      ON t.sym = q.sym AND t.tts >= q.qts""")
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
      case e: BroadcastAsOfJoinExec => e
    }
    assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("DuckDB output parity: every right column visible, NULL on miss") {
    val rows = sql("""SELECT t.tid, q.sym AS qsym, q.qts, q.px
      FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.tts >= q.qts
      ORDER BY t.tid""").collect()
    // matched row carries the matched right key/time
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getString(1) === "msft" && r2.getTimestamp(2) === ts(200))
    // unmatched rows are all-NULL on the right, including key/time
    val r6 = rows.find(_.getLong(0) == 6L).get
    assert(r6.isNullAt(1) && r6.isNullAt(2) && r6.isNullAt(3))
  }

  test("ASOF JOIN (inner) drops unmatched left rows") {
    val tids = sql("""SELECT t.tid FROM t ASOF JOIN q
      ON t.sym = q.sym AND t.tts >= q.qts""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(tids === Seq(2L, 3L, 4L, 5L))
  }

  test("forward via <=, and reversed operand order still binds sides") {
    val fwd = sql("""SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
      ON t.sym = q.sym AND t.tts <= q.qts""")
    assert(backPx(fwd) === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> None, 6L -> None))
    // q.qts <= t.tts ⇔ t.tts >= q.qts: backward again
    val back = sql("""SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
      ON t.sym = q.sym AND q.qts <= t.tts""")
    assert(backPx(back).apply(3L) === Some(2.0))
  }

  test("keyless ASOF JOIN (no equality) matches on time alone") {
    val out = sql("""SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
      ON t.tts >= q.qts""")
    // global latest quote at-or-before each trade, any symbol
    assert(backPx(out) === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(10.0), 6L -> Some(1.0)))
  }

  test("self-join: the same view on both sides deduplicates") {
    val out = sql("""SELECT a.tid, b.tid AS prev_tid
      FROM t a ASOF LEFT JOIN t b
      ON a.sym = b.sym AND a.tts >= b.tts ORDER BY a.tid""")
    // every row at least matches itself (inclusive inequality)
    assert(out.collect().forall(r => !r.isNullAt(1)))
  }

  test("broadcast hint reaches the broadcast probe exec") {
    val df = sql("""SELECT /*+ BROADCAST(q) */ t.tid, q.px
      FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.tts >= q.qts""")
    assert(collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: BroadcastAsOfJoinExec => e
    }.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(backPx(df).apply(4L) === Some(3.0))
  }

  test("two ASOF joins in one statement both convert") {
    val df = sql("""SELECT t.tid, a.px AS back_px, b.px AS fwd_px
      FROM t ASOF LEFT JOIN q a ON t.sym = a.sym AND t.tts >= a.qts
             ASOF LEFT JOIN q b ON t.sym = b.sym AND t.tts <= b.qts""")
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
      case e: BroadcastAsOfJoinExec => e
    }
    assert(execs.size === 2, df.queryExecution.executedPlan.toString)
    val row = df.collect().find(_.getLong(0) == 3L).get
    assert(row.getDouble(1) === 2.0 && row.getDouble(2) === 3.0)
  }

  test("CTE and subquery operands work") {
    val df = sql("""WITH big AS (SELECT * FROM q WHERE px > 1.5)
      SELECT t.tid, big.px
      FROM (SELECT * FROM t WHERE sym = 'msft') t
      ASOF LEFT JOIN big ON t.sym = big.sym AND t.tts >= big.qts""")
    assert(backPx(df) === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(3.0)))
  }

  test("invalid as-of conditions raise analysis-time errors, never a plain join") {
    def err(text: String): String = {
      ready
      val e = intercept[Exception](xs.sql(text).collect())
      e.getMessage
    }
    assert(err("""SELECT * FROM t ASOF JOIN q
        ON t.sym = q.sym AND t.tts > q.qts""")
      .contains("strict inequalities"))
    assert(err("""SELECT * FROM t ASOF JOIN q ON t.sym = q.sym""")
      .contains("exactly one inclusive time inequality"))
    assert(err("""SELECT * FROM t ASOF JOIN q
        ON t.sym = q.sym AND t.tts >= q.qts AND t.tts <= q.qts""")
      .contains("exactly one inclusive time inequality"))
    assert(err("""SELECT * FROM t ASOF JOIN q
        ON t.sym = q.sym OR t.tts >= q.qts""")
      .contains("top-level AND"))
    // mismatched time types die in Spark's own binary-op type check
    // before the conversion rule ever sees the join — also a hard error
    assert(err("""SELECT * FROM t ASOF JOIN q
        ON t.sym = q.sym AND t.tts >= q.px""")
      .contains("DATATYPE_MISMATCH"))
  }

  test("plain SQL through the extended session is unaffected") {
    ready
    assert(xs.sql("SELECT count(*) AS n FROM t").collect().head.getLong(0) === 6L)
    // and the base (non-extended) session still rejects the syntax
    val e = intercept[Exception](
      spark.sql("SELECT * FROM x ASOF JOIN y ON 1=1"))
    assert(e.getMessage.toUpperCase.contains("ASOF") ||
      e.getMessage.toLowerCase.contains("syntax"))
  }

  test("a conf set on the base session AFTER first bridge use reaches the sibling") {
    ready // the sibling exists and has served queries by now
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val sib = GraftSessionBridge.withGraftExtensions(spark)
      assert(sib.conf.get(key) === "America/New_York",
        "bridge must re-sync mutable confs, not snapshot at first use")
    } finally {
      spark.conf.set(key, prev)
      // and the reset flows through too
      assert(GraftSessionBridge.withGraftExtensions(spark)
        .conf.get(key) === prev)
    }
  }
}
