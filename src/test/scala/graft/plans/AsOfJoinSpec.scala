package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native as-of join (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec).
  * Semantics pinned against hand-computed matches and against the
  * union+window rewrite (q36's technique) on a generated workload; the
  * physical plan is asserted to actually BE the custom operator. */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val quotes: DataFrame = Seq(
    // key, time, quote payload
    ("msft", ts(100), 1.0),
    ("msft", ts(200), 2.0),
    ("msft", ts(300), 3.0),
    ("goog", ts(150), 10.0),
    ("amzn", ts(999), 99.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades: DataFrame = Seq(
    ("msft", ts(50), 1L),   // before any quote  -> null / first quote fwd
    ("msft", ts(200), 2L),  // equal ts          -> inclusive both ways
    ("msft", ts(250), 3L),  // between           -> 2.0 back, 3.0 fwd
    ("msft", ts(900), 4L),  // after all         -> 3.0 back, null fwd
    ("goog", ts(151), 5L),  // other key         -> 10.0 back
    ("nvda", ts(100), 6L)   // key absent on right -> null
  ).toDF("sym", "tts", "tid")

  test("backward: latest quote at-or-before each trade") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(10.0), 6L -> None))
  }

  test("forward: earliest quote at-or-after each trade") {
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("output shape: left columns then right payload, keys/time dropped") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts")
    assert(out.columns.toSeq === Seq("sym", "tts", "tid", "px"))
  }

  test("null left key or time never matches; null right rows are dropped") {
    val l = Seq((Option("a"), Option(ts(10)), 1L),
      (Option.empty[String], Option(ts(10)), 2L),
      (Option("a"), Option.empty[Timestamp], 3L))
      .toDF("k", "t", "id")
    val r = Seq((Option("a"), Option(ts(5)), 1.0),
      (Option.empty[String], Option(ts(1)), 2.0),
      (Option("a"), Option.empty[Timestamp], 3.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.backward(l, r, Seq("k"), "t", "t")
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("physical plan is AsOfJoinExec — no nested-loop join, merge runs") {
    val df = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      hint = AsOfJoin.Merge)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e
    }.nonEmpty, plan.toString)
    assert(collectWithSubqueries(plan) {
      case b if b.nodeName.contains("BroadcastNestedLoop") => b
    }.isEmpty, plan.toString)
  }

  test("matches the union+window rewrite on a generated workload") {
    // 40 keys x irregular times, duplicates on neither side's (key, time)
    val left = spark.range(2000).select(
      (col("id") % 40).as("k"),
      timestamp_seconds(col("id") * 7 % 1000).as("t"),
      col("id").as("lid"))
    val right = spark.range(700).select(
      (col("id") % 40).as("k"),
      timestamp_seconds(col("id") * 13 % 1000).as("t"),
      (col("id") * 2).as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))

    val native = AsOfJoin.backward(left, right, Seq("k"), "t", "t")
      .select($"lid", $"rv").as[(Long, Option[Long])].collect().toMap

    import org.apache.spark.sql.expressions.Window
    val l2 = left.select($"k", $"t", lit(1).as("side"), $"lid",
      lit(null).cast("long").as("rv"))
    val r2 = right.select($"k", $"t", lit(0).as("side"),
      lit(null).cast("long").as("lid"), $"rv")
    val w = Window.partitionBy($"k").orderBy($"t", $"side", $"lid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rewrite = l2.unionByName(r2)
      .withColumn("m", last($"rv", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"lid", $"m").as[(Long, Option[Long])].collect().toMap

    assert(native === rewrite)
  }

  test("deterministic under adversarial input partitioning") {
    val a = AsOfJoin.backward(trades.repartition(7), quotes.repartition(3),
      Seq("sym"), "tts", "qts")
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    val b = AsOfJoin.backward(trades.coalesce(1), quotes.coalesce(1),
      Seq("sym"), "tts", "qts")
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(a === b)
  }

  test("self-join: both sides from the same DataFrame resolve cleanly") {
    val e = trades.select($"sym", $"tts", $"tid")
    val out = AsOfJoin.backward(
      e, e.withColumnRenamed("tid", "prev_tid"), Seq("sym"), "tts", "tts")
    // every row matches at least itself (equal ts is inclusive)
    assert(out.filter($"prev_tid".isNull).count() === 0)
  }

  test("numeric (non-timestamp) time axis works") {
    val l = Seq(("a", 10L, 1L), ("a", 20L, 2L)).toDF("k", "pos", "id")
    val r = Seq(("a", 9L, "x"), ("a", 15L, "y")).toDF("k", "pos", "tag")
    val out = AsOfJoin.backward(l, r, Seq("k"), "pos", "pos")
      .select($"id", $"tag").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("x"), 2L -> Some("y")))
  }

  test("tolerance: matches farther than the bound are discarded (both dirs)") {
    // trade 4 at t=900: latest quote t=300 — gap 600 s > 500 s bound
    val back = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
        tolerance = Some(500L * 1000000))
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(back === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> None, 5L -> Some(10.0), 6L -> None))
    // trade 1 at t=50: next quote t=100 — gap 50 s; bound 10 s kills it
    val fwd = AsOfJoin.forward(trades, quotes, Seq("sym"), "tts", "qts",
        tolerance = Some(10L * 1000000))
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(fwd === Map(
      1L -> None, 2L -> Some(2.0), 3L -> None,
      4L -> None, 5L -> None, 6L -> None))
  }

  test("broadcast plan: BroadcastAsOfJoinExec, no exchange on the probe side") {
    val df = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      hint = AsOfJoin.Broadcast)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val ex = collectWithSubqueries(plan) { case e: BroadcastAsOfJoinExec => e }
    assert(ex.nonEmpty, plan.toString)
    // the whole point: the probe (and build) stream with NO exchange
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(ex.head.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      ex.head.toString)
  }

  test("broadcast build side arrives through a real BroadcastExchange") {
    val df = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
      hint = AsOfJoin.Broadcast)
    df.collect()
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // the build index is produced INSIDE Spark's broadcast machinery
    // (memory-accounted, AQE/ReuseExchange-visible), not by a bare
    // driver-side executeCollect
    val exch = collectWithSubqueries(plan) { case b: BroadcastExchangeExec => b }
    assert(exch.nonEmpty, plan.toString)
    import org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode
    assert(exch.head.mode == IdentityBroadcastMode, exch.head.mode.toString)
  }

  test("AsOfJoinPruning: an aggregate directly above the join narrows the probe scan") {
    // wide parquet input, NO hand pre-projection, and the join's parent is
    // an Aggregate (not a Project) — the rule must still push the needed
    // column set through the custom node into the probe-side scan
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    val out = AsOfJoin.backward(ev, purchases, Seq("user_id"), "ts", "ts",
        hint = AsOfJoin.Merge)
      .agg(max($"purchase_id").as("latest_purchase"))
    val joinNode = out.queryExecution.optimizedPlan.collectFirst {
      case a: AsOfJoinPlan => a
    }.get
    // probe child narrowed to exactly the columns the merge + agg need
    assert(joinNode.left.output.map(_.name).toSet === Set("user_id", "ts"),
      out.queryExecution.optimizedPlan.toString)
    // and the physical probe-side scan reads a narrow schema (no props)
    val scans = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Scan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(!_.contains("props")),
      scans.mkString("\n"))
    // semantics unchanged by pruning
    assert(out.as[Option[Long]].head().nonEmpty)
  }

  test("broadcast and merge paths agree on a generated workload, all modes") {
    val left = spark.range(3000).select(
      (col("id") % 37).as("k"),
      (col("id") * 7919 % 10000).as("t"),
      col("id").as("lid"))
    val right = spark.range(400).select(
      (col("id") % 37).as("k"),
      (col("id") * 104729 % 10000).as("t"),
      (col("id") * 3).as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))
    for (dir <- Seq("b", "f", "n"); tol <- Seq(None, Some(250L))) {
      def run(hint: AsOfJoin.Hint) = {
        val out = dir match {
          case "b" => AsOfJoin.backward(left, right, Seq("k"), "t", "t", tol, hint)
          case "f" => AsOfJoin.forward(left, right, Seq("k"), "t", "t", tol, hint)
          case _   => AsOfJoin.nearest(left, right, Seq("k"), "t", "t", tol, hint)
        }
        out.select($"lid", $"rv").as[(Long, Option[Long])].collect().toMap
      }
      assert(run(AsOfJoin.Merge) === run(AsOfJoin.Broadcast),
        s"merge vs broadcast disagree: dir=$dir tol=$tol")
    }
  }

  test("nearest: closest quote either side; tie prefers backward; tolerance") {
    // t50 → fwd-only 1.0 (gap 50); t200 → exact 2.0; t250 → 50 s both
    // ways, tie → backward 2.0; t900 → back-only 3.0; goog 151 → 10.0
    val out = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(10.0), 6L -> None))
    // an asymmetric gap picks the strictly closer side
    val near = AsOfJoin.nearest(
      Seq(("msft", ts(260), 7L)).toDF("sym", "tts", "tid"),
      quotes, Seq("sym"), "tts", "qts")
      .select($"px").as[Option[Double]].collect().toSeq
    assert(near === Seq(Some(3.0))) // 40 s fwd beats 60 s back
    // tolerance bounds the ABSOLUTE gap on both sides
    val tol = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tts", "qts",
        tolerance = Some(100L * 1000000))
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(tol === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> None, 5L -> Some(10.0), 6L -> None))
    // broadcast path agrees on the fixture
    val bc = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tts", "qts",
        hint = AsOfJoin.Broadcast)
      .select($"tid", $"px").as[(Long, Option[Double])].collect().toMap
    assert(bc === out)
    // a non-numeric time axis refuses (|gap| needs subtraction)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearest(
        Seq(("a", "x", 1L)).toDF("k", "t", "id"),
        Seq(("a", "y", 2.0)).toDF("k", "t", "v"), Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("nearest"))
  }

  test("auto hint: dimension-sized build side picks the broadcast plan") {
    val df = AsOfJoin.backward(trades, quotes, Seq("sym"), "tts", "qts")
    assert(collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: BroadcastAsOfJoinExec => e
    }.nonEmpty, "tiny build side should auto-broadcast")
  }

  test("AsOfJoinPruning: a select above the join narrows the scans") {
    // wide parquet inputs, NO manual pre-projection — the optimizer rule
    // must push the narrowing through the custom node into the scans
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"),
        max($"value").as("unused_payload"))
    val out = AsOfJoin.backward(ev, purchases, Seq("user_id"), "ts", "ts",
        hint = AsOfJoin.Merge)
      .select($"event_id", $"purchase_id")
    val plan = out.queryExecution.executedPlan.toString
    // the left events scan must not read props/value/event_type anymore
    val leftScans = plan.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("events.parquet")).toSeq
    assert(leftScans.nonEmpty)
    assert(!plan.contains("unused_payload"),
      s"right payload not pruned:\n$plan")
    // semantics unchanged by pruning
    assert(out.count() === ev.count())
  }

  test("SQL door: asof_join TVF matches the Scala API, all positional args") {
    AsOfJoin.ensureSqlDoor(spark)
    trades.createOrReplaceTempView("asof_tvf_trades")
    quotes.createOrReplaceTempView("asof_tvf_quotes")
    val out = spark.sql(
      """SELECT tid, px FROM asof_join(TABLE(asof_tvf_trades),
           TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> Some(3.0), 5L -> Some(10.0), 6L -> None))
    // direction + tolerance + hint, fully positional
    val fwd = spark.sql(
      """SELECT tid, px FROM asof_join(TABLE(asof_tvf_trades),
           TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts',
           'forward', 10000000, 'merge')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(fwd === Map(
      1L -> None, 2L -> Some(2.0), 3L -> None,
      4L -> None, 5L -> None, 6L -> None))
    // NULL tolerance = unbounded, skips through to the hint argument
    val nullTol = spark.sql(
      """SELECT tid, px FROM asof_join(TABLE(asof_tvf_trades),
           TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts',
           'backward', NULL, 'broadcast')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(nullTol === out)
  }

  test("SQL door: TABLE takes inline subqueries, CTE names, self-joins") {
    AsOfJoin.ensureSqlDoor(spark)
    trades.createOrReplaceTempView("asof_tvf_trades")
    quotes.createOrReplaceTempView("asof_tvf_quotes")
    val expected = Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(3.0))
    val inline = spark.sql(
      """SELECT tid, px FROM asof_join(
           TABLE(SELECT * FROM asof_tvf_trades WHERE tid <= 4),
           TABLE(SELECT * FROM asof_tvf_quotes), 'sym', 'tts', 'qts')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(inline === expected)
    // WITH-clause names resolve inside the enclosing tree (the arg plan
    // becomes a child of the name-based AsOfJoinSqlNode, so the CTE ref
    // is no longer dangling)
    val cte = spark.sql(
      """WITH t AS (SELECT sym, tts, tid FROM asof_tvf_trades WHERE tid <= 4),
              q AS (SELECT sym, qts, px FROM asof_tvf_quotes)
         SELECT tid, px FROM asof_join(TABLE(t), TABLE(q), 'sym', 'tts', 'qts')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(cte === expected)
    // self-join: both sides the same view — DeduplicateRelations must
    // renew one side (every trade matches at least itself backward)
    val self = spark.sql(
      """SELECT * FROM asof_join(TABLE(asof_tvf_trades),
           TABLE(SELECT sym, tts, tid AS prev_tid FROM asof_tvf_trades),
           'sym', 'tts', 'tts')""")
    assert(self.filter($"prev_tid".isNull).count() === 0)
  }

  test("SQL door: optional args bind by name in any order") {
    AsOfJoin.ensureSqlDoor(spark)
    trades.createOrReplaceTempView("asof_tvf_trades")
    quotes.createOrReplaceTempView("asof_tvf_quotes")
    val named = spark.sql(
      """SELECT tid, px FROM asof_join(TABLE(asof_tvf_trades),
           TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts',
           hint => 'merge', tolerance => 10000000, direction => 'forward')""")
      .as[(Long, Option[Double])].collect().toMap
    assert(named === Map(
      1L -> None, 2L -> Some(2.0), 3L -> None,
      4L -> None, 5L -> None, 6L -> None))
    val e = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_join(TABLE(asof_tvf_trades),
             TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts', 'forward',
             direction => 'backward')""").collect()
    }
    assert(e.getMessage.contains("both positionally and by name"),
      e.getMessage)
  }

  test("SQL door: malformed calls raise clear errors") {
    AsOfJoin.ensureSqlDoor(spark)
    trades.createOrReplaceTempView("asof_tvf_trades")
    quotes.createOrReplaceTempView("asof_tvf_quotes")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(TABLE(asof_tvf_trades), 'notatable', 'sym', 'tts', 'qts')").collect()
    }
    assert(e1.getMessage.contains("must be TABLE("), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("""SELECT * FROM asof_join(TABLE(asof_tvf_trades),
        TABLE(asof_tvf_quotes), 'sym', 'tts', 'qts', 'sideways')""").collect()
    }
    assert(e2.getMessage.contains("direction"), e2.getMessage)
  }

  test("duplicate-named columns raise instead of silently binding the first") {
    val dup = trades.select($"sym", $"tts", $"tts", $"tid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(dup, quotes, Seq("sym"), "tts", "qts")
    }
    assert(e.getMessage.contains("ambiguous"))
    // empty key list is rejected up front, uniformly across hints
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes, Seq.empty, "tts", "qts")
    }
    assert(e2.getMessage.contains("equi-key"))
  }

  test("swapped key/time roles over ONE reused broadcast stay distinct") {
    // Two broadcast as-of joins against the same dimension, with a and b
    // exchanging key/time roles. Their build plans canonicalize equal
    // (And is commutative-normalized), so ReuseExchange hands both joins
    // the SAME broadcast row array — and the executor-local index cache
    // must then discriminate by the key/time ORDINALS. The ordinals are
    // resolved by exprId: through the SQL door the build side is a bare
    // Filter(IsNotNull…) whose FilterExec NARROWS output nullability, so
    // an equality-based Seq.indexOf lookup (which compares nullability)
    // misses every column, collapses both descriptors to "k-1,-1", and
    // join 2 silently probes join 1's index (keyed by a, sorted by b) —
    // returning a1t10 here instead of a10t1. Build columns are Option
    // (nullable) because non-nullable ones would mask the narrowing.
    Seq((Some(1L), Some(10L), "a1t10"), (Some(10L), Some(1L), "a10t1"),
        (Some(2L), Some(20L), "a2t20"))
      .toDF("a", "b", "pay").createOrReplaceTempView("swap_dim")
    Seq((1L, 11L, 1L)).toDF("a", "b", "id")
      .createOrReplaceTempView("swap_p1") // keys=[a], time=b
    Seq((1L, 11L, 2L)).toDF("b", "a", "id")
      .createOrReplaceTempView("swap_p2") // keys=[b], time=a
    AsOfJoin.ensureSqlDoor(spark)
    val u = spark.sql(
      """SELECT id, pay FROM asof_join(TABLE(swap_p1), TABLE(swap_dim),
        |                              'a', 'b', 'b', hint => 'broadcast')
        |UNION ALL
        |SELECT id, pay FROM asof_join(TABLE(swap_p2), TABLE(swap_dim),
        |                              'b', 'a', 'a', hint => 'broadcast')
        |""".stripMargin)
    val rows = u.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a1t10", 2L -> "a10t1"))
    // pin that the scenario really flows through ONE shared broadcast —
    // otherwise this test would stop exercising the cache discrimination
    val reused = collectWithSubqueries(u.queryExecution.executedPlan) {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty, "expected ReuseExchange to share the build side:\n" +
      u.queryExecution.executedPlan)
  }

  test("AsOfJoinPruning: left-column filters push below the join") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    val joined = AsOfJoin.backward(ev, purchases, Seq("user_id"), "ts", "ts",
      hint = AsOfJoin.Merge)
    val filtered = joined.filter($"event_type" === "click" &&
      $"purchase_id".isNotNull)
    // left-only conjunct reaches the scan as a pushed filter; the
    // right-payload conjunct must stay above the join (null semantics)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,click)"),
      s"left filter not pushed to scan:\n$plan")
    // semantics: identical to filtering the input first
    val expected = AsOfJoin.backward(ev.filter($"event_type" === "click"),
        purchases, Seq("user_id"), "ts", "ts", hint = AsOfJoin.Merge)
      .filter($"purchase_id".isNotNull)
    assert(filtered.count() === expected.count())
    assert(filtered.except(expected).isEmpty)
  }
}
