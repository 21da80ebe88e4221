package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan regression guards: the properties SCALE.md claims —
  * pushdown reaching the scan, pruned read schemas, broadcast dimension
  * joins, bounded shuffle counts — asserted against the actual plans so a
  * refactor can't silently regress them. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan =
    SparkEntry.allSpecs.find(_.name == name).get
      .run(spark, sf).queryExecution.executedPlan

  private def initial(name: String): SparkPlan = planOf(name) match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case p => p
  }

  private def scanMeta(p: SparkPlan): String = p.toString

  test("q02: filters push to the parquet scan and columns are pruned") {
    val s = scanMeta(initial("q02_scan_filter_project"))
    assert(s.contains("PushedFilters") &&
      (s.contains("GreaterThanOrEqual(l_shipdate") || s.contains("LessThan(l_quantity")),
      s"no pushed filters in:\n$s")
    assert(!s.contains("l_discount"), "read schema not pruned")
  }

  test("q22: the filtered dimension broadcasts — fact side never shuffles for the join") {
    val joins = initial("q22_hotspot").collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "expected a broadcast hash join")
  }

  test("q01: exactly one data shuffle (partial+final agg), plus the output sort") {
    val exchanges = initial("q01_pricing_summary")
      .collect { case e: ShuffleExchangeExec => e }
    // one for the aggregation, one for the orderBy — never more
    assert(exchanges.size <= 2, s"unexpected shuffles: ${exchanges.size}")
  }

  test("q04: all four dimension joins broadcast in the star plan") {
    val joins = initial("q04_join_multiway").collect { case j: BroadcastHashJoinExec => j }
    assert(joins.size >= 3, s"expected broadcast-dominated star join, got ${joins.size}")
  }

  test("LSH candidate joins are equi-joins — never nested-loop/cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // the entire point of the bucketed forms: q31's exact path plans a
    // BroadcastNestedLoopJoin by design; these must not
    for (q <- Seq("q27_minhash_lsh", "q29b_simhash_neardups_full",
        "q31b_embedding_neardups_lsh", "q33_ann_lsh",
        "q66_incremental_dedup")) {
      val bad = initial(q).collect {
        case j: BroadcastNestedLoopJoinExec => j
        case c: CartesianProductExec        => c
      }
      assert(bad.isEmpty, s"$q plans a non-equi candidate join:\n${bad.mkString("\n")}")
    }
  }

  test("q07: rank filter pushes into partial+final WindowGroupLimit") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    // the row_number() <= k filter must reach below the exchange: the
    // shuffle then carries at most k rows per group per task instead of
    // the whole fact — the property that makes per-group top-k scale
    val limits = initial("q07_window_topk_per_group")
      .collect { case w: WindowGroupLimitExec => w }
    assert(limits.size >= 2,
      s"expected partial+final WindowGroupLimit, got ${limits.size}")
  }

  test("q52: the range join plans as a hash join on the bin key") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val bad = initial("q52_range_join").collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec        => c
    }
    assert(bad.isEmpty, s"q52 plans a nested-loop/cartesian join:\n${bad.mkString("\n")}")
  }

  test("q100: chunking is a pure explode — no exchange except the output sort") {
    val exchanges = initial("q100_chunking")
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 1, s"chunking should not shuffle: ${exchanges.size}")
  }

  test("q90b: pure SQL text through the asof_join TVF plans AsOfJoinExec") {
    val p = initial("q90b_asof_sql")
    assert(p.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty,
      s"the SQL door did not reach the native operator:\n$p")
  }

  test("q90c: literal ASOF LEFT JOIN syntax plans AsOfJoinExec") {
    val p = initial("q90c_asof_syntax")
    assert(p.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty ||
        p.collect { case e: graft.plans.BroadcastAsOfJoinExec => e }.nonEmpty,
      s"the ASOF syntax door did not reach the native operator:\n$p")
  }

  test("q103/persisted index: probing prunes the coded scan to the probed cells") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    import spark.implicits._
    val dir = tmpDir("planvindex") + "/idx"
    val emb = Tables.embeddings(spark, sf)
    graft.ops.VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val h = graft.ops.VectorIndex.read(spark, dir)
    val df = graft.ops.VectorIndex.topKAdc(h,
      emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 5, nProbe = 2)
    df.collect() // execute: dynamic pruning resolves at runtime
    val scans = helper.collect(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("coded"))
        => s
    }
    assert(scans.nonEmpty, "no parquet scan of the coded index found")
    val scan = scans.head
    // the VectorIndex.scala:20-24 claim, pinned: the cell equi-join
    // against the broadcast query batch plants a dynamic partition-
    // pruning filter on the partition column...
    assert(scan.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic cell-pruning filter on the coded scan: " +
        s"${scan.partitionFilters}")
    // ...and at runtime the scan READ at most nProbe of the 8 cell
    // partitions (one query × nProbe=2)
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.exists(_ <= 2),
      s"coded scan read $partsRead partitions, expected <= 2 (nProbe)")
  }

  test("q106: Catalyst injects a runtime bloom filter into the fact scan") {
    // the semantics-preserving half is q106's DuckDB oracle; this pins
    // that the rewrite actually FIRED — the optimized plan must carry
    // the injected bloom_filter_agg subquery and a might_contain guard
    // on the fact side (InjectRuntimeFilter recognized the selective
    // dim filter + equi-join shape the query is deliberately kept in).
    val df = SparkEntry.allSpecs.find(_.name == "q106_bloom_join_prune")
      .get.run(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
      s"no injected runtime bloom filter in optimized plan:\n$opt")
  }

  test("q107: KLL sketch state is partial+final — the exchange carries sketches") {
    // the mergeable-state claim, pinned mechanically: the per-ship_year
    // sketch build AND the sketch-of-sketches merge must each plan as
    // partial (map-side) + final ObjectHashAggregate, so the only data
    // crossing an exchange is O(k) sketch state — never a re-sort of the
    // value column (the exact form's cost at 100 TB)
    val p = initial("q107_quantile_sketch_merge").toString
    assert(p.contains("partial_kll_sketch_agg_double") &&
        p.contains("kll_sketch_agg_double("),
      s"per-partition KLL agg lost its partial/final split:\n$p")
    assert(p.contains("partial_kll_merge_agg_double") &&
        p.contains("kll_merge_agg_double("),
      s"KLL union lost its partial/final split:\n$p")
    // the exact-rank certificate pass reads the corpus ONCE with a
    // map-side combined avg against the broadcast 1-row estimates
    assert(p.contains("partial_avg") && p.contains("BroadcastExchange"),
      s"rank-certificate pass is not a broadcast + combined agg:\n$p")
  }

  test("q108: top-k sketch state is partial+final — tokens never cross twice") {
    val p = initial("q108_topk_state_merge").toString
    assert(p.contains("partial_approx_top_k_accumulate") &&
        p.contains("approx_top_k_accumulate("),
      s"per-source top-k accumulate lost its partial/final split:\n$p")
    assert(p.contains("partial_approx_top_k_combine") &&
        p.contains("approx_top_k_combine("),
      s"top-k combine lost its partial/final split:\n$p")
  }

  test("q109: the incremental scan reads exactly the delta files") {
    // snapshotChanges(v1, v3) over the three-append fixture must plan a
    // scan whose file list is the v2+v3 manifest diff — never v1's files
    // and never a full-table directory listing
    val files = SparkEntry.allSpecs.find(_.name == "q109_snapshot_changes")
      .get.run(spark, sf).inputFiles
    assert(files.nonEmpty, "q109 scan has no input files")
    assert(files.forall(f =>
        f.contains("/data/v00000002-") || f.contains("/data/v00000003-")),
      s"q109 reads beyond the delta versions:\n${files.mkString("\n")}")
    assert(!files.exists(_.contains("/data/v00000001-")),
      s"q109 re-reads the base version's files:\n${files.mkString("\n")}")
  }

  test("q113: manifest stats prune the scan to the matching files only") {
    // the date-range predicate covers only the THIRD append's
    // o_orderdate range, so snapshotReadWhere must hand Spark a scan
    // whose file list is v3's alone — pruned from the manifest's
    // per-file min/max at planning time, zero I/O against v1/v2 files
    val files = SparkEntry.allSpecs.find(_.name == "q113_snapshot_skipping")
      .get.run(spark, sf).inputFiles
    assert(files.nonEmpty, "q113 scan has no input files")
    assert(files.forall(_.contains("/data/v00000003-")),
      s"q113 reads files the manifest stats should have pruned:\n" +
        files.mkString("\n"))
  }

  test("q130: the widened scan spans narrow and wide generations, stats-pruned") {
    // the fixture's first two appends predate the retype (int/float on
    // disk) and the third is wide (bigint/double); the k_id >= 500
    // predicate must prune the FIRST append's files from the manifest
    // stats while the surviving scan decodes both generations under the
    // single widened schema — one scan, no per-generation split
    val files = SparkEntry.allSpecs.find(_.name == "q130_snapshot_retype")
      .get.run(spark, sf).inputFiles
    assert(files.nonEmpty, "q130 scan has no input files")
    assert(!files.exists(_.contains("/data/v00000001-")),
      s"q130 reads the below-range narrow files the stats should have " +
        s"pruned:\n${files.mkString("\n")}")
    assert(files.exists(_.contains("/data/v00000002-")) &&
      files.exists(_.contains("/data/v00000004-")),
      s"q130 must span pre- and post-retype generations:\n" +
        files.mkString("\n"))
  }

  test("q90: native AsOfJoinExec with pruned 3-column scans, ≤ 3 shuffles") {
    val p = initial("q90_asof_native")
    assert(p.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty,
      s"expected the native as-of operator in:\n$p")
    // a custom node is opaque to ColumnPruning — the query pre-projects,
    // so the events scans must still read only (event_id, user_id, ts,
    // event_type), never the untouched value/payload columns
    assert(!p.toString.contains("value"),
      "as-of inputs read unpruned events columns")
    val exchanges = p.collect { case e: ShuffleExchangeExec => e }
    // purchase agg + the two as-of key exchanges share the user_id
    // clustering where possible; the final orderBy adds a range exchange
    assert(exchanges.size <= 4, s"unexpected shuffles: ${exchanges.size}")
  }

  test("q119: the MOR overlay is a broadcast anti-join — the corpus never shuffles for it") {
    val p = initial("q119_snapshot_mor_delete")
    val anti = p.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty,
      s"expected the delete overlay as a broadcast LeftAnti join in:\n$p")
    // the key set broadcasts; the data side must NOT pay a shuffle or a
    // sort-merge join for the overlay
    val smj = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.isEmpty, s"overlay degraded to a sort-merge join:\n$p")
  }

  test("q118: nearest direction rides the SAME single-pass as-of plan as q90") {
    // nearest must not regress to a second join or an extra pass — it is
    // q90's plan shape with a different match rule inside the operator
    val p = initial("q118_asof_nearest")
    assert(p.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty ||
        p.collect { case e: graft.plans.BroadcastAsOfJoinExec => e }.nonEmpty,
      s"expected one native as-of operator in:\n$p")
    val asofs =
      p.collect { case e: graft.plans.AsOfJoinExec => e }.size +
        p.collect { case e: graft.plans.BroadcastAsOfJoinExec => e }.size
    assert(asofs === 1, s"nearest planned $asofs as-of operators (want 1)")
    val exchanges = p.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 4, s"unexpected shuffles: ${exchanges.size}")
  }
}
