package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-access bridge: `Dataset.ofRows` is `private[sql]`, and graft's
  * custom logical operators (e.g. [[graft.plans.AsOfJoinPlan]]) need a way
  * to re-enter the public `DataFrame` world after constructing a plan node
  * the fluent API can't express. This is the standard extension-library
  * pattern (the hook `SparkSessionExtensions` itself expects: strategies
  * see the plan, but something must put the plan into a Dataset first).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression a public `Column` wraps (`Column.expr` of
    * Spark ≤3; a `ColumnNode` behind `private[sql]` converters in 4.x).
    * `ExpressionUtils.expression` alone returns a LAZY
    * `ColumnNodeExpression` shell — the node-to-catalyst conversion must
    * be forced for callers that pattern-match the tree. Needed by plan-
    * level analysis OUTSIDE a query — e.g. manifest-stats file pruning
    * ([[graft.ops.Layout.snapshotReadWhere]]) decomposes a predicate
    * into conjuncts before any Dataset exists to resolve it against. */
  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The inverse wrap: a public `Column` over a raw Catalyst expression
    * — needed where an expression comes from the SQL PARSER rather than
    * the fluent API (e.g. the `snapshot_read_where` TVF parses its
    * predicate string with the session parser and must hand
    * [[graft.ops.Layout.snapshotReadWhere]] the Column it expects). */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** True when RE-EXECUTING `df`'s plan several times is both STABLE
    * (same rows every time) and CHEAPER than materializing a pinning
    * copy: every leaf is an IN-MEMORY relation (local data / range —
    * re-execution costs nothing), every expression is deterministic,
    * and no subquery can smuggle an unchecked plan in. What it buys:
    * a caller that must evaluate one frame several times (validate,
    * probe, commit — [[graft.ops.Layout.snapshotBranchMerge]] runs
    * ~6 jobs over its update frame) can skip the scratch parquet
    * round-trip for the common driver-built CDC batch. FILE-BACKED
    * deterministic plans deliberately answer false even though
    * re-execution is stable for them too (the file list is captured
    * at construction): measured on the branch-merge bench workload,
    * re-scanning a filter+union source per validation is SLOWER
    * end-to-end than pinning once and re-reading the small scratch
    * copy — ~12% on the round-15 two-commit merge, re-A/B'd at ~5%
    * on the round-16 one-commit merge (one fewer manifest round-trip
    * narrows the gap but does not flip it; BranchMergeProfile's
    * file(NO pin) arm keeps the break-even measurable) — the pin is
    * a cost FLOOR of O(batch), the re-executions cost O(source scan)
    * each. Conservative on everything else: a
    * DSv2 relation, a stream, a subquery, or any nondeterministic
    * expression answers false and the caller pins. */
  def stableReplayablePlan(df: Dataset[_]): Boolean = {
    val plan = df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
    def exprOk(e: catalyst.expressions.Expression): Boolean =
      e.deterministic && !e.exists(
        _.isInstanceOf[catalyst.expressions.SubqueryExpression])
    !plan.isStreaming &&
      plan.collectLeaves().forall {
        case _: catalyst.plans.logical.LocalRelation => true
        case _: catalyst.plans.logical.Range => true
        case _ => false
      } &&
      plan.collect { case p => p }.forall(_.expressions.forall(exprOk))
  }

  /** Schema of ONE parquet file, read from its footer ON THE DRIVER —
    * no Spark job. `spark.read.parquet(path).schema` (and a schemaless
    * `spark.read.parquet(...)`) run parquet schema inference as a
    * one-task Spark JOB per call (`readParquetFootersInParallel`):
    * StageProbe shows every snapshot-table open paying 1–2 such jobs at
    * 30–50 ms wall each — pure scheduling overhead for a ~1 ms local
    * footer read, and at 100 TB driver-side jobs do not parallelize
    * (round-19 metadata-plane pass; the scaling block's ≈1.0 ratios).
    * Conversion uses Spark's OWN ParquetToSparkSchemaConverter driven by
    * the session's SQLConf, so binaryAsString / int96 / timestampNTZ /
    * legacy-nanos decisions are identical to what inference would have
    * produced. */
  def parquetSchemaOf(spark: SparkSession, path: String): types.StructType = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val hconf = cs.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val msg = try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
    new execution.datasources.parquet.ParquetToSparkSchemaConverter(
      cs.sessionState.conf).convert(msg)
  }

  /** A parquet scan over an explicit file list, tagged `isStreaming` —
    * what a V1 streaming `Source.getBatch` must return (the engine
    * splices it in place of the streaming relation; a plain batch
    * `spark.read.parquet` would fail the incremental planner). This is
    * `FileStreamSource`'s own construction, reachable only from the sql
    * package: `DataSource.resolveRelation` + `LogicalRelation(...,
    * isStreaming = true)`. Empty file list → empty streaming relation
    * with the given schema (a micro-batch whose versions were all
    * compaction rewrites carries zero rows, not an error). */
  def parquetFilesAsStreaming(spark: SparkSession, paths: Seq[String],
      schema: types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty)
      cs.internalCreateDataFrame(
        cs.sparkContext.emptyRDD[catalyst.InternalRow], schema,
        isStreaming = true)
    else {
      val ds = execution.datasources.DataSource(cs, paths = paths,
        userSpecifiedSchema = Some(schema), className = "parquet")
      classic.Dataset.ofRows(cs, execution.datasources.LogicalRelation(
        ds.resolveRelation(checkFilesExist = false), isStreaming = true))
    }
  }
}

/** Derives a sibling session carrying [[graft.GraftExtensions]] from any
  * existing session (same `SparkContext`, session conf copied). Parser
  * injection is the ONE extension point with no runtime registration
  * path — `sessionState.sqlParser` is fixed at session build — so a
  * session we did not construct (the driver's) reaches the `ASOF JOIN`
  * SQL syntax through this bridge. Built with the public
  * `Builder.withExtensions` path: the default/active session slots are
  * cleared for the duration of `getOrCreate` (else it would return the
  * base session unchanged) and restored after, so the caller's session
  * remains the process default. Memoized per SparkContext.
  *
  * Conf semantics: the sibling's conf is NOT a one-time snapshot — on
  * every call the base session's current RUNTIME conf is re-synced onto
  * the sibling (modifiable keys whose values differ, e.g. a
  * `spark.sql.session.timeZone` flipped after first use — timezone skew
  * would otherwise silently corrupt epoch-micros outputs). Static confs
  * are fixed at sibling build, as they are for any session.
  *
  * Thread-safety: the `synchronized` block guards the bridge's own
  * state only. The process-global default/active session slots are
  * empty for the duration of the inner `getOrCreate`; an UNRELATED
  * thread racing `SparkSession.builder().getOrCreate()` (or reading
  * `getDefaultSession`) in that window can observe no session and build
  * a stray one. That is acceptable for this bridge's use (bench/verify
  * harnesses calling from one driver thread at a time); do not call it
  * concurrently with session construction elsewhere.
  */
object GraftSessionBridge {
  @volatile private var cached: SparkSession = _

  def withGraftExtensions(base: SparkSession): SparkSession = {
    val c = base.asInstanceOf[classic.SparkSession]
    if (c.sessionState.sqlParser.isInstanceOf[graft.plans.GraftSqlParser]) c
    else synchronized {
      if (cached == null || cached.sparkContext != c.sparkContext) {
        val active = classic.SparkSession.getActiveSession
        val default = classic.SparkSession.getDefaultSession
        try {
          classic.SparkSession.clearActiveSession()
          classic.SparkSession.clearDefaultSession()
          val b = classic.SparkSession.builder()
            .withExtensions(new graft.GraftExtensions)
          c.conf.getAll.foreach { case (k, v) => b.config(k, v) }
          cached = b.getOrCreate()
        } finally {
          default.foreach(classic.SparkSession.setDefaultSession)
          active.foreach(classic.SparkSession.setActiveSession)
        }
      }
      // re-sync mutable confs changed on the base since the last call
      c.conf.getAll.foreach { case (k, v) =>
        if (cached.conf.getOption(k) != Some(v) && cached.conf.isModifiable(k))
          cached.conf.set(k, v)
      }
      cached
    }
  }
}
