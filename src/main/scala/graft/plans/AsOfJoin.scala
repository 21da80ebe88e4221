package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native AS-OF join — a whole-operator extension through the full
  * Catalyst stack: custom [[AsOfJoinPlan]] logical node, planned by
  * [[AsOfJoinStrategy]] into the custom [[AsOfJoinExec]] physical
  * operator (SURVEY §2.10 tier (c): LogicalPlan + SparkStrategy +
  * SparkPlan via `SparkSessionExtensions.injectPlannerStrategy`).
  *
  * Semantics (= DuckDB `ASOF LEFT JOIN`, pandas `merge_asof`): every left
  * row is matched to AT MOST ONE right row — the right row with the same
  * key whose time is the latest at-or-before the left time (`Backward`),
  * or the earliest at-or-after it (`Forward`). Unmatched left rows emit
  * nulls for the right columns (left-outer).
  *
  * Why a physical operator and not the union+window rewrite (q36/q60):
  * the rewrite materializes left∪right into ONE window state and pays a
  * full-width sort of both sides' payloads through the window buffer. The
  * native operator instead:
  *   - hash-partitions each side on the key (the only shuffle; at 100 TB
  *     both sides co-partition and the merge is embarrassingly parallel),
  *   - sorts each side within partitions by (key, time) — Spark's
  *     external radix/Tungsten sort, spill-safe,
  *   - streams BOTH sorted iterators through a single-pass merge with
  *     O(1) state per partition (one buffered match row) — no window
  *     buffer, no union, no side/tag columns, and the right payload is
  *     never widened onto left rows until the instant of emission.
  *
  * The reference's pipeline has no as-of join, but its data model begs
  * for one (match each GPS breadcrumb to the latest stop event
  * at-or-before it); the operator is keyed to that shape: few keys ×
  * long time-sorted runs.
  *
  * Determinism: if several right rows share the match (key, time) the
  * winner is positional — pre-dedup the right side per (key, time) for a
  * deterministic result (the registered queries q90/q92 do, mirroring
  * what DuckDB's ASOF requires of its build side).
  *
  * Column pruning: Catalyst's own ColumnPruning does not traverse an
  * unknown node, so [[AsOfJoinPruning]] (registered alongside the
  * strategy) seeds the needed-column set from ANY parent shape —
  * Project, Aggregate, Window, Filter, Sort, Join, … — and pushes it
  * through the node into both children, so an `agg(max(payload))`
  * directly on the join still narrows the scans (spec-pinned); unknown
  * parent operators conservatively keep every column.
  */
object AsOfJoin {

  sealed trait Direction extends Serializable
  /** match the latest right time <= left time */
  case object Backward extends Direction
  /** match the earliest right time >= left time */
  case object Forward extends Direction
  /** match the right time with the smallest ABSOLUTE gap to the left
    * time, looking both ways (pandas `merge_asof(direction='nearest')`);
    * an exact tie prefers the backward (earlier) candidate —
    * deterministic, and consistent with Backward being the default
    * direction. Requires an integral/timestamp time axis (the two
    * candidates' distances must be subtracted, not just ordered). */
  case object Nearest extends Direction

  /** Physical-strategy hint — the BHJ-vs-SMJ choice, as-of flavored. */
  sealed trait Hint extends Serializable
  /** broadcast when the build side's estimated size clears
    * `spark.sql.autoBroadcastJoinThreshold` (and the time axis is
    * integral), else sort-merge */
  case object Auto extends Hint
  /** force the co-partitioned sort-merge ([[AsOfJoinExec]]) */
  case object Merge extends Hint
  /** force the broadcast probe ([[BroadcastAsOfJoinExec]]): the 100 TB
    * shape when the build side is dimension-sized — the probe side
    * needs NO shuffle and NO sort */
  case object Broadcast extends Hint

  /** Left-outer as-of join on equi-key `on`, matching the latest
    * `right.rightTime` at-or-before `left.leftTime`.
    *
    * @param tolerance maximum allowed time gap between a left row and
    *   its match, in the axis's native unit (MICROSECONDS for
    *   timestamps): matches farther back than `leftTime - tolerance`
    *   are discarded (pandas `merge_asof(tolerance=…)`). Requires an
    *   integral/timestamp time axis.
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None, hint: Hint = Auto): DataFrame =
    join(left, right, on, leftTime, rightTime, Backward, tolerance, hint)

  /** Left-outer as-of join matching the earliest right time at-or-after
    * the left time (time-to-next-event shape). */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None, hint: Hint = Auto): DataFrame =
    join(left, right, on, leftTime, rightTime, Forward, tolerance, hint)

  /** Left-outer as-of join matching the right time NEAREST to the left
    * time in absolute distance, either side; ties prefer backward
    * (sensor-alignment shape: snap each reading to the closest
    * calibration point). Integral/timestamp time axis only. */
  def nearest(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None, hint: Hint = Auto): DataFrame =
    join(left, right, on, leftTime, rightTime, Nearest, tolerance, hint)

  private def join(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, dir: Direction,
      tolerance: Option[Long], hint: Hint): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(on.nonEmpty, "as-of join needs at least one equi-key column")
    // Self-join safety: re-alias every right column (fresh exprIds — the
    // analyzer dedups `Join`, not custom nodes) and drop null keys/times
    // from the build side (SQL join semantics; the merge's natural
    // ordering would otherwise treat NULL as a small value). Built as
    // raw catalyst nodes, not `col(name)` — a column literally named
    // "a.b" must stay a literal name, never a nested-field path.
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rAliased: LogicalPlan = org.apache.spark.sql.catalyst.plans.logical
      .Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def resolve(plan: LogicalPlan, name: String): Attribute = {
      val hits =
        plan.output.filter(a => spark.sessionState.analyzer.resolver(a.name, name))
      require(hits.nonEmpty,
        s"as-of join column '$name' not in ${plan.output.map(_.name)}")
      require(hits.size == 1,
        s"as-of join column '$name' is ambiguous (${hits.size} matches)")
      hits.head
    }
    val rKeys = on.map(resolve(rAliased, _))
    val rTime = resolve(rAliased, rightTime)
    val rPlan: LogicalPlan = org.apache.spark.sql.catalyst.plans.logical
      .Filter((rKeys :+ rTime).map(IsNotNull).reduce[Expression](And), rAliased)
    val node = AsOfJoinPlan(
      on.map(resolve(lPlan, _)), rKeys,
      resolve(lPlan, leftTime), rTime,
      dir, tolerance, hint, lPlan, rPlan)
    require(node.leftKeys.map(_.dataType) == node.rightKeys.map(_.dataType),
      "as-of join key types must match on both sides")
    require(node.leftTime.dataType == node.rightTime.dataType,
      "as-of join time types must match on both sides")
    require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
    if (tolerance.isDefined || hint == Broadcast || dir == Nearest) {
      require(AsOfTime.supports(node.leftTime.dataType),
        s"tolerance/broadcast/nearest need an integral or timestamp " +
          s"time axis, got ${node.leftTime.dataType}")
    }
    GraftPlanBridge.ofRows(spark, node)
  }

  /** Builder for the `asof_join` table-valued function — the SQL front
    * door to the native operator, so a SQL-only user reaches the same
    * plan DuckDB's `ASOF LEFT JOIN` syntax gives them:
    *
    * {{{
    *   SELECT * FROM asof_join(TABLE(trades), TABLE(quotes),
    *                           'sym', 'tts', 'qts', 'backward')
    *   -- optional args also bind by name:
    *   SELECT * FROM asof_join(TABLE(t), TABLE(q), 'sym', 'tts', 'qts',
    *                           hint => 'merge', tolerance => 5000000)
    * }}}
    *
    * Positional arguments: TABLE(left), TABLE(right), the equi-key
    * column list (comma-separated), the left and right time columns,
    * then optionally direction (`'backward'` (default) | `'forward'`),
    * tolerance (integral literal in the time axis's native unit —
    * MICROSECONDS for timestamps; NULL = unbounded), and the physical
    * hint (`'auto'` (default) | `'merge'` | `'broadcast'`); the three
    * optional ones may instead be passed as `name => value` named
    * arguments in any order. TABLE args take a table/view name, an
    * inline subquery (`TABLE(SELECT …)`), or a WITH-clause CTE name.
    *
    * The table arguments arrive as
    * `FunctionTableSubqueryArgumentExpression`s; their (possibly still
    * unresolved — e.g. CTE-referencing) plans become the children of an
    * [[AsOfJoinSqlNode]], so they resolve INSIDE the enclosing query's
    * tree like any other relation, and [[AsOfJoinPruning]] lowers the
    * name-based node to the real [[AsOfJoinPlan]] once analysis is done.
    * Registered by [[graft.GraftExtensions]] (`injectTableFunction`) or
    * at runtime via [[ensureSqlDoor]]. */
  private[graft] def tvfBuilder(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{
      FunctionTableSubqueryArgumentExpression => TableArg,
      NamedArgumentExpression => NamedArg}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val usage =
      "usage: asof_join(TABLE(left), TABLE(right), 'k1[,k2…]', " +
        "'leftTime', 'rightTime'[, 'backward'|'forward'|'nearest'[, tolerance[, " +
        "'auto'|'merge'|'broadcast']]]) — the trailing three also bind " +
        "as direction/tolerance/hint named args"
    val (positional, named) = args.span(!_.isInstanceOf[NamedArg])
    require(positional.length >= 5 && positional.length <= 8 &&
        named.forall(_.isInstanceOf[NamedArg]),
      usage + " (named args must follow all positional ones)")
    val namedPairs = named.map {
      case NamedArg(key, value) => key.toLowerCase -> value
    }
    require(namedPairs.map(_._1).distinct.length == namedPairs.length,
      s"asof_join named argument(s) given more than once: " +
        s"${namedPairs.groupBy(_._1).collect { case (k, vs) if vs.length > 1 => k }
          .mkString(", ")}; $usage")
    val byName = namedPairs.toMap
    require(byName.keySet.subsetOf(Set("direction", "tolerance", "hint")),
      s"unknown asof_join named argument(s) " +
        s"${byName.keySet -- Set("direction", "tolerance", "hint")}; $usage")
    def opt(i: Int, name: String): Option[Expression] =
      if (positional.length > i) {
        require(!byName.contains(name),
          s"asof_join $name given both positionally and by name")
        Some(positional(i))
      } else byName.get(name)
    def tableArg(i: Int): LogicalPlan = positional(i) match {
      case t: TableArg =>
        require(t.partitionByExpressions.isEmpty &&
            t.orderByExpressions.isEmpty,
          "asof_join TABLE args take no PARTITION BY / ORDER BY — keys " +
            "and times are the function's scalar arguments")
        t.plan
      case other => throw new IllegalArgumentException(
        s"asof_join argument ${i + 1} must be TABLE(...), got: ${other.sql}")
    }
    def str(e: Expression, what: String): String = e match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"asof_join $what must be a string literal, got: ${other.sql}")
    }
    val on = str(positional(2), "key list (argument 3)")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(on.nonEmpty, "as-of join needs at least one equi-key column")
    val lt = str(positional(3), "left time column (argument 4)")
    val rt = str(positional(4), "right time column (argument 5)")
    val dir = opt(5, "direction").map(str(_, "direction").toLowerCase)
        .getOrElse("backward") match {
      case "backward" => Backward
      case "forward"  => Forward
      case "nearest"  => Nearest
      case other => throw new IllegalArgumentException(
        s"unknown asof_join direction '$other' " +
          "(want backward|forward|nearest)")
    }
    val tol: Option[Long] = opt(6, "tolerance").flatMap {
      case Literal(null, _) => None // NULL = unbounded
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case other => throw new IllegalArgumentException(
        s"asof_join tolerance must be an integral literal or NULL, " +
          s"got: ${other.sql}")
    }
    require(tol.forall(_ >= 0), "as-of tolerance must be >= 0")
    val hint = opt(7, "hint").map(str(_, "hint").toLowerCase)
        .getOrElse("auto") match {
      case "auto" => Auto
      case "merge" => Merge
      case "broadcast" => Broadcast
      case other => throw new IllegalArgumentException(
        s"unknown asof_join hint '$other' (want auto|merge|broadcast)")
    }
    AsOfJoinSqlNode(on, lt, rt, dir, tol, hint, tableArg(0), tableArg(1))
  }

  /** The `asof_join` TVF registration triple for
    * `SparkSessionExtensions.injectTableFunction`. */
  def tvfRegistration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("asof_join"),
      new ExpressionInfo(AsOfJoin.getClass.getName, "asof_join"),
      tvfBuilder _)

  /** Idempotent runtime registration of [[ensureStrategy]] plus the
    * `asof_join` table-valued function, for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions` (the driver's). */
  def ensureSqlDoor(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    val (ident, info, builder) = tvfRegistration
    val reg = spark.sessionState.tableFunctionRegistry
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, info, builder)
    }
  }

  /** Idempotent runtime registration for sessions not built with
    * `spark.sql.extensions=graft.GraftExtensions` (the driver's). An
    * extensions-built session already carries both (checked via the
    * planner/optimizer, not just `experimental`) — don't double-run the
    * rule there. Note the runtime-registered pruning rule executes in
    * the late "User Provided Optimizers" batch: for V1 parquet scans
    * (the default) pruning still reaches the scan, but a DSv2 scan's
    * schema is fixed earlier — use the extensions registration when
    * running on pure-DSv2 sources. */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy) &&
        !spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPruning) &&
        !spark.sessionState.optimizer.batches
          .exists(_.rules.contains(AsOfJoinPruning))) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPruning
    }
  }
}

/** The USING-style output contract shared by the logical node and both
  * physical operators: left columns ++ right payload (right keys/time
  * dropped — they'd duplicate the left's), right side forced nullable. */
private[plans] object AsOfOutput {
  def apply(leftOut: Seq[Attribute], rightOut: Seq[Attribute],
      rightKeys: Seq[Attribute], rightTime: Attribute): Seq[Attribute] = {
    val dropped = (rightKeys :+ rightTime).map(_.exprId).toSet
    leftOut ++ rightOut.filterNot(a => dropped(a.exprId))
      .map(_.withNullability(true))
  }
}

/** The name-based intermediate the `asof_join` TVF builds during
  * analysis. Its children may still be UNRESOLVED when the builder runs
  * (a `TABLE(cte_name)` argument arrives as a dangling `CTERelationRef`
  * that only resolves inside the enclosing query's tree), so column
  * names can't yet bind to attributes; this node carries the names,
  * resolves itself once its children do, and is lowered to the
  * attribute-based [[AsOfJoinPlan]] — adding the build-side null filter
  * the Scala API adds — by [[AsOfJoinPruning]] before planning (with
  * [[AsOfJoinStrategy]] lowering on sight as a fallback). Output
  * attributes are the children's own (left columns ++ right payload,
  * nullable), so the lowering is exprId-stable under every parent the
  * analyzer resolved against this node.
  *
  * Self-join note: if both TABLE args resolve to the SAME relation the
  * analyzer's `DeduplicateRelations` renews one side's exprIds (as for
  * any binary operator); should the sides ever still overlap, `resolved`
  * stays false and analysis fails loudly instead of mis-binding. */
case class AsOfJoinSqlNode(
    on: Seq[String], leftTimeName: String, rightTimeName: String,
    direction: AsOfJoin.Direction, tolerance: Option[Long],
    hint: AsOfJoin.Hint,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  private def find(side: LogicalPlan, name: String): Option[Attribute] = {
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    side.output.filter(a => resolver(a.name, name)) match {
      case scala.collection.Seq(one) => Some(one)
      case _ => None // absent or ambiguous
    }
  }
  private[plans] def leftKeys: Seq[Attribute] = on.flatMap(find(left, _))
  private[plans] def rightKeys: Seq[Attribute] = on.flatMap(find(right, _))
  private[plans] def leftTime: Option[Attribute] = find(left, leftTimeName)
  private[plans] def rightTime: Option[Attribute] = find(right, rightTimeName)

  override lazy val resolved: Boolean = childrenResolved &&
    leftKeys.length == on.length && rightKeys.length == on.length &&
    leftTime.isDefined && rightTime.isDefined &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTime.get.dataType == rightTime.get.dataType &&
    ((tolerance.isEmpty && hint != AsOfJoin.Broadcast) ||
      AsOfTime.supports(leftTime.get.dataType)) &&
    left.outputSet.intersect(right.outputSet).isEmpty

  override def output: Seq[Attribute] =
    AsOfOutput(left.output, right.output, rightKeys,
      rightTime.getOrElse(throw new org.apache.spark.sql.catalyst
        .analysis.UnresolvedException("output")))

  /** This node stores column NAMES, not expressions, so the default
    * (expression-derived) references are empty — and reference-driven
    * rules like ColumnPruning would then strip the key/time columns out
    * of the children. Surface the resolved attributes as references so
    * the stock rules treat the merge's inputs as used. (Payload columns
    * are safe without this: the output passes them through with the
    * children's own exprIds, so a parent's references cover them.) */
  override def references: AttributeSet =
    AttributeSet(leftKeys ++ rightKeys ++ leftTime.toSeq ++ rightTime.toSeq)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinSqlNode =
    copy(left = newLeft, right = newRight)
}

private[plans] object AsOfJoinSqlNode {
  /** Lower the resolved name-based node to the real operator; exprId-
    * stable (the null filter preserves the right child's output). */
  def lower(n: AsOfJoinSqlNode): AsOfJoinPlan = {
    require(n.resolved, s"cannot lower an unresolved asof_join: $n")
    val rKeys = n.rightKeys
    val rTime = n.rightTime.get
    val filtered = org.apache.spark.sql.catalyst.plans.logical.Filter(
      (rKeys :+ rTime).map(IsNotNull).reduce[Expression](And), n.right)
    AsOfJoinPlan(n.leftKeys, rKeys, n.leftTime.get, rTime,
      n.direction, n.tolerance, n.hint, n.left, filtered)
  }
}

/** Column pruning and filter pushdown through the as-of join: Catalyst's
  * stock rules do not traverse unknown nodes, so without this rule ANY
  * parent above an as-of join still scans EVERY input column and filters
  * only AFTER the merge.
  *
  *  - Column pruning: a top-down required-attribute pass. Column-boundary
  *    parents (Project, Aggregate — nodes whose output is fully
  *    determined by their expressions) reset the requirement to their
  *    `references`; known pass-through parents (Filter, Sort, limits,
  *    Window, Generate, Join, …) forward the ancestors' requirement plus
  *    their own references; UNKNOWN nodes conservatively require
  *    everything. At each [[AsOfJoinPlan]] the surviving requirement
  *    (keys and time axes always added — the merge needs them) becomes a
  *    narrowing Project over each child, which V1 physical planning and
  *    the stock rules carry into the parquet scan. So an
  *    `agg(max(payload))` DIRECTLY above the join — no hand
  *    pre-projection — still yields a narrow `ReadSchema` (spec-pinned).
  *  - Filter parent: a deterministic conjunct referencing ONLY left
  *    columns pushes into the left child — sound because the join is a
  *    1:1 left-outer map (each left row yields exactly one output row
  *    with its left values intact, and dropping a left row never
  *    changes another row's match). Conjuncts touching the right
  *    payload stay above (they must see the nulls of unmatched rows).
  *
  * Each step fires only when it strictly narrows/pushes something, so
  * the fixed-point batch terminates. */
object AsOfJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate,
    Filter, Generate, GlobalLimit, Join, LocalLimit, Offset,
    Project, Repartition, RepartitionByExpression, Sample, Sort,
    SubqueryAlias, Window}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists(p => p.isInstanceOf[AsOfJoinPlan] ||
        p.isInstanceOf[AsOfJoinSqlNode])) return plan
    // lower the SQL door's name-based node first, so the pruning and
    // pushdown below see one operator shape
    val lowered = plan.transform {
      case n: AsOfJoinSqlNode => AsOfJoinSqlNode.lower(n)
    }
    val pushed = lowered.transform {
      case f @ Filter(cond, a: AsOfJoinPlan) =>
        val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
          c.deterministic && c.references.subsetOf(a.left.outputSet))
        if (push.isEmpty) f
        else {
          val filtered = a.copy(left = Filter(push.reduce(And), a.left))
          keep.reduceOption(And).fold(filtered: LogicalPlan)(Filter(_, filtered))
        }
    }
    prune(pushed, pushed.outputSet)
  }

  /** Top-down pass: `required` = the attributes of `node`'s output its
    * ancestors still need. Only [[AsOfJoinPlan]] consumes the set (to
    * narrow its children); every other case just propagates it with the
    * correct per-node-type semantics, defaulting to require-everything
    * for operators this rule doesn't know. */
  private def prune(node: LogicalPlan, required: AttributeSet): LogicalPlan =
    node match {
      case a: AsOfJoinPlan =>
        val needed = required ++ AttributeSet(a.leftKeys) ++
          AttributeSet(a.rightKeys) ++
          AttributeSet(Seq(a.leftTime, a.rightTime))
        def narrowed(child: LogicalPlan): LogicalPlan = {
          val keep = child.output.filter(needed.contains)
          val inner = prune(child, AttributeSet(keep))
          if (keep.length == child.output.length) inner
          else Project(keep, inner)
        }
        val (l, r) = (narrowed(a.left), narrowed(a.right))
        if ((l eq a.left) && (r eq a.right)) a
        else a.copy(left = l, right = r)
      // column boundaries: output is fully determined by the node's own
      // expressions, so children owe exactly the node's references
      case p: Project => p.mapChildren(prune(_, p.references))
      case ag: Aggregate => ag.mapChildren(prune(_, ag.references))
      // pass-through operators (output ⊇ child output, same exprIds):
      // children owe the ancestors' requirement plus this node's own.
      // Deduplicate(keys) is multiplicity-safe under pruning (one row per
      // key value regardless of the other columns); Distinct is NOT — it
      // compares ALL columns, so dropping one below it would collapse
      // rows. Distinct never reaches this rule today
      // (ReplaceDistinctWithAggregate runs in an earlier batch), but it
      // deliberately falls to the conservative default below so a future
      // batch reorder can't turn it into a wrong-answer path.
      case u @ (_: Filter | _: Sort | _: LocalLimit | _: GlobalLimit |
                _: Offset | _: SubqueryAlias | _: Deduplicate |
                _: Repartition | _: RepartitionByExpression | _: Sample |
                _: Window | _: Generate | _: Join) =>
        u.mapChildren(c =>
          prune(c, (required ++ u.references).intersect(c.outputSet)))
      // unknown operator (including Distinct): conservative — children
      // keep every column
      case other => other.mapChildren(c => prune(c, c.outputSet))
    }
}

/** Logical as-of join. USING-join-style output: left columns ++ the right
  * side's PAYLOAD columns (keys and time dropped — they'd duplicate the
  * left's; re-select the right time as an extra payload column first if
  * the match time is wanted), right side forced nullable (left-outer).
  * Opaque to rewrite rules by design — the exactness of the operator
  * lives in [[AsOfJoinExec]]'s merge. */
case class AsOfJoinPlan(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    direction: AsOfJoin.Direction,
    tolerance: Option[Long], hint: AsOfJoin.Hint,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    AsOfOutput(left.output, right.output, rightKeys, rightTime)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]] / [[BroadcastAsOfJoinExec]],
  * picking the broadcast probe under `Auto` exactly the way Spark picks
  * BroadcastHashJoin: build-side size estimate vs
  * `spark.sql.autoBroadcastJoinThreshold`. Registered by
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`) or at runtime by
  * [[AsOfJoin.ensureStrategy]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // normally lowered by AsOfJoinPruning; kept as a fallback for
    // sessions where only the strategy got registered
    case n: AsOfJoinSqlNode => apply(AsOfJoinSqlNode.lower(n))
    case p @ AsOfJoinPlan(lk, rk, lt, rt, dir, tol, hint, l, r) =>
      val broadcast = hint match {
        case AsOfJoin.Broadcast => true
        case AsOfJoin.Merge     => false
        case AsOfJoin.Auto =>
          val threshold =
            org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
          threshold > 0 && r.stats.sizeInBytes <= threshold &&
            AsOfTime.supports(lt.dataType)
      }
      if (broadcast) {
        BroadcastAsOfJoinExec(lk, rk, lt, rt, dir, tol,
          planLater(l), planLater(r)) :: Nil
      } else {
        AsOfJoinExec(lk, rk, lt, rt, dir, tol,
          planLater(l), planLater(r)) :: Nil
      }
    case _ => Nil
  }
}

/** The time axes [[BroadcastAsOfJoinExec]] and tolerance support, and
  * their extraction to a comparable Long in the axis's native unit. */
private[plans] object AsOfTime {
  import org.apache.spark.sql.types._
  def supports(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType |
         DateType | ShortType => true
    case _ => false
  }
  /** (row, fieldIndex) => long; only call for [[supports]]ed types */
  def extractor(dt: DataType): (InternalRow, Int) => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => (r, i) => r.getLong(i)
    case IntegerType | DateType                      => (r, i) => r.getInt(i).toLong
    case ShortType                                   => (r, i) => r.getShort(i).toLong
    case other => throw new IllegalArgumentException(s"unsupported time axis $other")
  }
}

/** Physical sort-merge as-of join.
  *
  * Requires both children clustered on the key (one hash exchange per
  * side, satisfied for free when a side is already partitioned right) and
  * sorted by (key, time). Each co-partition is merged in one pass:
  *
  *   - `Backward`: the right cursor advances while its (key, time) is
  *     at-or-before the current left row's, remembering the last
  *     same-key row it passed — that row IS the match (right times are
  *     ascending, so the last one consumed is the latest `<=`).
  *   - `Forward`: the right cursor advances while it is strictly before
  *     the left (key, time) WITHOUT remembering; the row it halts on is
  *     the match iff keys agree (the earliest `>=`). The halted-on row is
  *     not consumed — it may match many left rows.
  *
  * State per partition = one buffered right row + one key projection:
  * O(1) memory regardless of partition size; sorting is the children's
  * (external, spill-safe). Left rows stream out in their sorted order.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    direction: AsOfJoin.Direction, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    AsOfOutput(left.output, right.output, rightKeys, rightTime)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = false, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = false, None) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  // left rows keep their (key, time) sort through the merge
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val allOut = output
    val dir = direction
    val tol = tolerance
    val timeType = leftTime.dataType
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key₀..keyₖ₋₁, time) projections; natural orderings compare the
      // first |fields-of-their-types| positions, so keyOrd over the key
      // types alone ignores the appended time field
      val keyTypes = lKeys.map(_.dataType)
      val timeIdx = keyTypes.length
      // tolerance gate on the (key, time) projections; None → always in
      val inTol: (UnsafeRow, UnsafeRow) => Boolean = tol match {
        case None => (_, _) => true
        case Some(t) =>
          val timeOf = AsOfTime.extractor(timeType)
          dir match {
            case AsOfJoin.Backward =>
              (m, l) => timeOf(l, timeIdx) - timeOf(m, timeIdx) <= t
            case AsOfJoin.Forward =>
              (m, l) => timeOf(m, timeIdx) - timeOf(l, timeIdx) <= t
            case AsOfJoin.Nearest =>
              (m, l) => math.abs(timeOf(m, timeIdx) - timeOf(l, timeIdx)) <= t
          }
      }
      // Nearest compares the two candidates' absolute distances — needs
      // the numeric time even when no tolerance is set (the API layer
      // guarantees an integral/timestamp axis for Nearest)
      val nearTimeOf: (UnsafeRow, Int) => Long =
        if (dir == AsOfJoin.Nearest) AsOfTime.extractor(timeType)
        else null
      val lProj = UnsafeProjection.create(lKeys :+ lTime, lOut)
      val rProj = UnsafeProjection.create(rKeys :+ rTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ktOrd =
        RowOrdering.createNaturalAscendingOrdering(keyTypes :+ lTime.dataType)
      // the joined row carries the FULL right row; the projection keeps
      // only the output attributes (payload — keys/time dropped). The
      // right attrs MUST bind as nullable here: an unmatched left row
      // joins the all-null row, and a non-nullable binding would skip
      // the isNullAt check and read garbage zeros instead of NULL
      val resultProj =
        UnsafeProjection.create(allOut, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      var rHead: InternalRow = null        // next unconsumed right row
      var rHeadKt: UnsafeRow = null        // its (key, time) projection
      // the API layer null-filters the build side, but the exec must not
      // DEPEND on that: a null key/time row constructed through the
      // public case class would sort first and poison lastMatch
      def advanceRight(): Unit = {
        rHead = null; rHeadKt = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rProj(r)
          if (!kt.anyNull) { rHead = r; rHeadKt = kt }
        }
      }
      advanceRight()

      // Backward state: last consumed same-key right row (copied — the
      // iterators reuse row buffers) and its projected key+time
      var lastMatch: InternalRow = null
      var lastMatchKt: UnsafeRow = null

      lIter.map { lRow =>
        val lKt = lProj(lRow)
        val matched: InternalRow = dir match {
          case AsOfJoin.Backward =>
            // consume right rows at-or-before (key, time); remember the
            // last with an equal key. Null left key/time: NULL sorts
            // low in the natural ordering, so an all-null prefix never
            // equals a (null-filtered) right key — no match, by design.
            var continue = rHead != null
            while (continue) {
              val kc = keyOrd.compare(rHeadKt, lKt)
              if (kc < 0 || (kc == 0 && ktOrd.compare(rHeadKt, lKt) <= 0)) {
                if (kc == 0 && !lKt.anyNull) {
                  lastMatch = rHead.copy()
                  lastMatchKt = rHeadKt.copy()
                }
                advanceRight()
                continue = rHead != null
              } else continue = false
            }
            // the latest <= match is the CLOSEST one, so if it falls
            // outside the tolerance no earlier row can fall inside it
            if (lastMatchKt != null && !lKt.anyNull &&
                keyOrd.compare(lastMatchKt, lKt) == 0 &&
                inTol(lastMatchKt, lKt)) lastMatch
            else null
          case AsOfJoin.Forward =>
            // halt on the first right row at-or-after (key, time); match
            // iff it has the same key. Never consumed — later left rows
            // (larger time) may still need it.
            var continue = rHead != null
            while (continue) {
              val kc = keyOrd.compare(rHeadKt, lKt)
              if (kc < 0 || (kc == 0 && ktOrd.compare(rHeadKt, lKt) < 0)) {
                advanceRight()
                continue = rHead != null
              } else continue = false
            }
            if (rHead != null && !lKt.anyNull &&
                keyOrd.compare(rHeadKt, lKt) == 0 &&
                inTol(rHeadKt, lKt)) rHead
            else null
          case AsOfJoin.Nearest =>
            // Backward's advance (consume <=, remember the last same-key
            // row) leaves TWO candidates standing: lastMatch = the
            // latest <= (covers an exactly-equal time) and rHead = the
            // earliest > — compare their absolute gaps, tie → backward.
            // rHead stays unconsumed: later (larger-time) left rows may
            // still need it as their backward side consumes past it.
            var continue = rHead != null
            while (continue) {
              val kc = keyOrd.compare(rHeadKt, lKt)
              if (kc < 0 || (kc == 0 && ktOrd.compare(rHeadKt, lKt) <= 0)) {
                if (kc == 0 && !lKt.anyNull) {
                  lastMatch = rHead.copy()
                  lastMatchKt = rHeadKt.copy()
                }
                advanceRight()
                continue = rHead != null
              } else continue = false
            }
            if (lKt.anyNull) null
            else {
              val backOk = lastMatchKt != null &&
                keyOrd.compare(lastMatchKt, lKt) == 0 && inTol(lastMatchKt, lKt)
              val fwdOk = rHead != null &&
                keyOrd.compare(rHeadKt, lKt) == 0 && inTol(rHeadKt, lKt)
              if (backOk && fwdOk) {
                val lt = nearTimeOf(lKt, timeIdx)
                if (lt - nearTimeOf(lastMatchKt, timeIdx) <=
                    nearTimeOf(rHeadKt, timeIdx) - lt) lastMatch
                else rHead
              }
              else if (backOk) lastMatch
              else if (fwdOk) rHead
              else null
            }
        }
        outRows += 1
        if (matched != null) matchedRows += 1
        resultProj(joined(lRow, if (matched == null) nullRight else matched))
      }
    }
  }
}

/** The probe-side index over a broadcast build side: per join key, the
  * build rows time-sorted plus their extracted times — probe rows
  * binary-search `times` and index `rows` at the found slot. */
private[plans] final class AsOfGroups(
    val groups: java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])])

/** Executor-local memo of [[AsOfGroups]] indexes, so the per-key sort of
  * a broadcast build side runs ONCE per executor, not once per task.
  *
  * Keyed by the IDENTITY of the broadcast `Array[InternalRow]` — each
  * executor materializes a broadcast value exactly once, so every task
  * of every partition sees the same array instance — plus a descriptor
  * of the key/time ordinals (two joins may index the same broadcast
  * differently). The outer map is weak: when the executor's block
  * manager drops the broadcast block, the index entry is collectable
  * with it, so the cache can never outgrow the set of LIVE broadcasts. */
private[plans] object AsOfGroupsCache {
  private val cache = new java.util.WeakHashMap[
    AnyRef, java.util.concurrent.ConcurrentHashMap[String, AsOfGroups]]()
  def getOrBuild(rows: AnyRef, descriptor: String)
      (build: () => AsOfGroups): AsOfGroups =
    cache.synchronized {
      var m = cache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, AsOfGroups]()
        cache.put(rows, m)
      }
      m
    }.computeIfAbsent(descriptor, _ => build())
}

/** Physical broadcast as-of join — the dimension-sized-build-side plan.
  *
  * The build (right) side is required to arrive as a
  * `BroadcastDistribution(IdentityBroadcastMode)`: `EnsureRequirements`
  * plants a standard `BroadcastExchangeExec`, so the build rows are
  * collected and shipped inside Spark's broadcast machinery — memory
  * accounting, size/row limits, job-group attribution — and the exchange
  * is visible to AQE and reusable via `ReuseExchange` across plans (the
  * identity mode canonicalizes trivially). Each executor then folds the
  * broadcast rows into a per-key time-sorted index once
  * ([[AsOfGroupsCache]]); the probe (left) side streams IN PLACE: no
  * shuffle, no sort, no pipeline break — each left row binary-searches
  * its key's time array. At 100 TB this is the difference between
  * re-shuffling the whole fact table and touching it exactly once where
  * it already lives (the same judgment call Spark itself makes for
  * BroadcastHashJoin, applied to the as-of shape).
  *
  * Build-side cost: one broadcast of the O(|right|) rows + one per-
  * executor index fold; probe cost: O(log groupSize) per row. Guarded by
  * `spark.sql.autoBroadcastJoinThreshold` under `Auto`, or forced via
  * `hint = Broadcast` when the caller knows the dimension is small.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    direction: AsOfJoin.Direction, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    AsOfOutput(left.output, right.output, rightKeys, rightTime)

  // probe side passes through untouched — partitioning AND ordering hold
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution:
      Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode
      ) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"),
    // counted where the executor-side index is built, so it reads 0 when
    // AsOfGroupsCache serves a cache hit (a re-run of the same join, or
    // another join sharing the index) and, on a multi-executor cluster,
    // sums one count per executor JVM that built the index — it is a
    // per-build diagnostic, NOT the authoritative build-side row count
    // (that is the broadcast exchange's own numOutputRows)
    "buildRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext,
        "indexed build rows (per index build; 0 on cache hit)"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val allOut = output
    val dir = direction
    val tol = tolerance
    val timeOf = AsOfTime.extractor(leftTime.dataType)

    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")

    // the exchange child collected + broadcast the build rows under
    // Spark's broadcast accounting (see class doc)
    val bc = right.executeBroadcast[Array[InternalRow]]()
    // counted inside the executor-side index build (post null-filter) —
    // dereferencing bc.value here would materialize the whole broadcast
    // array on the driver purely for a metric
    val buildRowsM = longMetric("buildRows")
    // which ordinals this join indexes the broadcast rows by — the cache
    // key alongside the array identity. Resolved by exprId (the same
    // identity BindReferences uses): Seq.indexOf would compare the whole
    // AttributeReference including nullability, which the build side's
    // IsNotNull filter narrows, yielding -1 for every column and
    // collapsing all descriptors to one string.
    val descriptor = (rKeys :+ rTime)
      .map(a => rOut.indexWhere(_.exprId == a.exprId))
      .mkString("k", ",", "")

    left.execute().mapPartitions { lIter =>
      val groups = AsOfGroupsCache.getOrBuild(bc.value, descriptor) { () =>
        // key -> (sorted times, rows in that order); null keys/times never
        // match (the API layer filters them, but a directly-constructed
        // exec must not read a NULL time as epoch 0 and match it). The
        // broadcast rows are materialized copies — safe to reference.
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
        val built =
          new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]
        val indexed = bc.value
          .filter(r => !rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0))
        buildRowsM += indexed.length
        indexed
          .map(r => (rKeyProj(r).copy(), timeOf(rTimeProj(r), 0), r))
          .groupBy(_._1)
          .foreach { case (k, rws) =>
            val sorted = rws.sortBy(_._2)
            built.put(k, (sorted.map(_._2), sorted.map(_._3: InternalRow)))
          }
        new AsOfGroups(built)
      }.groups
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val resultProj =
        UnsafeProjection.create(allOut, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // greatest index with times(i) <= t, or -1
      def floorIdx(times: Array[Long], t: Long): Int = {
        var lo = 0; var hi = times.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        ans
      }
      // least index with times(i) >= t, or times.length
      def ceilIdx(times: Array[Long], t: Long): Int = {
        var lo = 0; var hi = times.length - 1; var ans = times.length
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) >= t) { ans = mid; hi = mid - 1 } else lo = mid + 1
        }
        ans
      }

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val ltRow = lTimeProj(lRow)
        var matched: InternalRow = null
        if (!lk.anyNull && !ltRow.isNullAt(0)) {
          val group = groups.get(lk)
          if (group != null) {
            val (times, rows) = group
            val t = timeOf(ltRow, 0)
            dir match {
              case AsOfJoin.Backward =>
                val i = floorIdx(times, t)
                if (i >= 0 && tol.forall(t - times(i) <= _)) matched = rows(i)
              case AsOfJoin.Forward =>
                val i = ceilIdx(times, t)
                if (i < times.length && tol.forall(times(i) - t <= _))
                  matched = rows(i)
              case AsOfJoin.Nearest =>
                // floor and ceil candidates; smaller |gap| wins, tie →
                // backward (an exact-equal time IS both, same row)
                val b = floorIdx(times, t)
                val f = ceilIdx(times, t)
                val backOk = b >= 0 && tol.forall(t - times(b) <= _)
                val fwdOk = f < times.length && tol.forall(times(f) - t <= _)
                if (backOk && fwdOk)
                  matched = if (t - times(b) <= times(f) - t) rows(b)
                            else rows(f)
                else if (backOk) matched = rows(b)
                else if (fwdOk) matched = rows(f)
            }
          }
        }
        outRows += 1
        if (matched != null) matchedRows += 1
        resultProj(joined(lRow, if (matched == null) nullRight else matched))
      }
    }
  }
}
