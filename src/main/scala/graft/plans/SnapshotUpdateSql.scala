package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

import graft.ops.Layout
import graft.sources.GraftSnapshotTable

/** SQL `UPDATE … SET … WHERE` for snapshot tables — completing the
  * catalog's SQL DML triad (INSERT / DELETE / MERGE landed earlier;
  * the reference's keyed UPDATE, stop_consumer.py:76-78, is literally
  * an `UPDATE … WHERE stop_id = ?`). Spark parses into [[UpdateTable]];
  * the built-in rewrite only serves `SupportsRowLevelOperations`
  * tables, so — exactly like [[SnapshotMergeRule]] — this resolution
  * rule converts the resolved node into a command that lands a
  * [[Layout.snapshotUpdateWhere]] file-granular copy-on-write commit:
  * only files containing a predicate-matching row are rewritten (the
  * manifest-stats-pruned probe decides the file list before any data
  * I/O), everything else carries forward byte-identical.
  *
  * Assigned values and the predicate read the row's own columns
  * (`SET v = v + 1 WHERE s = 'a'`) with no join at all — the rewrite
  * happens inside the scan of each touched file (MERGE reads the
  * target through a key-join; UPDATE is the cheaper self-referential
  * case). Subqueries in the predicate or values refuse (the probe
  * needs a plain predicate); nested-field assignment refuses. With
  * declared keys (`graft.key`) the commit records typed-feed cdc.
  *
  * A BRANCH target (`UPDATE cat.db.\`t@audit\``) stages instead
  * (round 14): [[Layout.snapshotBranchUpdateWhere]] composes the
  * branch's merge-on-read grammar — takedown of the matched keys +
  * append of the updated rows — keyed tables only, invisible to main
  * until the publish. */
object SnapshotUpdateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(target, assignments, condition)
          if u.resolved && SnapshotMergeRule.snapshotTargetOf(target).isDefined =>
        translate(target, assignments, condition,
          SnapshotMergeRule.snapshotTargetOf(target).get)
    }

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"UPDATE snapshot table: $msg")

  private def translate(target: LogicalPlan,
      assignments: Seq[Assignment], condition: Option[Expression],
      tbl: GraftSnapshotTable): LogicalPlan = {
    if (tbl.snapVersion > 0)
      refuse("cannot UPDATE a time-travel (VERSION/TIMESTAMP AS OF) snapshot")
    // a branch target routes to the staged composition below (keyed
    // tables only — Layout.snapshotBranchUpdateWhere refuses the rest
    // with the declare-or-MERGE remedy)
    val tgtOut = target.outputSet
    // the command re-resolves everything against the rewrite scan by
    // NAME — swap resolved target attributes for unresolved ones
    def nameBased(e: Expression, what: String): Expression = {
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        refuse(s"$what contains a subquery — the file-granular probe " +
          "needs a plain predicate (pre-compute the subquery into a " +
          "literal list, or use the Scala API)")
      if (!e.references.subsetOf(tgtOut))
        refuse(s"$what references columns outside the table")
      e.transform {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      }
    }
    val asg = assignments.map { a =>
      a.key match {
        case ar: AttributeReference if tgtOut.contains(ar) =>
          ar.name -> nameBased(a.value, s"SET ${ar.name}")
        case other => refuse(s"cannot assign `${other.sql}` — only " +
          "whole top-level columns")
      }
    }
    val cond = condition.map(nameBased(_, "WHERE clause"))
      .getOrElse(Literal(true))
    SnapshotUpdateCommand(tbl.snapDir,
      asg.map { case (n, e) => n -> NameExpr(e) }, NameExpr(cond),
      tbl.snapBranch)
  }
}

/** Opaque holder keeping a deliberately name-based (unresolved)
  * expression OUT of the command's visible expression tree —
  * CheckAnalysis would otherwise flag the unresolved attribute names,
  * which are the point: they re-resolve against the rewrite scan
  * inside [[Layout.snapshotUpdateWhere]]. */
private[plans] case class NameExpr(e: Expression) {
  override def toString: String = e.sql
}

/** Executes the translated UPDATE: one
  * [[Layout.snapshotUpdateWhere]] commit; returns the committed
  * snapshot version as a single row. */
case class SnapshotUpdateCommand(dir: String,
    assignments: Seq[(String, NameExpr)],
    cond: NameExpr,
    branch: Option[String] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val v = branch match {
      // UPDATE cat.db.`t@branch`: staged through the branch's MOR
      // grammar (takedown of the matched keys + append of the updated
      // rows) — keyed tables only, audit-visible, invisible to main
      // until CALL system.fast_forward
      case Some(b) =>
        Layout.snapshotBranchUpdateWhere(session, dir, b,
          GraftPlanBridge.columnOf(cond.e),
          assignments.map { case (n, h) =>
            n -> GraftPlanBridge.columnOf(h.e) })
      case None =>
        Layout.snapshotUpdateWhere(session, dir,
          GraftPlanBridge.columnOf(cond.e),
          assignments.map { case (n, h) =>
            n -> GraftPlanBridge.columnOf(h.e) },
          // declared keys (graft.key) make the update
          // typed-feed-replayable
          keyCols = Layout.snapshotKeyCols(session, dir),
          // keyed updates persist pre-images by default; the
          // table-level graft.cdc.updateImages property (when set)
          // overrides either way
          preImages = Layout.snapshotCdcUpdateImages(session, dir)
            .getOrElse(true))
    }
    Seq(Row(v))
  }
}
