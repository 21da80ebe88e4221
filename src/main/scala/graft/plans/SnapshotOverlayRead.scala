package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.ops.Layout
import graft.sources.GraftSnapshotTable

/** Lifts the DSv2 catalog's two read refusals for SQL consumers: a
  * snapshot version carrying a live merge-on-read delete overlay, or
  * data files predating a column rename, cannot be served by the
  * catalog's delegated plain-file scan ([[Layout.snapshotScanInputs]]
  * refuses — a bare scan would resurrect deleted rows / mis-resolve
  * renamed columns). Without extensions that refusal stands, honestly.
  * With [[graft.GraftExtensions]], this resolution rule swaps every
  * READ-position relation over such a version for the analyzed plan of
  * [[Layout.snapshotRead]] — the overlay-aware read that anti-joins the
  * delete key files (broadcast: key files are small by construction)
  * and resolves each file generation's on-disk names through the
  * field-ID rename log. So `SELECT … FROM cat.db.t` keeps answering,
  * correctly, while a takedown is in flight — the exact window where
  * incremental consumers must not stall (the round-9 lesson:
  * capabilities that refuse during deletes break consumers precisely
  * when deletes matter). Versions a plain scan CAN serve are left
  * untouched: same relation, same stock vectorized parquet path, same
  * plan shape as before this rule existed.
  *
  * WRITE-position relations are exempt, collected by identity up
  * front: the target under `INSERT INTO` (and its resolved
  * [[AppendData]]/[[OverwriteByExpression]] forms), `MERGE INTO`,
  * `UPDATE`, and `DELETE FROM` must stay a relation — the DML rules
  * ([[SnapshotMergeRule]], [[SnapshotUpdateRule]], Spark's own
  * `SupportsDelete` path) pattern-match it to route the write, and the
  * file-granular rewrite commits keep their own live-overlay refusals
  * (compaction is the remedy) — rewriting rows that a pending overlay
  * already deleted would resurrect them into the new generation.
  *
  * The swapped-in plan keeps the relation's output `exprId`s (alias
  * projection), so parent operators' references bind unchanged — the
  * standard relation-substitution contract. Time travel is respected:
  * the table instance pins its version, and `snapshotRead` reads
  * exactly that version's manifest.
  */
case class SnapshotOverlayReadRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // write-target relations, by identity (a name/dir match would also
    // exempt the same table in READ position — `INSERT INTO t SELECT
    // … FROM t` reads overlay-applied and writes through the commit)
    val targets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(sub: LogicalPlan): Unit = sub.foreach {
      case r: DataSourceV2Relation => targets.add(r); (): Unit
      case _ =>
    }
    plan.foreach {
      case i: InsertIntoStatement => mark(i.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case u: UpdateTable => mark(u.table)
      case d: DeleteFromTable => mark(d.table)
      case a: AppendData => mark(a.table)
      case o: OverwriteByExpression => mark(o.table)
      case o: OverwritePartitionsDynamic => mark(o.table)
      case _ =>
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if !targets.contains(r) =>
        r.table match {
          case t: GraftSnapshotTable if t.needsOverlayRead => rewrite(r, t)
          case _ => r
        }
    }
  }

  /** Also the seam [[SnapshotMergeCommand]] uses directly: its captured
    * plan fragments hold target relations the resolution pass exempted
    * (they were the MERGE's write target there), but the fragments
    * execute them as READS — under a live overlay the delegated scan
    * would refuse, so the command swaps in this rewrite per relation. */
  private[plans] def rewriteRelation(r: DataSourceV2Relation,
      t: GraftSnapshotTable): LogicalPlan = rewrite(r, t)

  private def rewrite(r: DataSourceV2Relation,
      t: GraftSnapshotTable): LogicalPlan = {
    // a branch-qualified relation (`t@audit`) swaps in the branch's
    // overlay-aware read — the audit query keeps answering while the
    // branch carries the base table's live takedown
    val read = (t.snapBranch match {
      case Some(b) => Layout.snapshotBranchRead(session, t.snapDir, b)
      case None    => Layout.snapshotRead(session, t.snapDir, t.snapVersion)
    }).queryExecution.analyzed
    val byName = read.output
      .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
    // re-key the overlay read's output to the replaced relation's
    // exprIds (and its metadata — graft.key flags ride attribute
    // metadata) so every parent reference binds unchanged
    val aligned = r.output.map { o =>
      val src = byName.getOrElse(o.name.toLowerCase(java.util.Locale.ROOT),
        sys.error(s"snapshot overlay read of ${t.name()}: column " +
          s"'${o.name}' missing from snapshotRead's schema — schema of " +
          "record drifted between resolution and rewrite"))
      Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier,
        explicitMetadata = Some(o.metadata))
    }
    Project(aligned, read)
  }
}
