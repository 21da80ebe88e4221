package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.ops.Layout
import graft.sources.GraftSnapshotTable

/** SQL `MERGE INTO` for snapshot tables — the last door of the
  * catalog's SQL write surface (`INSERT`/`DELETE`/`UPDATE`/`ALTER`
  * land elsewhere; the reference's entire write path is SQL text,
  * topic_consumer.py:196-209, with MERGE-shaped upsert semantics at
  * stop_consumer.py:76-78).
  *
  * Spark parses `MERGE INTO` natively into [[MergeIntoTable]]; the
  * built-in rewrite ([[org.apache.spark.sql.catalyst.analysis.RewriteMergeIntoTable]])
  * only serves tables implementing `SupportsRowLevelOperations`, which
  * would demand a full DSv2 group-based write stack. Instead
  * [[SnapshotMergeRule]] (injectResolutionRule — the same interception
  * point Delta's `DeltaAnalysis` uses) converts the resolved node into a
  * [[SnapshotMergeCommand]] routed through
  * [[Layout.snapshotMergeInto]] — the SAME file-granular copy-on-write
  * commit the Scala API and [[graft.streaming.SnapshotSink]] use, so
  * stats-pruned probes, optimistic concurrency, CDC records for the
  * typed change feed, and manifest carry-forward behave identically
  * regardless of which door wrote.
  *
  * Supported surface:
  *
  *  - `ON` must be a conjunction of `target.key = <source expr>`
  *    equalities — the key-merge contract (range/expression matches
  *    have no key set to commit file-granularly against).
  *  - `WHEN MATCHED [AND c] THEN UPDATE SET * | SET col = expr, …`:
  *    conditions AND assigned values may read BOTH sides (`AND s.seq >
  *    t.seq` — the canonical last-writer-wins CDC guard — or `SET v =
  *    t.v + s.dv`), and a PARTIAL `SET` keeps the target's values for
  *    unassigned columns: the matched branch plans as an inner join of
  *    the table with the source on the merge keys, Catalyst-pruned to
  *    the referenced columns. Multiple matched actions compose with
  *    SQL first-match-wins.
  *  - `WHEN MATCHED [AND c] THEN DELETE` — `c` may read both sides.
  *  - `WHEN NOT MATCHED [AND c] THEN INSERT *| (cols…) VALUES (…)` —
  *    source-only by SQL's own rule (there IS no target row);
  *    unassigned columns null-fill, standard SQL.
  *  - `WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE` — the "full
  *    outer sync" shape; `c` may read the target (source-only refs are
  *    meaningless there and refuse).
  *
  * Execution strategy: the canonical symmetric upsert — `UPDATE SET *`
  * plus matching `INSERT *` with source-only, semantically-equal
  * guards — compiles to a single upsert frame handed straight to
  * `snapshotMergeInto` with NO read of the target before the merge's
  * own stats-pruned probe. Every other shape determines matched-ness
  * with real joins against the table (read through the catalog's
  * delegated scan at statement start — snapshot isolation; the commit
  * itself still retries optimistically), so a DELETE branch can never
  * collide with an INSERT branch on the same key: matched and
  * unmatched sets are disjoint by construction. Null merge keys refuse
  * (the key-merge contract), and a source with duplicate keys refuses
  * exactly as ANSI MERGE's "cannot update the same row twice" does.
  */
object SnapshotMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved && targetOf(m.targetTable).isDefined =>
        translate(m, targetOf(m.targetTable).get)
    }

  /** Unwraps alias layers to the snapshot table a DML statement
    * targets, `None` when the relation is not ours (shared with
    * [[SnapshotUpdateRule]]). */
  private[plans] def snapshotTargetOf(
      p: LogicalPlan): Option[GraftSnapshotTable] = targetOf(p)

  private def targetOf(p: LogicalPlan): Option[GraftSnapshotTable] = p match {
    case SubqueryAlias(_, child) => targetOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSnapshotTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO snapshot table: $msg")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def translate(m: MergeIntoTable,
      tbl: GraftSnapshotTable): LogicalPlan = {
    if (tbl.snapVersion > 0)
      refuse("cannot MERGE INTO a time-travel (VERSION/TIMESTAMP AS OF) snapshot")
    if (m.withSchemaEvolution)
      refuse("WITH SCHEMA EVOLUTION is not supported — ALTER TABLE ADD " +
        "COLUMNS first (Layout.snapshotEvolve)")
    val target = m.targetTable
    val source = m.sourceTable
    val srcOut = source.outputSet
    val tgtAttrs = target.output
    val tgtOut = target.outputSet
    val bothOut = tgtOut ++ srcOut

    def castTo(e: Expression, a: Attribute): Expression =
      if (e.dataType == a.dataType) e else Cast(e, a.dataType)

    // ---- ON clause → ordered key pairs (target attr, source expr) ----
    val keyPairs: Seq[(Attribute, Expression)] =
      conjuncts(m.mergeCondition).map {
        case EqualTo(a: AttributeReference, b)
            if tgtOut.contains(a) && b.references.subsetOf(srcOut) => a -> b
        case EqualTo(b, a: AttributeReference)
            if tgtOut.contains(a) && b.references.subsetOf(srcOut) => a -> b
        case other => refuse(s"ON conjunct `${other.sql}` is not " +
          "`target.key = <source expression>` — the snapshot MERGE is " +
          "key-granular (Layout.snapshotMergeInto's contract)")
      }.groupBy(_._1.exprId).map(_._2.head).toSeq
    if (keyPairs.isEmpty) refuse("ON clause names no key equality")
    val keyCols = keyPairs.map(_._1.name)
    val keyAliases: Seq[NamedExpression] =
      keyPairs.map { case (a, e) => Alias(castTo(e, a), a.name)() }

    // matched-ness scopes: matched branches read both sides (planned
    // over the inner key-join), not-matched reads the source alone,
    // not-matched-by-source reads the target alone
    val joined = Join(target, source, Inner,
      Some(m.mergeCondition), JoinHint.NONE)
    val srcAnti = Join(source, target, LeftAnti,
      Some(m.mergeCondition), JoinHint.NONE)
    val tgtAnti = Join(target, source, LeftAnti,
      Some(m.mergeCondition), JoinHint.NONE)

    def scoped(e: Expression, scope: AttributeSet, what: String,
        why: String): Expression = {
      if (!e.references.subsetOf(scope))
        refuse(s"$what `${e.sql}` references columns outside its " +
          s"scope — $why")
      e
    }

    /** Full replacement row: assigned columns from the action, the rest
      * defaulting per branch (matched: the target's current value —
      * partial UPDATE; not-matched: NULL — partial INSERT). */
    def rowExprs(assignments: Seq[Assignment], what: String,
        scope: AttributeSet, why: String,
        defaultOf: Attribute => Expression): Seq[NamedExpression] = {
      val byTarget: Map[ExprId, Expression] = assignments.map { asg =>
        asg.key match {
          case ar: AttributeReference if tgtOut.contains(ar) =>
            ar.exprId -> scoped(asg.value, scope, s"$what assignment", why)
          case other => refuse(s"$what assigns `${other.sql}` — only " +
            "whole top-level target columns can be assigned")
        }
      }.toMap
      tgtAttrs.map { ta =>
        val v = byTarget.getOrElse(ta.exprId, defaultOf(ta))
        Alias(castTo(v, ta), ta.name)()
      }
    }
    // star actions surviving resolution (UPDATE SET * / INSERT *)
    // expand by case-insensitive name, the SQL star contract
    def starExprs(what: String): Seq[NamedExpression] = tgtAttrs.map { ta =>
      source.output.filter(_.name.equalsIgnoreCase(ta.name)) match {
        case Seq(s) => Alias(castTo(s, ta), ta.name)()
        case Seq() => refuse(s"$what *: source has no column `${ta.name}`")
        case _ => refuse(s"$what *: source column `${ta.name}` is ambiguous")
      }
    }

    // ---- first-match-wins eligibility per action list ----
    def eligibles(actions: Seq[MergeAction], what: String,
        scope: AttributeSet, why: String)
        : Seq[(MergeAction, Expression)] = {
      var priorNots: Seq[Expression] = Nil
      actions.map { a =>
        val c = a.condition
          .map(c => Coalesce(Seq(scoped(c, scope, s"$what condition", why),
            Literal(false))))
          .getOrElse(Literal(true))
        val elig = (c +: priorNots).reduce(And)
        priorNots = priorNots :+ Not(c)
        (a, elig)
      }
    }
    def over(base: LogicalPlan, elig: Expression): LogicalPlan =
      elig match {
        case Literal(true, _) => base
        case e => Filter(e, base)
      }

    val matchedWhy = "WHEN MATCHED may read the target and the source"
    val insertWhy = "WHEN NOT MATCHED has no target row — source only"
    val bySourceWhy = "WHEN NOT MATCHED BY SOURCE has no source row — " +
      "target only"

    // matched branches plan over the inner key-join; each action's
    // conditions and values may read both sides
    var updFrags = Seq.empty[(LogicalPlan, Expression, Seq[NamedExpression])]
    var delFrags = Seq.empty[LogicalPlan]
    eligibles(m.matchedActions, "WHEN MATCHED", bothOut, matchedWhy)
      .foreach {
        case (UpdateAction(_, assignments, _), elig) =>
          val exprs = rowExprs(assignments, "UPDATE", bothOut, matchedWhy,
            ta => ta) // unassigned columns keep the target's value
          updFrags :+= ((Project(exprs, over(joined, elig)), elig, exprs))
        case (_: UpdateStarAction, elig) =>
          val exprs = starExprs("UPDATE SET")
          updFrags :+= ((Project(exprs, over(joined, elig)), elig, exprs))
        case (DeleteAction(_), elig) =>
          delFrags :+= Project(keyAliases, over(joined, elig))
        case (a, _) => refuse(s"unsupported WHEN MATCHED action $a")
      }
    // not-matched branches plan over the source anti-join (no target row)
    var insFrags = Seq.empty[(LogicalPlan, Expression, Seq[NamedExpression])]
    eligibles(m.notMatchedActions, "WHEN NOT MATCHED", srcOut, insertWhy)
      .foreach {
        case (InsertAction(_, assignments), elig) =>
          val exprs = rowExprs(assignments, "INSERT", srcOut, insertWhy,
            ta => Literal(null, ta.dataType)) // unassigned null-fill
          insFrags :+= ((Project(exprs, over(srcAnti, elig)), elig, exprs))
        case (_: InsertStarAction, elig) =>
          val exprs = starExprs("INSERT")
          insFrags :+= ((Project(exprs, over(srcAnti, elig)), elig, exprs))
        case (a, _) => refuse(s"unsupported WHEN NOT MATCHED action $a")
      }
    // not-matched-by-source: target rows no source row matched — the
    // delete keys are the target's own key columns
    val tgtKeyAliases: Seq[NamedExpression] =
      keyPairs.map { case (a, _) => Alias(a, a.name)() }
    val bySourceDels: Seq[LogicalPlan] =
      eligibles(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE",
        tgtOut, bySourceWhy).map {
        case (DeleteAction(_), elig) =>
          Project(tgtKeyAliases, over(tgtAnti, elig))
        case (a, _) => refuse("WHEN NOT MATCHED BY SOURCE supports only " +
          s"DELETE (an UPDATE there is the Scala API's job), got $a")
      }

    // fast path: symmetric source-only UPDATE/INSERT branches collapse
    // to one upsert frame — no read of the target before the merge's
    // own stats-pruned probe
    val upsertAll: Option[LogicalPlan] = (updFrags, insFrags) match {
      case (Seq((_, ue, uex)), Seq((_, ie, iex)))
          if ue.references.subsetOf(srcOut) &&
            uex.forall(_.references.subsetOf(srcOut)) &&
            ue.semanticEquals(ie) &&
            uex.zip(iex).forall { case (a, b) => a.semanticEquals(b) } &&
            bySourceDels.isEmpty =>
        Some(Project(uex, over(source, ue)))
      case _ => None
    }

    val updatePlans =
      if (upsertAll.isDefined) Nil
      else updFrags.map(_._1) ++ insFrags.map(_._1)
    SnapshotMergeCommand(tbl.snapDir, keyCols, upsertAll, updatePlans,
      delFrags ++ bySourceDels, tbl.snapBranch)
  }
}

/** The executed half of the SQL MERGE door: resolves the pre-translated
  * plan fragments (joins already encode matched-ness) to `DataFrame`s
  * and lands everything in ONE [[Layout.snapshotMergeInto]] commit.
  * Returns the committed snapshot version as a single row.
  *
  * Statement-start snapshot isolation is made CRISP by pinning: the
  * merge's several actions (the commit's analysis pass, probe, rewrite
  * union, cdc writes) each re-execute the update frames, and an
  * unpinned target relation would re-resolve "latest version" at every
  * execution — a concurrent commit mid-statement could then feed
  * DIFFERENT table snapshots to different actions. Before anything
  * runs, every embedded target relation is rewritten to the version
  * current at statement start; the commit itself still lands against
  * the true latest with the optimistic retry. */
case class SnapshotMergeCommand(
    dir: String,
    keyCols: Seq[String],
    upsertAll: Option[LogicalPlan],
    updatePlans: Seq[LogicalPlan],
    deletePlans: Seq[LogicalPlan],
    branch: Option[String] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    lazy val v0: Long = Layout.snapshotLatestVersion(session, dir)
      .getOrElse(sys.error(s"no committed snapshot at $dir"))
    // branch-qualified relations are NOT pinned: a branch read always
    // serves its tip (time travel on branches refuses at loadTable),
    // and the branch route below materializes the update frame before
    // its own staged commits move that tip
    def pin(p: LogicalPlan): LogicalPlan = p.transformDownWithSubqueries {
      case r: DataSourceV2Relation =>
        r.table match {
          // pin only the TARGET table's own relations: v0 is the
          // target dir's latest version, and a DIFFERENT graft table
          // read as the merge SOURCE must keep resolving its own
          // latest (pinning it to the target's version number would
          // read an arbitrary historical snapshot, or a manifest that
          // does not exist)
          case t: GraftSnapshotTable
              if t.snapVersion <= 0 && t.snapBranch.isEmpty &&
                t.snapDir == dir =>
            r.copy(table = new GraftSnapshotTable(t.name(), t.snapDir, v0))
          // a branch-qualified TARGET relation: the resolution pass
          // exempted it as the statement's WRITE target, but in these
          // captured fragments it executes as a READ — ALWAYS swap in
          // the overlay-aware plan. Unconditionally, not probe-gated:
          // the delegated DSv2 scan resolves the branch tip when the
          // scan is BUILT, so a racer's takedown landing between a
          // probe and the build would refuse mid-statement (TOCTOU —
          // raced out in SnapshotMergeSqlSpec); the overlay-aware read
          // also captures its file list at construction, so every
          // validation of one attempt judges one consistent tip
          case t: GraftSnapshotTable
              if t.snapBranch.isDefined && t.snapDir == dir =>
            SnapshotOverlayReadRule(session).rewriteRelation(r, t)
          case _ => r
        }
    }
    def ofRows(p: LogicalPlan): DataFrame =
      GraftPlanBridge.ofRows(session, pin(p))
    // frames are built by FUNCTION so the tip-derived branch retry
    // below can REBUILD them against the new tip (the overlay-aware
    // target reads capture their file list at construction)
    def buildUpdates(): DataFrame = upsertAll match {
      case Some(p) => ofRows(p)
      case None if updatePlans.isEmpty =>
        // delete-only statement: an empty frame with the table schema
        Layout.snapshotRead(session, dir).limit(0)
      case None => updatePlans.map(ofRows).reduce(_ unionByName _)
    }
    def buildDeletes(): Option[DataFrame] =
      deletePlans.map(ofRows).reduceOption(_ unionByName _)
    val v = branch match {
      // MERGE INTO cat.`t@branch`: the audited CDC upsert of
      // write-audit-publish — staged as ONE takedown of the present
      // keys + ONE append of the replacement rows in the branch
      // namespace (Layout.snapshotBranchMerge), invisible to main
      // until CALL system.fast_forward
      case Some(b) =>
        // does any plan READ this table (matched branches with
        // target-referencing guards or assignments, NOT MATCHED BY
        // SOURCE deletes)? Then the statement's values derive from
        // the branch tip, and the merge's internal bounce-and-restage
        // would silently commit a STALE frame over a racer's commit —
        // the lost update (review r15). Pin the tip version instead:
        // on a bounce, re-resolve and re-call, so the unpinned branch
        // relations re-read the NEW tip and the values recompute —
        // the same first-committer-wins loop as the UPDATE door. A
        // source-only statement (the symmetric-upsert fast path)
        // keeps the merge's cheaper internal retry.
        // descends into SubqueryExpression plans too: `USING (… WHERE
        // k IN (SELECT … FROM t@branch))` reads the target only inside
        // an expression, and missing it would take the silent
        // internal-restage path for tip-derived values (review r15)
        def readsTarget(p: LogicalPlan): Boolean = p.exists {
          case r: DataSourceV2Relation => r.table match {
            case t: GraftSnapshotTable => t.snapDir == dir
            case _ => false
          }
          case n => n.expressions.exists(_.exists {
            case sq: SubqueryExpression => readsTarget(sq.plan)
            case _ => false
          })
        }
        val tipDerived = (upsertAll.toSeq ++ updatePlans ++ deletePlans)
          .exists(readsTarget)
        if (!tipDerived)
          Layout.snapshotBranchMerge(session, dir, b, buildUpdates(),
            keyCols, deletes = buildDeletes())
        else {
          var tries = 0
          var out = -1L
          var done = false
          while (!done) {
            tries += 1
            try {
              val tipV = Layout.snapshotBranchTipVersion(session, dir, b)
              // rebuilt per attempt: the target reads resolve the tip
              // at construction, so a bounced attempt's values
              // RECOMPUTE from the racer's committed state
              out = Layout.snapshotBranchMerge(session, dir, b,
                buildUpdates(), keyCols, deletes = buildDeletes(),
                expectedTip = Some(tipV))
              done = true
            } catch {
              case tm: Layout.BranchTipMoved =>
                require(tries < 12,
                  s"MERGE INTO branch '$b' at $dir: the branch tip " +
                    s"moved under 12 consecutive attempts " +
                    s"(${tm.getMessage}) — heavy same-branch write " +
                    "contention; re-run the statement")
            }
          }
          out
        }
      // the table-level graft.cdc.updateImages property turns on
      // pre-image persistence for a SQL-only CDC producer (the Scala
      // API's snapshotMergeInto(preImages = true) opt-in, declared once
      // in DDL); unset keeps the merge door's legacy default (off — the
      // merge pre-image record costs an extra touched-file scan)
      case None =>
        Layout.snapshotMergeInto(session, dir, buildUpdates(), keyCols,
          deletes = buildDeletes(),
          preImages = Layout.snapshotCdcUpdateImages(session, dir)
            .getOrElse(false))
    }
    Seq(Row(v))
  }
}
