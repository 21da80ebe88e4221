package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

import graft.ops.Layout
import graft.sources.GraftSnapshotTable

/** SQL `MERGE INTO` for snapshot tables — the last missing door of the
  * catalog's SQL write surface (`INSERT`/`DELETE`/`ALTER` landed with
  * [[graft.sources.GraftCatalog]]; the reference's entire write path is
  * SQL text, topic_consumer.py:196-209, with MERGE-shaped upsert
  * semantics at stop_consumer.py:76-78).
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
  * Supported surface (everything else refuses at ANALYSIS time with a
  * message naming the Scala API):
  *
  *  - `ON` must be a conjunction of `target.key = <source expr>`
  *    equalities — the key-merge contract (range/expression matches
  *    have no key set to commit file-granularly against).
  *  - `WHEN MATCHED [AND c] THEN UPDATE SET * | SET col = expr, …`
  *    where every target column is assigned and `c` / the assigned
  *    expressions reference ONLY source columns (a condition on the
  *    existing row would need the row-level read-modify-write path).
  *    Multiple matched actions compose with SQL first-match-wins.
  *  - `WHEN MATCHED [AND c] THEN DELETE`
  *  - `WHEN NOT MATCHED [AND c] THEN INSERT *| (cols…) VALUES (…)` —
  *    unassigned columns null-fill, standard SQL.
  *  - `WHEN NOT MATCHED BY SOURCE THEN DELETE` (unconditioned) — the
  *    "full outer sync" shape: target keys absent from the source are
  *    tombstoned via an anti-join of key projections.
  *
  * Execution strategy: the canonical CDC shape — one unconditioned (or
  * symmetrically-guarded) `UPDATE SET *` plus matching `INSERT *` —
  * compiles to a single upsert frame handed straight to
  * `snapshotMergeInto` (NO read of the target before the probe; the
  * merge's own stats-pruned probe is the only table I/O). Asymmetric
  * shapes (update-only, insert-only, differently-guarded branches)
  * determine matched-ness with one key-column scan of the target
  * (column-pruned, manifest-planned) feeding a semi/anti join, taken at
  * statement start — snapshot-isolation semantics; the commit itself
  * still retries optimistically. Null merge keys refuse (the key-merge
  * contract), and a source with duplicate keys refuses exactly as ANSI
  * MERGE's "cannot update the same row twice" does.
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
    val source = m.sourceTable
    val srcOut = source.outputSet
    val tgtAttrs = m.targetTable.output
    val tgtOut = m.targetTable.outputSet

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

    // ---- assignments → a full replacement row over the source ----
    def sourceOnly(e: Expression, what: String): Expression = {
      if (!e.references.subsetOf(srcOut))
        refuse(s"$what `${e.sql}` references target columns — conditions " +
          "and assigned values may read only the source (a read-modify-" +
          "write against the existing row is the Scala API's job)")
      e
    }
    def rowExprs(assignments: Seq[Assignment], what: String,
        fillNulls: Boolean): Seq[NamedExpression] = {
      val byTarget: Map[ExprId, Expression] = assignments.map { asg =>
        asg.key match {
          case ar: AttributeReference if tgtOut.contains(ar) =>
            ar.exprId -> sourceOnly(asg.value, s"$what assignment")
          case other => refuse(s"$what assigns `${other.sql}` — only " +
            "whole top-level target columns can be assigned")
        }
      }.toMap
      tgtAttrs.map { ta =>
        byTarget.get(ta.exprId) match {
          case Some(v) => Alias(castTo(v, ta), ta.name)()
          case None if fillNulls =>
            Alias(Literal(null, ta.dataType), ta.name)()
          case None => refuse(s"$what leaves target column `${ta.name}` " +
            "unassigned — a partial UPDATE needs the existing row; " +
            "use UPDATE SET * or Layout.snapshotMergeInto")
        }
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
    def eligibles(actions: Seq[MergeAction], what: String)
        : Seq[(MergeAction, Expression)] = {
      var priorNots: Seq[Expression] = Nil
      actions.map { a =>
        val c = a.condition
          .map(c => Coalesce(Seq(sourceOnly(c, s"$what condition"),
            Literal(false))))
          .getOrElse(Literal(true))
        val elig = (c +: priorNots).reduce(And)
        priorNots = priorNots :+ Not(c)
        (a, elig)
      }
    }
    def filtered(elig: Expression): LogicalPlan = elig match {
      case Literal(true, _) => source
      case e => Filter(e, source)
    }

    var updFrags = Seq.empty[(LogicalPlan, Expression, Seq[NamedExpression])]
    var delFrags = Seq.empty[LogicalPlan]
    eligibles(m.matchedActions, "WHEN MATCHED").foreach {
      case (UpdateAction(_, assignments, _), elig) =>
        val exprs = rowExprs(assignments, "UPDATE", fillNulls = false)
        updFrags :+= ((Project(exprs, filtered(elig)), elig, exprs))
      case (_: UpdateStarAction, elig) =>
        val exprs = starExprs("UPDATE SET")
        updFrags :+= ((Project(exprs, filtered(elig)), elig, exprs))
      case (DeleteAction(_), elig) =>
        delFrags :+= Project(keyAliases, filtered(elig))
      case (a, _) => refuse(s"unsupported WHEN MATCHED action $a")
    }
    var insFrags = Seq.empty[(LogicalPlan, Expression, Seq[NamedExpression])]
    eligibles(m.notMatchedActions, "WHEN NOT MATCHED").foreach {
      case (InsertAction(_, assignments), elig) =>
        val exprs = rowExprs(assignments, "INSERT", fillNulls = true)
        insFrags :+= ((Project(exprs, filtered(elig)), elig, exprs))
      case (_: InsertStarAction, elig) =>
        val exprs = starExprs("INSERT")
        insFrags :+= ((Project(exprs, filtered(elig)), elig, exprs))
      case (a, _) => refuse(s"unsupported WHEN NOT MATCHED action $a")
    }
    val bySourceDelete = m.notMatchedBySourceActions match {
      case Seq() => false
      case Seq(DeleteAction(None)) => true
      case _ => refuse("WHEN NOT MATCHED BY SOURCE supports only an " +
        "unconditioned DELETE — a condition there reads the existing " +
        "row (Scala API)")
    }

    // fast path: symmetric UPDATE/INSERT branches collapse to one
    // upsert frame — no target read before the merge's own probe
    val upsertAll: Option[LogicalPlan] = (updFrags, insFrags) match {
      case (Seq((_, ue, uex)), Seq((_, ie, iex)))
          if ue.semanticEquals(ie) &&
            uex.zip(iex).forall { case (a, b) => a.semanticEquals(b) } =>
        Some(Project(uex, filtered(ue)))
      case _ => None
    }

    SnapshotMergeCommand(tbl.snapDir, keyCols,
      upsertAll,
      if (upsertAll.isDefined) Nil else updFrags.map(_._1),
      if (upsertAll.isDefined) Nil else insFrags.map(_._1),
      delFrags,
      if (bySourceDelete) Some(Project(keyAliases, source)) else None)
  }
}

/** The executed half of the SQL MERGE door: resolves the pre-translated
  * plan fragments to `DataFrame`s, determines matched-ness (only when
  * the branch shapes force it) with one key-column scan of the target,
  * and lands everything in ONE [[Layout.snapshotMergeInto]] commit.
  * Returns the committed snapshot version as a single row. */
case class SnapshotMergeCommand(
    dir: String,
    keyCols: Seq[String],
    upsertAll: Option[LogicalPlan],
    matchedUpdates: Seq[LogicalPlan],
    inserts: Seq[LogicalPlan],
    deletes: Seq[LogicalPlan],
    bySourceKeys: Option[LogicalPlan]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    def ofRows(p: LogicalPlan): DataFrame =
      GraftPlanBridge.ofRows(session, p)
    val gk = keyCols.map("__gk_" + _)

    // matched-ness at statement start (snapshot isolation): ONE
    // column-pruned, manifest-planned key scan of the target, shared by
    // every branch that needs it — and skipped entirely on the upsert
    // fast path and on delete-only statements (an unmatched tombstone
    // no-ops inside the merge; no branch can resurrect it as an insert)
    var existingMemo: Option[DataFrame] = None
    def existing: DataFrame = existingMemo.getOrElse {
      val e = Layout.snapshotRead(session, dir)
        .select(keyCols.map(col): _*).distinct()
        .toDF(gk: _*).cache()
      existingMemo = Some(e); e
    }
    def keyed(df: DataFrame, how: String): DataFrame =
      df.join(existing,
        keyCols.zip(gk).map { case (k, g) => df(k) === existing(g) }
          .reduce(_ && _), how)

    val updates: DataFrame = upsertAll match {
      case Some(p) => ofRows(p)
      case None if matchedUpdates.isEmpty && inserts.isEmpty =>
        // delete-only statement: an empty frame with the table schema
        Layout.snapshotRead(session, dir).limit(0)
      case None =>
        (matchedUpdates.map(p => keyed(ofRows(p), "left_semi")) ++
          inserts.map(p => keyed(ofRows(p), "left_anti")))
          .reduce(_ unionByName _)
    }

    // DELETE is a WHEN MATCHED action: when an asymmetric INSERT branch
    // exists, an unmatched delete-eligible key may ALSO be
    // insert-eligible, so the tombstone set must be restricted to
    // matched keys (else the commit would refuse the key as
    // both-updated-and-deleted — a collision SQL semantics says cannot
    // happen). On the fast path the branch-equality condition already
    // proves a delete-eligible row can never be insert-eligible.
    val needDelSemi = inserts.nonEmpty
    val delKeyFrames = deletes.map { p =>
      val df = ofRows(p)
      if (needDelSemi) keyed(df, "left_semi") else df
    } ++ bySourceKeys.map { p =>
      val srcKeys = ofRows(p).distinct().toDF(gk: _*)
      val tgtKeys = Layout.snapshotRead(session, dir)
        .select(keyCols.map(col): _*)
      tgtKeys.join(srcKeys,
        keyCols.zip(gk).map { case (k, g) => tgtKeys(k) === srcKeys(g) }
          .reduce(_ && _), "left_anti")
    }
    val delOpt = delKeyFrames.reduceOption(_ unionByName _)

    try {
      val v = Layout.snapshotMergeInto(session, dir, updates, keyCols,
        deletes = delOpt)
      Seq(Row(v))
    } finally existingMemo.foreach(_.unpersist())
  }
}
