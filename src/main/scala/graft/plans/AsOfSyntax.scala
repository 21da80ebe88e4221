package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
// Spark 4 ships its own `logical.AsOfJoin` node (Pandas-API plumbing,
// no SQL/Dataset surface) — the explicit import wins over the wildcard
// so `AsOfJoin` below is graft's operator, not Spark's internal node
import graft.plans.AsOfJoin
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** DuckDB-parity `ASOF JOIN` SYNTAX for the native as-of operator — the
  * second half of the SQL front door (the `asof_join` TVF is the first):
  *
  * {{{
  *   SELECT c.*, p.ts, p.purchase_id
  *   FROM clicks c ASOF LEFT JOIN purchases p
  *     ON c.user_id = p.user_id AND c.ts >= p.ts
  * }}}
  *
  * Spark's grammar is closed (ANTLR, no extension point), so the door is
  * the standard two-stage parser-wrapper pattern:
  *
  *  1. [[GraftSqlParser]] (installed by `SparkSessionExtensions
  *     .injectParser`) token-scans the SQL text — string/comment/
  *     backtick-aware, paren-depth-tracked — deletes the `ASOF` keyword
  *     and prefixes that join's `ON` condition with a
  *     `graft_asof_marker()` conjunct, then hands the now-grammatical
  *     text to Spark's own parser and substitutes the parsed
  *     `UnresolvedFunction` with the internal [[AsOfMarker]] leaf. The
  *     join stays a plain [[Join]], so ALL standard analysis applies to
  *     it: alias resolution, CTE inlining, self-join deduplication.
  *  2. [[AsOfSyntaxRule]] (injectResolutionRule) waits until the marked
  *     join's children and condition are resolved, then converts it to
  *     the attribute-based [[AsOfJoinPlan]]: equality conjuncts become
  *     the equi-keys, the single inclusive inequality picks the time
  *     axis and direction (`l >= r` → backward, `l <= r` → forward).
  *
  * Output parity with DuckDB: unlike the Scala API's USING-style
  * contract (right key/time dropped), ASOF syntax keeps EVERY right
  * column — `p.ts` above is the matched build-side time, NULL on no
  * match. The rule restores the original right attributes (same exprIds,
  * names, qualifiers) with a projection over payload copies, so parent
  * operators that already resolved against the join's output stay bound.
  * `ASOF JOIN` (inner) filters unmatched rows on the matched-time copy;
  * `ASOF LEFT JOIN` passes them through with NULLs.
  *
  * Supported shape (DuckDB's own): conjunction of zero-or-more plain
  * column equalities plus EXACTLY ONE inclusive inequality (`>=`/`<=`)
  * between the two sides' time columns. Keyless as-of (no equalities) is
  * accepted — both sides get a synthetic constant key. A `/*+
  * BROADCAST(build) */` hint on the right side maps to the operator's
  * broadcast-probe exec. Anything else — `OR` around the marker, strict
  * `<`/`>`, expression keys, `USING`, `ASOF RIGHT/FULL/…` — raises a
  * targeted error, NEVER a silent plain-join fallback.
  *
  * Known (documented) limit shared with DuckDB: a bare table alias
  * literally named `asof` immediately before `JOIN` is read as the
  * keyword — write `AS asof` (the rewriter skips `AS asof`).
  */
object AsOfSyntax

/** Internal marker conjunct [[GraftSqlParser]] plants in a rewritten
  * ASOF join's ON condition; [[AsOfSyntaxRule]] removes every one during
  * analysis (or raises). Evaluates to TRUE as a defensive identity — it
  * must never survive to execution. */
case class AsOfMarker() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override def sql: String = "graft_asof_marker()"
}

/** The `ASOF [LEFT] JOIN … ON` → `[LEFT] JOIN … ON graft_asof_marker()
  * AND …` text rewrite. Pure string→string, total: text with no `asof`
  * token is returned untouched (single lowercase scan, zero cost on the
  * non-ASOF fast path). */
private[plans] object AsOfSqlRewrite {

  /** word tokens carry uppercased text; punctuation is the single char */
  private case class Tok(word: String, start: Int, end: Int)

  /** String/comment/backtick-aware shallow lexer: yields only word and
    * punctuation tokens — literals, quoted identifiers, and comments
    * (including nested bracketed ones and hint blocks) are skipped so an
    * `ASOF JOIN` inside a string is never rewritten. */
  private def lex(sql: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0; val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        var depth = 1; i += 2
        while (i < n && depth > 0) {
          if (i + 1 < n && sql(i) == '/' && sql(i + 1) == '*') { depth += 1; i += 2 }
          else if (i + 1 < n && sql(i) == '*' && sql(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '\'' || c == '"') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql(i) == '\\' && i + 1 < n) i += 2
          else if (sql(i) == c && i + 1 < n && sql(i + 1) == c) i += 2
          else if (sql(i) == c) { i += 1; done = true }
          else i += 1
        }
      } else if (c == '`') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql(i) == '`' && i + 1 < n && sql(i + 1) == '`') i += 2
          else if (sql(i) == '`') { i += 1; done = true }
          else i += 1
        }
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        toks += Tok(sql.substring(s, i).toUpperCase(java.util.Locale.ROOT), s, i)
      } else {
        toks += Tok(c.toString, i, i + 1); i += 1
      }
    }
    toks.result()
  }

  /** Clause keywords that, at paren-depth 0, mean the scanned join never
    * had an ON condition. */
  private val Terminators = Set("WHERE", "GROUP", "ORDER", "HAVING",
    "LIMIT", "WINDOW", "UNION", "INTERSECT", "EXCEPT", "MINUS", "QUALIFY",
    "DISTRIBUTE", "CLUSTER", "SORT")

  def rewrite(sql: String): String = {
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("asof")) return sql
    val toks = lex(sql)
    // (start, end, replacement): ASOF deletions + marker insertions
    val edits = List.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val prevWord = if (i > 0) toks(i - 1).word else ""
      var advanced = false
      if (t.word == "ASOF" && prevWord != "AS") {
        var j = i + 1
        if (j < toks.length && (toks(j).word == "LEFT" || toks(j).word == "INNER")) {
          if (toks(j).word == "LEFT" && j + 1 < toks.length &&
              toks(j + 1).word == "OUTER") j += 1
          j += 1
        }
        if (j < toks.length &&
            Set("RIGHT", "FULL", "CROSS", "NATURAL", "SEMI", "ANTI")
              .contains(toks(j).word))
          throw new IllegalArgumentException(
            s"ASOF ${toks(j).word} JOIN is not supported — only ASOF [LEFT] JOIN")
        if (j < toks.length && toks(j).word == "JOIN") {
          edits += ((t.start, t.end, "")) // drop the ASOF keyword
          // this join's ON: scan at paren-depth 0, pairing intervening
          // nested joins (right-deep `a JOIN b ON x` chains, USING forms)
          // with their own criteria first
          var k = j + 1; var depth = 0; var pending = 0; var onEnd = -1
          while (k < toks.length && onEnd < 0) {
            val u = toks(k)
            u.word match {
              case "(" => depth += 1
              case ")" =>
                if (depth == 0) k = toks.length // left the enclosing scope
                else depth -= 1
              case "JOIN" if depth == 0 =>
                // CROSS/NATURAL joins never take ON/USING criteria
                val back = toks.slice(math.max(0, k - 3), k).map(_.word)
                if (!back.contains("CROSS") && !back.contains("NATURAL"))
                  pending += 1
              case "USING" if depth == 0 =>
                if (pending > 0) pending -= 1
                else throw new IllegalArgumentException(
                  "ASOF JOIN … USING is not supported — use ON with " +
                    "equi-keys and one time inequality (>= or <=)")
              case "ON" if depth == 0 =>
                if (pending > 0) pending -= 1 else onEnd = u.end
              case w if depth == 0 && (Terminators.contains(w) || w == ",") =>
                k = toks.length
              case _ =>
            }
            k += 1
          }
          if (onEnd < 0) throw new IllegalArgumentException(
            "ASOF JOIN requires an ON condition (equi-keys plus one " +
              "inclusive time inequality)")
          edits += ((onEnd, onEnd, " graft_asof_marker() AND "))
          i = j + 1; advanced = true
        }
      }
      if (!advanced) i += 1
    }
    edits.result().sortBy(-_._1).foldLeft(sql) { case (s, (a, b, txt)) =>
      s.substring(0, a) + txt + s.substring(b)
    }
  }
}

/** Delegating [[ParserInterface]] installed by
  * `SparkSessionExtensions.injectParser`: applies [[AsOfSqlRewrite]] to
  * every plan-level parse, then swaps the planted
  * `graft_asof_marker()` [[UnresolvedFunction]] for the internal
  * [[AsOfMarker]] leaf (no function-registry entry needed — the marker
  * never reaches resolution as a function). Expression/identifier/
  * data-type parses pass straight through. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def substituteMarker(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries { case p =>
      p.transformExpressions {
        case u: UnresolvedFunction
            if u.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
              Seq("graft_asof_marker") && u.arguments.isEmpty =>
          AsOfMarker()
      }
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    substituteMarker(delegate.parsePlan(AsOfSqlRewrite.rewrite(sqlText)))
  override def parseQuery(sqlText: String): LogicalPlan =
    substituteMarker(delegate.parseQuery(AsOfSqlRewrite.rewrite(sqlText)))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    substituteMarker(
      delegate.parsePlanWithParameters(AsOfSqlRewrite.rewrite(sqlText), ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Analysis rule (injectResolutionRule) converting a marker-carrying
  * [[Join]] into [[AsOfJoinPlan]] once both children and the condition
  * are resolved — AFTER standard resolution has done alias binding, CTE
  * inlining, and self-join deduplication on the ordinary join node. See
  * [[AsOfSyntax]] for the full contract. */
object AsOfSyntaxRule extends Rule[LogicalPlan] {

  private def isMarker(e: Expression): Boolean = e.isInstanceOf[AsOfMarker]

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case x => Seq(x)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ Join(_, _, _, Some(cond), _) if cond.exists(isMarker) =>
        if (!j.childrenResolved || !cond.resolved) j else convert(j)
    }

  private def convert(j: Join): LogicalPlan = {
    val cond = j.condition.get
    val conjuncts = split(cond)
    val (markers, rest) = conjuncts.partition(isMarker)
    if (markers.isEmpty || rest.exists(_.exists(isMarker)))
      fail("the ON condition must be a top-level AND of column " +
        "equalities plus exactly one inclusive time inequality — OR " +
        "around them is not an as-of condition")

    val leftSet = j.left.outputSet
    val rightSet = j.right.outputSet
    def sideOf(a: Attribute): Int =
      if (leftSet.contains(a)) 0 else if (rightSet.contains(a)) 1 else -1

    var eqs = Vector.empty[(Attribute, Attribute)] // (left, right)
    var ineqs = Vector.empty[(Attribute, Attribute, AsOfJoin.Direction)]
    rest.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sideOf(a) >= 0 && sideOf(b) >= 0 && sideOf(a) != sideOf(b) =>
        eqs :+= (if (sideOf(a) == 0) (a, b) else (b, a))
      case e @ EqualTo(_, _) =>
        fail(s"equality keys must be plain columns, one from each side, " +
          s"got: ${e.sql}")
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if sideOf(a) >= 0 && sideOf(b) >= 0 && sideOf(a) != sideOf(b) =>
        // l >= r: latest right at-or-before left (backward);
        // r >= l ⇔ l <= r: earliest right at-or-after left (forward)
        ineqs :+= (if (sideOf(a) == 0) (a, b, AsOfJoin.Backward)
                   else (b, a, AsOfJoin.Forward))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if sideOf(a) >= 0 && sideOf(b) >= 0 && sideOf(a) != sideOf(b) =>
        ineqs :+= (if (sideOf(a) == 0) (a, b, AsOfJoin.Forward)
                   else (b, a, AsOfJoin.Backward))
      case e @ (_: GreaterThan | _: LessThan) =>
        fail(s"strict inequalities are not supported — use >= or <= " +
          s"(got: ${e.sql})")
      case e =>
        fail(s"unsupported ON conjunct: ${e.sql} (want plain-column " +
          s"equalities and one >=/<= between the two time columns)")
    }
    if (ineqs.length != 1)
      fail(s"need exactly one inclusive time inequality, found " +
        s"${ineqs.length}")
    val (lTime, rTimeSrc, dir) = ineqs.head
    if (lTime.dataType != rTimeSrc.dataType)
      fail(s"time column types differ: ${lTime.dataType} vs " +
        s"${rTimeSrc.dataType}")
    eqs.foreach { case (l, r) =>
      if (l.dataType != r.dataType)
        fail(s"key column types differ: ${l.name} ${l.dataType} vs " +
          s"${r.name} ${r.dataType}")
    }

    // keyless as-of (DuckDB allows it): synthesize a constant key
    val keyless = eqs.isEmpty
    val (preparedLeft, lKeys) =
      if (!keyless) (j.left, eqs.map(_._1))
      else {
        val a = Alias(Literal(1), "__asof_key")()
        (Project(j.left.output :+ a, j.left), Vector(a.toAttribute))
      }

    // Right side: payload copies of EVERY column (they survive the
    // node's USING-style output and carry the matched row's values back
    // out), plus dedicated key/time copies for the node to consume-drop.
    val rOut = j.right.output
    val payloadAliases = rOut.map(a => Alias(a, a.name)())
    val payloadOf: Map[ExprId, Attribute] =
      rOut.map(_.exprId).zip(payloadAliases.map(_.toAttribute)).toMap
    val keyAliases =
      if (!keyless) eqs.map { case (_, r) => Alias(r, s"__asof_${r.name}")() }
      else Vector(Alias(Literal(1), "__asof_key")())
    val timeAlias = Alias(rTimeSrc, s"__asof_${rTimeSrc.name}")()
    val rProject =
      Project(payloadAliases ++ keyAliases :+ timeAlias, j.right)
    val rKeys = keyAliases.map(_.toAttribute)
    val rTime = timeAlias.toAttribute
    // build-side null keys/times never match (SQL semantics — the merge
    // would otherwise order NULL as a small value); same filter the
    // Scala API adds
    val rFiltered =
      Filter((rKeys :+ rTime).map(IsNotNull).reduce[Expression](And), rProject)

    val hint = j.hint.rightHint.flatMap(_.strategy) match {
      // Spark hints are advisory: honor BROADCAST when the time axis
      // supports the binary-search probe, quietly plan Auto otherwise
      case Some(BROADCAST) if AsOfTime.supports(lTime.dataType) =>
        AsOfJoin.Broadcast
      case _ => AsOfJoin.Auto
    }
    val node = AsOfJoinPlan(lKeys, rKeys, lTime, rTime, dir,
      tolerance = None, hint, preparedLeft, rFiltered)

    // matched-time payload copy: NULL exactly on unmatched left rows
    val matchedTime =
      node.output.find(_.exprId == payloadOf(rTimeSrc.exprId).exprId).get
    val filtered = j.joinType match {
      case LeftOuter => node
      case Inner => Filter(IsNotNull(matchedTime), node)
      case other => fail(s"ASOF ${other.sql} JOIN is not supported — " +
        "only ASOF [LEFT] JOIN")
    }
    // Restore the ORIGINAL output attributes (exprIds, names,
    // qualifiers): parents may have resolved against the plain join's
    // output in the same analysis pass. DuckDB-parity: every right
    // column is visible, NULL on no match.
    Project(
      j.left.output ++ rOut.map(a =>
        Alias(payloadOf(a.exprId), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)),
      filtered)
  }
}
