package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._

/** Render an analyzed Catalyst plan in the reference engine's plan-text
  * shape — `format_plan` (`/root/reference/tmp/select.rs:625-746`), the
  * reference's largest function group and its only observable output:
  * one `-> Node: detail` line per operator, children indented one space
  * per level, with the reference's exact node labels
  * (`TableScan`/`Projection`/`Filter`/`Join`/`Limit`/`Sort`/`Aggregate`/
  * `SubqueryAlias`/`With`).
  *
  * Expressions are printed in readable SQL-ish form rather than the
  * reference's Rust `{:?}` struct dumps (`Column { name: "email", .. }`) —
  * the node shape is the parity target, the Debug noise is not. Catalyst
  * nodes with no reference counterpart (e.g. `Distinct`) fall through to
  * the same `-> Name: ` line shape. */
object ReferencePlanFormat {

  def format(plan: LogicalPlan): String = render(plan, 0, Map.empty)

  /** Render one expression in the same vocabulary the plan nodes use —
    * the DML statement formatter (`ExecutionContext.explainReference` on
    * Update/Delete, `tmp/crud.txt:823-857`) prints WHERE/SET expressions
    * through this so both halves of the formatter agree. */
  def formatExpr(e: Expression): String = expr(e)

  // ---- plan nodes --------------------------------------------------------

  private def render(
      plan: LogicalPlan,
      indent: Int,
      cteNames: Map[Long, String]): String = {
    val pad = " " * indent
    def line(s: String) = s"$pad-> $s\n"
    def child(p: LogicalPlan, names: Map[Long, String] = cteNames) =
      render(p, indent + 1, names)

    plan match {
      // FROM t [AS a] — a temp-view scan analyzes to SubqueryAlias over a
      // (View over a) leaf relation; an extra outer SubqueryAlias is the
      // user's alias. Collapse the whole stack to the reference's leaf.
      case TableScanShape(name, alias, cols) =>
        val aliasStr = alias.filter(_ != name).map(a => s" AS $a").getOrElse("")
        line(s"TableScan: $name$aliasStr projection=[${cols.mkString(", ")}]")

      case SubqueryAlias(id, p) =>
        line(s"SubqueryAlias: ${id.name}") + child(p)

      case Project(exprs, p) =>
        line(s"Projection: [${exprs.map(expr).mkString(", ")}]") + child(p)

      case Filter(cond, p) =>
        line(s"Filter: ${expr(cond)}") + child(p)

      case Join(l, r, jt, cond, _) =>
        val t = jt match {
          case Inner => "Inner"
          case LeftOuter => "Left"
          case RightOuter => "Right"
          case FullOuter => "Full"
          case Cross => "Cross"
          case other => other.toString
        }
        val on = cond.map(c => s" ON ${expr(c)}").getOrElse("")
        line(s"Join: $t$on") + child(l) + child(r)

      // LIMIT/OFFSET analyze to GlobalLimit/Offset/LocalLimit stacks;
      // collapse to the reference's single Limit node
      // (`tmp/select.rs:683-697`).
      case GlobalLimit(f, Offset(s, p)) =>
        line(s"Limit: OFFSET ${expr(s)} LIMIT ${expr(f)}") + child(skipLocalLimit(p))
      case GlobalLimit(f, p) =>
        line(s"Limit: LIMIT ${expr(f)}") + child(skipLocalLimit(p))
      case Offset(s, p) =>
        line(s"Limit: OFFSET ${expr(s)}") + child(skipLocalLimit(p))
      case LocalLimit(f, p) =>
        line(s"Limit: LIMIT ${expr(f)}") + child(p)

      case Sort(order, _, p, _) =>
        val keys = order.map { so =>
          val dir = so.direction match {
            case Ascending => "ASC"
            case Descending => "DESC"
          }
          s"${expr(so.child)} $dir"
        }
        line(s"Sort: [${keys.mkString(", ")}]") + child(p)

      case Aggregate(group, aggs, p, _) =>
        // the reference splits group keys from aggregate expressions
        // (`tmp/select.rs:712-729`); Catalyst's aggregateExpressions is the
        // full output list, so list only the genuinely aggregating ones
        val aggOnly = aggs.filter(_.exists {
          case _: AggregateExpression => true
          case _ => false
        })
        line(s"Aggregate: group=[${group.map(expr).mkString(", ")}] " +
          s"agg=[${aggOnly.map(expr).mkString(", ")}]") + child(p)

      case WithCTE(p, defs) =>
        val names = cteNames ++ defs.map(d => d.id -> cteName(d))
        line(s"With: [${defs.map(cteName).mkString(", ")}]") +
          child(p, names)

      case r: CTERelationRef =>
        line(s"TableScan: ${cteNames.getOrElse(r.cteId, s"cte#${r.cteId}")} " +
          s"projection=[${r.output.map(_.name).mkString(", ")}]")

      // no reference counterpart — keep the line shape, generic label
      case other =>
        line(s"${other.nodeName}: ") +
          other.children.map(child(_)).mkString
    }
  }

  private def cteName(d: CTERelationDef): String = d.child match {
    case SubqueryAlias(id, _) => id.name
    case _ => s"cte#${d.id}"
  }

  private def skipLocalLimit(p: LogicalPlan): LogicalPlan = p match {
    case LocalLimit(_, c) => c
    case _ => p
  }

  /** Matches the analyzed shape of a named-table scan: optional user alias
    * over the view name over (View over) a leaf relation. */
  private object TableScanShape {
    def unapply(p: LogicalPlan)
        : Option[(String, Option[String], Seq[String])] = p match {
      case SubqueryAlias(outer, inner) => strip(inner) match {
        case Some((Some(name), cols)) => // user alias over named view
          Some((name, Some(outer.name), cols))
        case Some((None, cols)) => // the view-name alias itself
          Some((outer.name, None, cols))
        case None => None
      }
      case _ => None
    }

    /** Below the outermost alias: either another named alias over a leaf,
      * or directly a (View over) leaf. */
    private def strip(p: LogicalPlan)
        : Option[(Option[String], Seq[String])] = p match {
      case SubqueryAlias(id, q) if isLeafish(q) =>
        Some((Some(id.name), q.output.map(_.name)))
      case q if isLeafish(q) => Some((None, q.output.map(_.name)))
      case _ => None
    }

    // a View IS the catalog table in reference terms, whatever plan it
    // stores internally (a DataFrame temp view keeps its defining plan)
    private def isLeafish(p: LogicalPlan): Boolean = p match {
      case _: View => true
      case _ => p.children.isEmpty && !p.isInstanceOf[CTERelationRef]
    }
  }

  // ---- expressions -------------------------------------------------------

  private def expr(e: Expression): String = e match {
    case Alias(c, name) => s"${expr(c)} AS $name"
    case a: AttributeReference => a.name
    case Literal(null, _) => "NULL"
    case l @ Literal(_, org.apache.spark.sql.types.StringType) =>
      s"'${l.value}'"
    // numerics/booleans print their value; everything else (date,
    // timestamp, interval, binary...) would print its INTERNAL encoding
    // (days-since-epoch / epoch micros) — use the SQL form instead
    case l: Literal => l.dataType match {
      case _: org.apache.spark.sql.types.NumericType |
          org.apache.spark.sql.types.BooleanType =>
        String.valueOf(l.value)
      case _ => l.sql
    }
    case c: Cast => expr(c.child) // analysis-inserted; reference has no Cast
    case ae: AggregateExpression =>
      val d = if (ae.isDistinct) "DISTINCT " else ""
      val fn = ae.aggregateFunction
      val name = fn.prettyName.toUpperCase
      fn match {
        case Count(Seq(Literal(1, _))) => s"COUNT(*)"
        case _ => s"$name($d${fn.children.map(expr).mkString(", ")})"
      }
    case b: BinaryOperator =>
      // parenthesize nested binary operands: without it, structurally
      // different trees ((a AND b) OR c vs a AND (b OR c)) render to the
      // same text, defeating a parity/golden format
      def side(c: Expression): String = c match {
        case nested: BinaryOperator => s"(${expr(nested)})"
        case other => expr(other)
      }
      s"${side(b.left)} ${b.sqlOperator} ${side(b.right)}"
    case Not(c) => s"NOT ${expr(c)}"
    case IsNull(c) => s"${expr(c)} IS NULL"
    case IsNotNull(c) => s"${expr(c)} IS NOT NULL"
    case s: ScalarSubquery => s"SUBQUERY(${onePlanLine(s.plan)})"
    // SQL special forms keep their surface syntax — the generic
    // function-call catch-all below would render them as pseudo-calls
    // (LIKE(n_name, 'A%'), CASEWHEN(...)) that match no SQL dialect
    case l: Like =>
      // a non-default escape char changes the pattern's semantics —
      // dropping it would render a DIFFERENT predicate (r13 advice)
      val esc =
        if (l.escapeChar == '\\') ""
        // SQL string literal: a quote escape char must itself be
        // doubled, or ESCAPE ''' renders as an unterminated literal
        else if (l.escapeChar == '\'') " ESCAPE ''''"
        else s" ESCAPE '${l.escapeChar}'"
      s"${expr(l.left)} LIKE ${expr(l.right)}$esc"
    case i: In =>
      s"${expr(i.value)} IN (${i.list.map(expr).mkString(", ")})"
    case cw: CaseWhen =>
      val branches = cw.branches
        .map { case (c, v) => s"WHEN ${expr(c)} THEN ${expr(v)}" }
        .mkString(" ")
      val els = cw.elseValue.map(e => s" ELSE ${expr(e)}").getOrElse("")
      s"CASE $branches$els END"
    // generic scalar function call: UPPER(r_name) — recursing through
    // expr() keeps arguments in this vocabulary (Expression.sql would
    // qualify attributes as region.r_name and lowercase the name)
    case other if other.children.nonEmpty =>
      s"${other.prettyName.toUpperCase}(" +
        s"${other.children.map(expr).mkString(", ")})"
    case other =>
      scala.util.Try(other.sql).getOrElse(other.simpleString(100))
  }

  private def onePlanLine(p: LogicalPlan): String =
    format(p).linesIterator.map(_.trim.stripPrefix("-> ")).mkString(" <- ")
}
