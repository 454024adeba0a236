package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule for the stratification FILTERED path at large stratum
  * counts (SURVEY §4 / §7.4 risk 8): a union of per-stratum global
  * aggregates
  *
  * {{{
  * Union(
  *   Aggregate(Nil, [aggs..., lit(clause₁) AS __stratum], Filter(k = v₁, src)),
  *   Aggregate(Nil, [aggs..., lit(clause₂) AS __stratum], Filter(k = v₂, src)),
  *   ...)
  * }}}
  *
  * scans the source once PER STRATUM — O(#strata) jobs. When every child
  * filters the SAME source on the SAME key with a distinct literal and
  * computes the SAME aggregates, the union collapses into ONE grouped
  * aggregate over `k IN (v...)` with the stratum label rebuilt as a
  * CASE over k — one scan, one shuffle, any stratum count.
  *
  * SEMANTICS GUARD: a global aggregate emits one row on EMPTY input, a
  * grouped aggregate emits none — the rewrite is only sound when every
  * stratum value is present in the source. Two activation paths:
  *
  *  - EXPLICIT: `spark.graft.rewriteStrataUnion=true` rewrites every
  *    matching union (caller asserts presence);
  *  - AUTO: unions whose clause column is the engine's own `__stratum`
  *    marker collapse automatically once they have more than
  *    `spark.graft.strataUnionAutoThreshold` (default 32) children.
  *    `StratifiedFrame.perStratum` is the only producer of that shape and
  *    derives strata from OBSERVED combinations, so presence is guaranteed
  *    by construction; below the threshold the per-stratum scans stay as
  *    authored (they enjoy per-stratum predicate pushdown and the job
  *    count is harmless).
  */
object StrataUnionRewrite extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.rewriteStrataUnion"
  private val AutoKey = "spark.graft.strataUnionAutoThreshold"

  /** the clause-column name `StratifiedFrame.perStratum` emits — the
    * auto path's marker */
  val StratumMarker = "__stratum"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val explicit = conf.getConfString(FlagKey, "false").toBoolean
    val autoThreshold = conf.getConfString(AutoKey, "32").toInt
    plan.transformUp {
      case u: Union if u.children.size >= 2 &&
          (explicit || (u.children.size > autoThreshold && autoEligible(u))) =>
        tryRewrite(u).getOrElse(u)
    }
  }

  /** AUTO-path eligibility: every child's clause literal is aliased
    * `__stratum` (only perStratum builds that shape, and its strata are
    * OBSERVED combinations) AND the filter carries nothing beyond the
    * stratum equalities. The second condition is load-bearing: presence is
    * guaranteed only for the stratum predicate itself — if the caller's
    * `f` added its own filter (an extra conjunct), a stratum can be
    * emptied by it, and the union's global aggregate would emit a row
    * (null aggregates) where a grouped aggregate emits none. Such plans
    * only collapse under the EXPLICIT flag, where the caller asserts
    * non-emptiness. */
  private def autoEligible(u: Union): Boolean =
    u.children.forall(c => shapeOf(c).exists { s =>
      s.aggExprs(s.clauseIdx).name == StratumMarker && s.otherConjuncts.isEmpty
    })

  private case class Shape(
      aggExprs: Seq[NamedExpression], clauseIdx: Int, clauseLit: Literal,
      /** stratum equalities, sorted by key name */
      eqs: Seq[(AttributeReference, Literal)],
      otherConjuncts: Seq[Expression],
      pruned: Option[Seq[NamedExpression]], source: LogicalPlan)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def shapeOf(p: LogicalPlan): Option[Shape] = {
    // column pruning may interpose an attribute-only Project between the
    // aggregate and the filter
    val (aggExprsOpt, filterOpt, prunedOpt) = p match {
      case Aggregate(Nil, aggExprs, f: Filter, _) =>
        (Some(aggExprs), Some(f), None)
      case Aggregate(Nil, aggExprs, Project(projList, f: Filter), _)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        (Some(aggExprs), Some(f), Some(projList))
      case _ => (None, None, None)
    }
    for {
      aggExprs <- aggExprsOpt
      filter <- filterOpt
      conjuncts = splitConjuncts(filter.condition)
      eqExprs = conjuncts.collect {
        case e @ EqualTo(k: AttributeReference, v: Literal) => (e, k, v)
      }
      idx = aggExprs.indexWhere {
        case Alias(Literal(_, StringType), _) => true
        case _                                => false
      }
      if eqExprs.nonEmpty && idx >= 0 &&
        eqExprs.map(_._2.name).distinct.size == eqExprs.size
    } yield {
      val rest = conjuncts.filterNot(c => eqExprs.exists(_._1 eq c))
      val lit = aggExprs(idx).asInstanceOf[Alias].child.asInstanceOf[Literal]
      Shape(aggExprs, idx, lit,
        eqExprs.map(t => (t._2, t._3)).sortBy(_._1.name),
        rest, prunedOpt, filter.child)
    }
  }

  private def tryRewrite(u: Union): Option[LogicalPlan] = {
    val maybeShapes = u.children.map(shapeOf)
    if (maybeShapes.exists(_.isEmpty)) return None
    val ss = maybeShapes.flatten
    val first = ss.head
    // children reference their own copies of the source attributes
    // (distinct expr ids), so cross-child equality is checked on the
    // id-free SQL rendering of each expression
    val compatible = ss.tail.forall { s =>
      s.source.canonicalized == first.source.canonicalized &&
      s.eqs.map(_._1.name) == first.eqs.map(_._1.name) &&
      s.clauseIdx == first.clauseIdx &&
      s.aggExprs.length == first.aggExprs.length &&
      s.aggExprs.zipWithIndex.forall { case (a, i) =>
        i == s.clauseIdx || a.sql == first.aggExprs(i).sql
      } &&
      s.otherConjuncts.map(_.sql).toSet ==
        first.otherConjuncts.map(_.sql).toSet
    }
    if (!compatible) return None
    if (ss.map(_.eqs.map(_._2.value)).distinct.size != ss.size) return None

    // grouping keys from the FIRST child (its expr ids match its source)
    val keys = first.eqs.map(_._1)
    // per-child stratum predicate over the first child's key attrs
    def childPred(s: Shape): Expression =
      keys.zip(s.eqs.map(_._2))
        .map { case (k, v) => EqualTo(k, v): Expression }
        .reduce(And)
    val strataCond = ss.map(childPred).reduce(Or)
    val cond = (first.otherConjuncts :+ strataCond).reduce(And)
    val filteredBase = Filter(cond, first.source)
    // re-apply column pruning, keeping the grouping keys visible
    val filtered = first.pruned match {
      case Some(projList) =>
        val missing = keys.filterNot(k => projList.exists(_.exprId == k.exprId))
        Project(projList ++ missing, filteredBase)
      case None => filteredBase
    }
    // grouped aggregate: first child's agg exprs (stable expr ids) with the
    // clause slot replaced by a CASE over the grouping keys
    val caseExpr = CaseWhen(
      ss.map(s => (childPred(s), s.clauseLit)), None)
    val origClause = first.aggExprs(first.clauseIdx).asInstanceOf[Alias]
    val newAggExprs = first.aggExprs.updated(first.clauseIdx,
      Alias(caseExpr, origClause.name)(exprId = origClause.exprId))
    val grouped = Aggregate(keys, newAggExprs, filtered, None)

    // align output attribute ids with the union's output
    val proj = grouped.output.zip(u.output).map { case (a, outAttr) =>
      Alias(a, outAttr.name)(exprId = outAttr.exprId)
    }
    Some(Project(proj, grouped))
  }
}
