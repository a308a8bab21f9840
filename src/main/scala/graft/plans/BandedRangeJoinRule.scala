package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a keyless time-proximity inner join
  *
  *   SELECT ... FROM l JOIN r ON abs(l.ts - r.ts) <= W
  *
  * has no equi-condition, so Spark can only plan a (broadcast)
  * nested-loop join — O(|l|·|r|), a non-starter at scale. This rule
  * rewrites it into the banded form the RangeJoin operator uses
  * explicitly: the left side explodes to time bins {b-1, b, b+1}
  * (bin = ts div W), the right side projects its single bin, and the
  * join gains the equality `l_bin = r_bin` — a hash-joinable key.
  * Every pair within W differs by at most one bin and the three
  * exploded bins are distinct, so each original match survives with
  * multiplicity EXACTLY one; the original |l.ts − r.ts| predicate is
  * kept as the join filter, so semantics are unchanged.
  *
  * Fires only when NO equality conjunct exists (the nested-loop
  * case — with an equi key Spark already hash-joins and AQE
  * handles the rest), both timestamps are integral, and W is a
  * foldable positive integer. The added equality makes the rewritten
  * join non-matching, so the rule is idempotent.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) => tryRewrite(j).getOrElse(j)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** (leftTs, rightTs, width) when `e` is abs(ts−ts) ≤/< foldable W
    * with one ts from each side. */
  private def asRange(e: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def widthOf(w: Expression): Option[Long] = w match {
      case f if f.foldable && (f.dataType == LongType || f.dataType == IntegerType) =>
        Option(f.eval()).map {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }.filter(_ > 0)
      case _ => None
    }
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] = {
      val integral = Seq(a, b).forall(x =>
        x.dataType == LongType || x.dataType == IntegerType)
      if (!integral) None
      else if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    }
    val absDiff: PartialFunction[Expression, (Expression, Expression)] = {
      case Abs(Subtract(a, b, _), _) => (a, b)
    }
    e match {
      case LessThanOrEqual(ad, w) if absDiff.isDefinedAt(ad) =>
        val (a, b) = absDiff(ad)
        for (wv <- widthOf(w); (l, r) <- sides(a, b)) yield (l, r, wv)
      case LessThan(ad, w) if absDiff.isDefinedAt(ad) =>
        val (a, b) = absDiff(ad)
        for (wv <- widthOf(w); (l, r) <- sides(a, b)) yield (l, r, wv)
      case GreaterThanOrEqual(w, ad) if absDiff.isDefinedAt(ad) =>
        val (a, b) = absDiff(ad)
        for (wv <- widthOf(w); (l, r) <- sides(a, b)) yield (l, r, wv)
      case GreaterThan(w, ad) if absDiff.isDefinedAt(ad) =>
        val (a, b) = absDiff(ad)
        for (wv <- widthOf(w); (l, r) <- sides(a, b)) yield (l, r, wv)
      case _ => None
    }
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, Inner, Some(cond), hint) = j
    val parts = conjuncts(cond)
    // bail out if ANY equality conjunct across the join exists — the
    // join is already hash-joinable and banding would only add cost
    val hasEqui = parts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    val range = parts.iterator.flatMap(asRange(_, left, right)).buffered
    if (!range.hasNext) return None
    val (tsL, tsR, w) = range.head

    val width = Literal(w, LongType)
    val binL = IntegralDivide(asLong(tsL), width)
    val binR = IntegralDivide(asLong(tsR), width)
    val one = Literal(1L, LongType)

    val binAttr = AttributeReference("_graft_band", LongType, nullable = true)()
    val gen = Generate(
      Explode(CreateArray(Seq(
        Subtract(binL, one), binL, Add(binL, one)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr), child = left)

    val binRAlias = Alias(binR, "_graft_band_r")()
    val projR = Project(right.output :+ binRAlias, right)

    val newCond = And(cond, EqualTo(binAttr, binRAlias.toAttribute))
    // Pin SHUFFLE_HASH (right build) unless the user hinted the join
    // themselves: both sides of a time-proximity join are typically
    // corpus-sized, and the static planner's file-size estimate of
    // the exploded side can dip under the broadcast threshold —
    // broadcasting 3x a fact table. The banded equi-key makes a
    // partition-local hash build over bounded bins the scale shape.
    val pinned =
      if (hint == JoinHint.NONE)
        JoinHint(None, Some(HintInfo(strategy = Some(SHUFFLE_HASH))))
      else hint
    val joined = Join(gen, projR, Inner, Some(newCond), pinned)
    Some(Project(j.output, joined))
  }
}
