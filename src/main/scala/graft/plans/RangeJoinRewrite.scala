package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Catalyst optimizer rule that makes NAIVE interval joins scale: a join
 * whose condition contains the sliding-window range shape
 *
 *   `r.t >= l.t - W AND r.t < l.t`      (t LONG, W a positive literal)
 *
 * is planned by Spark as a hash join on any remaining equi-keys with the
 * range as a residual — per key, every left row tests EVERY right row of
 * that key (quadratic in per-key history; with no equi-keys at all it
 * degrades to a broadcast nested loop). This rule rewrites it into the
 * Flink-interval-join banded form the hand-tuned
 * [[graft.streaming.Events.rangeJoinCounts]] uses: both sides get a
 * `W`-aligned bin column (`t - pmod(t, W)` — exact floor multiple, sign
 * safe), the right side is replicated into its own and the NEXT bin via
 * a two-branch union, and the bin equality joins ahead of the original
 * range residual. Any left row's window [l.t−W, l.t) spans at most two
 * adjacent bins, and each matching right row matches in exactly ONE of
 * its two copies (the copies occupy distinct bins), so the rewritten
 * join produces the identical row multiset — for LEFT OUTER joins the
 * unmatched-left null row survives unchanged too, so both Inner and
 * LeftOuter are rewritten.
 *
 * This is the (c)-tier extension path done for a whole OPERATOR: a
 * `Rule[LogicalPlan]` injected through
 * [[graft.functions.GraftExtensions]], so every session that loads the
 * library gets scalable interval joins from naive DataFrame/SQL code —
 * the optimization is transparent, like AQE's skew handling.
 *
 * Guards: the rule recognizes exactly the canonical conjunct shapes
 * above (what the public ops and typical user code emit), requires both
 * endpoints to be plain LONG attributes from opposite sides, and skips
 * joins that are already banded (an equi-key named `bin` or the rule's
 * own `__graft_range_bin` marker) — which also makes the rewrite
 * idempotent under the optimizer's fixed-point batch.
 */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BinName = "__graft_range_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt @ (Inner | LeftOuter), Some(cond), hint)
        if left.resolved && right.resolved =>
      rewrite(j, left, right, jt, cond, hint).getOrElse(j)
  }

  private case class RangePair(lT: AttributeReference,
                               rT: AttributeReference, w: Long)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      jt: org.apache.spark.sql.catalyst.plans.JoinType,
                      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // already banded (by hand or by this rule) → leave alone
    val banded = conjuncts.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        Seq(a.name, b.name).exists(n => n == "bin" || n == BinName)
      case _ => false
    }
    if (banded) return None
    val fromLeft = left.outputSet
    val fromRight = right.outputSet

    def sides(a: AttributeReference, b: AttributeReference): Boolean =
      fromLeft.contains(a) && fromRight.contains(b)

    // lower bound: r.t >= l.t - W in its two spellings
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(r: AttributeReference,
          Subtract(l: AttributeReference, Literal(w: Long, LongType), _))
          if sides(l, r) && w > 0 => RangePair(l, r, w)
      case LessThanOrEqual(
          Subtract(l: AttributeReference, Literal(w: Long, LongType), _),
          r: AttributeReference) if sides(l, r) && w > 0 => RangePair(l, r, w)
    }
    lower.flatMap { rp =>
      // upper bound on the SAME pair: r.t < l.t
      val upper = conjuncts.exists {
        case LessThan(r: AttributeReference, l: AttributeReference) =>
          r.semanticEquals(rp.rT) && l.semanticEquals(rp.lT)
        case GreaterThan(l: AttributeReference, r: AttributeReference) =>
          r.semanticEquals(rp.rT) && l.semanticEquals(rp.lT)
        case _ => false
      }
      if (!upper || rp.lT.dataType != LongType ||
        rp.rT.dataType != LongType) None
      else Some(banded2(left, right, jt, cond, hint, rp))
    }
  }

  /** The banded plan: bin both sides, right replicated into bin and
    * bin + W through a single-scan Generate(Explode), bin equality
    * prepended to the original condition. */
  private def banded2(left: LogicalPlan, right: LogicalPlan,
                      jt: org.apache.spark.sql.catalyst.plans.JoinType,
                      cond: Expression, hint: JoinHint,
                      rp: RangePair): LogicalPlan = {
    val w = Literal(rp.w, LongType)

    def binOf(t: AttributeReference, shift: Long): Expression = {
      val base = Subtract(t, Pmod(t, w))
      if (shift == 0L) base else Add(base, Literal(shift, LongType))
    }

    val lBin = Alias(binOf(rp.lT, 0L), BinName)()
    val leftB = Project(left.output :+ lBin, left)

    val rBinAttr = AttributeReference(BinName, LongType, nullable = false)()
    val rightB = Generate(
      Explode(CreateArray(Seq(binOf(rp.rT, 0L), binOf(rp.rT, rp.w)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(rBinAttr), child = right)

    val newCond = And(EqualTo(lBin.toAttribute, rBinAttr), cond)
    val joined = Join(leftB, rightB, jt, Some(newCond), hint)
    // restore the original output (drop the bin columns)
    Project(left.output ++ right.output, joined)
  }
}
