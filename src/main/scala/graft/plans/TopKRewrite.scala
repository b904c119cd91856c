package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.KthScore

/** Optimizer rule: rewrite a tie-inclusive window top-k —
  * `Filter(rank <= k, Window(rank() OVER (PARTITION BY p ORDER BY s DESC)))`
  * — into a [[KthScore]] threshold pre-filter:
  *
  * {{{
  * Filter(rank <= k,
  *   Window(rank,                       // same window, now over <= ~k rows/group
  *     Project(child.output,
  *       Filter(s >= th OR s IS NULL,
  *         Join(child, Aggregate(p, kth_score(s, k) AS th, child), on p)))))
  * }}}
  *
  * `s >= kth-largest(s)` keeps exactly the rows with fewer than k strictly
  * greater — the RANK <= k set — so re-applying the original window and
  * filter over the survivors returns identical rows AND identical rank
  * values (every strictly-greater row survives, null-ordered rows are
  * passed through to the final rank filter untouched). The scale win: the
  * window no longer sorts whole groups on single tasks; the aggregate
  * ships k-bounded heaps with map-side combine and only ~k rows per group
  * reach the sort. The cost: the child is scanned twice (threshold pass +
  * probe pass) — the right side of that trade whenever groups are large,
  * which is when a window top-k hurts in the first place.
  *
  * Conservative trigger: exactly one window expression, RANK over a single
  * descending DOUBLE sort key, plain attribute partition keys, literal
  * int bound — AND an estimated window input of at least
  * `spark.graft.topk.rewriteMinBytes` (default 1 GiB). The size gate is
  * what makes the rule safe to install globally: for a small-cardinality
  * child the double scan costs more than the sort it saves (measured 8×
  * slowdown when the child is itself an expensive PPR kernel), while a
  * 100 TB window input is exactly where the single-task group sort dies.
  * Anything else is left untouched.
  *
  * Activate per-session via `spark.experimental.extraOptimizations` or for
  * every session via [[graft.GraftExtensions]].
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val Rewritten = TreeNodeTag[Boolean]("graft.topk.rewritten")
  private[plans] val ThresholdName = "graft_kth_th"
  private[plans] val MinBytesKey = "spark.graft.topk.rewriteMinBytes"
  private[plans] val DefaultMinBytes: Long = 1L << 30

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.getTagValue(Rewritten).isEmpty && !alreadyRewritten(w) =>
      tryRewrite(f, cond, w).getOrElse(f)
  }

  /** Belt-and-braces re-entry guard besides the tag (tags do not survive
    * every tree copy): the rewritten subtree contains our aggregate.
    */
  private def alreadyRewritten(w: Window): Boolean =
    w.child.collectFirst {
      case a: Aggregate if a.aggregateExpressions.exists(_.name == ThresholdName) => a
    }.nonEmpty

  private def tryRewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] =
    (w.windowExpressions, cond) match {
      case (Seq(a @ Alias(WindowExpression(_: Rank,
              WindowSpecDefinition(part, Seq(SortOrder(s: AttributeReference, Descending, _, _)), _)), _)),
            _) if s.dataType == DoubleType && part.forall(_.isInstanceOf[AttributeReference]) =>
        val rkAttr = a.toAttribute
        val k = cond match {
          case LessThanOrEqual(r: Attribute, Literal(i: Int, IntegerType))
            if r.semanticEquals(rkAttr) => i
          case LessThan(r: Attribute, Literal(i: Int, IntegerType))
            if r.semanticEquals(rkAttr) => i - 1
          case _ => -1
        }
        if (k < 1) return None
        val minBytes = conf.getConfString(MinBytesKey, DefaultMinBytes.toString).toLong
        val size = w.child.stats.sizeInBytes
        // UNKNOWN stats surface as defaultSizeInBytes (Long.MaxValue unless
        // tuned) — e.g. RDD-backed plans. Treat unknown as small: firing on
        // an un-estimable child risks double-running an expensive kernel,
        // the exact regression the gate exists to prevent.
        if (size < minBytes || size >= conf.defaultSizeInBytes) return None
        val child = w.child
        val partAttrs = part.map(_.asInstanceOf[AttributeReference])
        // grouping keys re-aliased with fresh exprIds so the join output
        // carries no duplicate attribute ids.
        val gAliases = partAttrs.map(p => Alias(p, p.name + "_graft_g")())
        val th = Alias(
          AggregateExpression(KthScore(s, Literal(k)), Complete, isDistinct = false),
          ThresholdName)()
        val agg = Aggregate(partAttrs, gAliases :+ th, child)
        val joinCond = partAttrs.zip(gAliases)
          .map { case (c, g) => EqualNullSafe(c, g.toAttribute): Expression }
          .reduceOption(And)
        val join = Join(child, agg,
          if (joinCond.isEmpty) Cross else Inner, joinCond, JoinHint.NONE)
        // null-score rows pass through: the final rank filter ranks them
        // exactly as the original plan did (nulls sort last under DESC).
        val keep = Or(GreaterThanOrEqual(s, th.toAttribute), IsNull(s))
        val survivors = Project(child.output, Filter(keep, join))
        val newW = w.copy(child = survivors)
        newW.setTagValue(Rewritten, true)
        Some(f.copy(child = newW))
      case _ => None
    }
}
