package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, DenseRank, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the ubiquitous rank-k idiom
  *
  * {{{ Filter(rnk <= k, Window(row_number() as rnk, partitionBy, orderBy)) }}}
  *
  * (with or without an intervening Project that merely aliases/casts the
  * rank) into the native [[TopKPerKey]] operator.
  *
  * What stock Spark does here: since 3.5, `InferWindowGroupLimit` inserts
  * `WindowGroupLimit` pruning below such Windows — map-side k-per-key
  * pruning, but sort-based (a local Sort before each pruning pass, a full
  * Sort after the shuffle) and still followed by the complete Window
  * operator + Filter. The heap rewrite removes all three sorts and the
  * Window pass: heaps prune unsorted input and the final exec sorts only
  * k rows per key. An inferred `WindowGroupLimit` child is stripped (the
  * heap subsumes it). Semantics are identical because `row_number` over
  * the same total order assigns exactly the ranks the heap emits; the
  * rewrite keeps the original rank attribute (same exprId and type), so
  * downstream references are untouched.
  *
  * Applied only when the Window computes EXACTLY one expression
  * (`row_number`) — mixed window lists still need the full Window.
  *
  * Opt-in per session via [[TopK.enableRewrite]] or cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Rank bounds above this stay on the Window plan: a heap-per-key of
    * that size is worse than sorting, and the rewrite must never turn a
    * large-but-harmless rank filter into an allocation hazard. */
  private val MaxRewriteK = 1 << 20

  /** `attr <= k`-shaped rank bounds, normalized to "keep k best". */
  private object RankLimit {
    private def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    private def bounded(k: Long): Option[Int] =
      if (k >= 1 && k <= MaxRewriteK) Some(k.toInt) else None
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, l) =>
        lit(l).flatMap(bounded).map(k => (a, k))
      case LessThan(a: Attribute, l) =>
        lit(l).map(_ - 1).flatMap(bounded).map(k => (a, k))
      case GreaterThanOrEqual(l, a: Attribute) =>
        lit(l).flatMap(bounded).map(k => (a, k))
      case GreaterThan(l, a: Attribute) =>
        lit(l).map(_ - 1).flatMap(bounded).map(k => (a, k))
      case EqualTo(a: Attribute, l) => lit(l).filter(_ == 1L).map(_ => (a, 1))
      case EqualTo(l, a: Attribute) => lit(l).filter(_ == 1L).map(_ => (a, 1))
      case _ => None
    }
  }

  /** A Window whose single expression is a plain rank function —
    * `row_number()`, `rank()` or `dense_rank()` — mapped to the operator
    * mode implementing that function's `<= k` semantics (rank keeps
    * boundary ties; dense_rank keeps k distinct order-value groups). */
  private object RankedWindow {
    def unapply(w: Window): Option[(Attribute, Window, RankMode)] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) =>
          Some((a.toAttribute, w, RowNumberMode))
        case Seq(a @ Alias(WindowExpression(_: Rank, _), _)) =>
          Some((a.toAttribute, w, RankMode))
        case Seq(a @ Alias(WindowExpression(_: DenseRank, _), _)) =>
          Some((a.toAttribute, w, DenseRankMode))
        case _ => None
      }
  }

  /** The rewrite subsumes an inferred sort-based WindowGroupLimit. */
  private def stripWgl(child: LogicalPlan): LogicalPlan = child match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter sits directly on the Window (SQL subquery idiom)
    case Filter(RankLimit(attr, k), RankedWindow(rnk, w, mode))
        if attr.semanticEquals(rnk) && k >= 1 =>
      TopKPerKey(w.partitionSpec, w.orderSpec, k, stripWgl(w.child),
        rankAttr = rnk, mode = mode)

    // Filter on a Project that aliases/casts the rank (DataFrame
    // `.withColumn("rnk", row_number().over(w).cast("long")).filter(...)`)
    case Filter(RankLimit(attr, k), p @ Project(projList, RankedWindow(rnk, w, mode)))
        if k >= 1 && aliasOfRank(projList, attr, rnk) =>
      Project(projList, TopKPerKey(w.partitionSpec, w.orderSpec, k,
        stripWgl(w.child), rankAttr = rnk, mode = mode))
  }

  /** Does `attr` in the Project output denote the rank (directly or via a
    * cast-only alias)? */
  private def aliasOfRank(
      projList: Seq[NamedExpression], attr: Attribute, rnk: Attribute): Boolean =
    projList.exists {
      case a: Attribute => a.semanticEquals(attr) && a.semanticEquals(rnk)
      case a @ Alias(child, _) if a.toAttribute.semanticEquals(attr) =>
        child match {
          case c: Attribute => c.semanticEquals(rnk)
          // widening cast only: a narrowing cast of the rank changes
          // semantics when it overflows (ANSI error / silent wrap)
          case Cast(c: Attribute, LongType, _, _) => c.semanticEquals(rnk)
          case _ => false
        }
      case _ => false
    }
}

/** Session installer for the rewrite (strategy + optimizer rule). */
object TopKRewrite {
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
}
