package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite an inner join whose condition bounds one
  * side's numeric expression between two expressions of the other side
  * (`pt >= lo AND pt <= hi`, the range/interval join) into the
  * bin-bucketed EQUI-join of [[graft.operators.RangeJoin]] — Spark
  * itself plans such a join as BroadcastNestedLoopJoin (or a cartesian
  * product), which is quadratic and a scale-killer; after the rewrite
  * it plans as a plain shuffled equi-join on the bin key.
  *
  * The rewrite preserves semantics exactly: the original condition is
  * kept verbatim as a residual predicate, intervals explode only to
  * their covering bins (plus a `hi >= lo` validity filter, implied by
  * the original condition), and every point lands in exactly one bin,
  * so no pair is produced twice.
  *
  * Opt-in via session conf (a per-query width hint, the same contract
  * as Databricks' range-join binning hints):
  *
  * {{{
  *   spark.conf.set("spark.graft.rangeJoin.binWidth", "300000")
  * }}}
  *
  * Injected declaratively by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) and imperatively by
  * [[graft.GraftSession.create]] (`experimental.extraOptimizations`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  final val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  private val BinPrefix = "_graft_bin"

  private def binWidth: Long =
    conf.getConfString(BinWidthConf, "0").toLong

  private def numeric(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  /** floor(e / w) as a long — double arithmetic is exact here for any
    * |e| < 2^53, which covers epoch-ms and friends. */
  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  /** (pt, lo, hi) such that the predicates contain pt >= lo (or >) and
    * pt <= hi (or <), pt entirely from one join side and lo/hi both
    * entirely from the other. */
  private def findRange(preds: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def side(e: Expression): Option[Int] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(0)
      else if (e.references.subsetOf(right.outputSet)) Some(1)
      else None
    // normalize every comparison to (greater, lesser)
    val geqs = preds.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b)        => (a, b)
      case LessThanOrEqual(a, b)    => (b, a)
      case LessThan(a, b)           => (b, a)
    }.filter { case (a, b) =>
      numeric(a) && numeric(b) &&
        side(a).isDefined && side(b).isDefined && side(a) != side(b)
    }
    val candidates = for {
      (pt1, lo) <- geqs  // pt >= lo
      (hi, pt2) <- geqs  // hi >= pt
      if pt1.semanticEquals(pt2) && side(lo) == side(hi)
    } yield (pt1, lo, hi)
    candidates.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          // re-entry guard: our own rewrite carries _graft_bin attrs
          if !j.children.exists(_.output.exists(_.name.startsWith(BinPrefix))) =>
        findRange(splitConjunctivePredicates(cond), left, right) match {
          case None => j
          case Some((pt, lo, hi)) =>
            val ptOnLeft = pt.references.subsetOf(left.outputSet)
            val (points, intervals) = if (ptOnLeft) (left, right) else (right, left)
            // points side: one added bin column
            val ptBin = Alias(bin(pt, w), s"${BinPrefix}_p")()
            val pointsB = Project(points.output :+ ptBin, points)
            // interval side: validity filter + explode covering bins
            val ivBin = AttributeReference(s"${BinPrefix}_i", LongType)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone it stays unresolved (no analyzer runs after an
            // optimizer rule fires)
            val seq = new Sequence(
              bin(lo, w), bin(hi, w), Some(Literal(1L)),
              Some(conf.sessionLocalTimeZone))
            val intervalsB = Generate(Explode(seq), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(ivBin),
              Filter(GreaterThanOrEqual(hi, lo), intervals))
            val newCond = And(EqualTo(ptBin.toAttribute, ivBin), cond)
            val (newLeft, newRight) =
              if (ptOnLeft) (pointsB, intervalsB) else (intervalsB, pointsB)
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
