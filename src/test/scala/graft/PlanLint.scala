package graft

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryComparison, Expression, In, IsNotNull, StartsWith}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Structural scale-safety lint over physical plans — the invariants
  * every registered query must honor at 100 TB, factored out of
  * PlanAuditSpec so a deliberately planted offender can be shown to
  * trip the same code path the registry gate runs. */
object PlanLint {

  /** A nested-loop side is tolerable when its row count provably does
    * NOT grow with the data. 64k covers the codebase's real bounded
    * spines (64×64 covariance pairs, 9 contour levels, a sensor DB)
    * while staying far below anything data-sized. */
  val BoundedSideMax = 65536L

  /** Statically provable row-count bound of a subtree, or None when
    * the count can grow with the data. Conservative: only shapes whose
    * bound is visible in the plan itself count — a constant Range, a
    * literal local relation, a no-grouping aggregate (exactly one
    * row), limits, and count-preserving/reducing wrappers over those.
    * Products propagate through nested-loop joins so a bounded ×
    * bounded spine (64×64 feature pairs) stays provably bounded. */
  def boundedRows(p: SparkPlan): Option[Long] = p match {
    case r: RangeExec => Some(r.numElements.toLong)
    case t: LocalTableScanExec => Some(t.rows.size.toLong)
    case a: BaseAggregateExec =>
      if (a.groupingExpressions.isEmpty) Some(1L) else None
    case l: GlobalLimitExec =>
      Some(boundedRows(l.child).fold(l.limit.toLong)(math.min(_, l.limit.toLong)))
    case l: LocalLimitExec => boundedRows(l.child) // per-partition limit: no global bound alone
    case f: FilterExec => boundedRows(f.child)
    case pr: ProjectExec => boundedRows(pr.child)
    case e: Exchange => boundedRows(e.child)
    case s: SortExec => boundedRows(s.child)
    case c: CoalesceExec => boundedRows(c.child)
    case w: WholeStageCodegenExec => boundedRows(w.child)
    case i: InputAdapter => boundedRows(i.child)
    case j: BroadcastNestedLoopJoinExec =>
      for (a <- boundedRows(j.left); b <- boundedRows(j.right)) yield a * b
    case j: CartesianProductExec =>
      for (a <- boundedRows(j.left); b <- boundedRows(j.right)) yield a * b
    case u: UnionExec =>
      u.children.foldLeft(Option(0L)) { (acc, c) =>
        for (a <- acc; b <- boundedRows(c)) yield a + b
      }
    case _ => None
  }

  /** Conservatively true when the subtree provably emits ≤ 1 row. */
  def singleRow(p: SparkPlan): Boolean = boundedRows(p).exists(_ <= 1L)

  /** Joins that multiply instead of match: a CartesianProduct or
    * nested-loop join is tolerable ONLY when at least one side is
    * provably bounded (≤ [[BoundedSideMax]] rows independent of data
    * size — a broadcast scalar, a constant Range spine, a dimension
    * LocalTableScan); over two data-sized sides it is |L|×|R| work —
    * the shape that dies first at scale. */
  def joinViolations(plan: SparkPlan): Seq[String] = {
    def ok(l: SparkPlan, r: SparkPlan): Boolean =
      boundedRows(l).exists(_ <= BoundedSideMax) || boundedRows(r).exists(_ <= BoundedSideMax)
    plan.collect {
      case c: CartesianProductExec if !ok(c.left, c.right) =>
        s"CartesianProduct over two data-sized sides"
      case j: BroadcastNestedLoopJoinExec if !ok(j.left, j.right) =>
        s"BroadcastNestedLoopJoin (${j.joinType}) over two data-sized sides"
    }
  }

  /** True for predicates parquet CAN push (a bare column compared to a
    * literal, IsNotNull / In / StartsWith on a bare column). Filters
    * over computed expressions (pmod(col), concat(col), hashes) are
    * not pushable by construction and don't count against a scan. */
  def pushableShaped(e: Expression): Boolean = e match {
    case IsNotNull(_: AttributeReference) => true
    case b: BinaryComparison =>
      (b.left.isInstanceOf[AttributeReference] && b.right.foldable) ||
      (b.right.isInstanceOf[AttributeReference] && b.left.foldable)
    case In(_: AttributeReference, list) => list.forall(_.foldable)
    case StartsWith(_: AttributeReference, l) => l.foldable
    case _ => false
  }

  /** The per-scan violation predicate, exposed so the self-check can
    * plant the offending shape directly: pushable-shaped data filters
    * present, yet the scan's PushedFilters metadata is empty. */
  def scanViolation(dataFilters: Seq[Expression], pushedMeta: Option[String]): Boolean =
    dataFilters.exists(pushableShaped) && pushedMeta.forall(_ == "[]")

  /** Parquet scans carrying pushable-shaped data filters that pushed
    * NOTHING down: the filter then runs entirely post-decode — every
    * byte of the column chunks is read even when min/max stats could
    * have pruned whole row groups. */
  def unpushedScanViolations(plan: SparkPlan): Seq[String] = plan.collect {
    case s: FileSourceScanExec
        if scanViolation(s.dataFilters, s.metadata.get("PushedFilters")) =>
      s"filtered parquet scan pushed no predicates (filters: ${s.dataFilters.mkString(", ").take(120)})"
  }

  def violations(plan: SparkPlan): Seq[String] =
    joinViolations(plan) ++ unpushedScanViolations(plan)
}
