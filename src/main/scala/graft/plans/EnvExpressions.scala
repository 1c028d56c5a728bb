package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, DoubleType}

/** `env_intersects(minx, miny, maxx, maxy, w, s, e, n)` — the envelope
  * (MBR) intersection predicate of the reference's spatial filter
  * (`stac.cpp:629-636` MbrIntersects) as a native Catalyst expression
  * (SURVEY §4.3's one justified custom scalar): a tight primitive
  * comparison chain inside whole-stage codegen, null-safe (a missing
  * envelope is "does not intersect", never null).
  *
  * Pushdown story: a custom expression is opaque to the parquet filter
  * translator, so [[EnvIntersectsRewrite]] expands it inside `Filter`
  * conditions into the four standard comparisons — which the file scan
  * then pushes as min/max row-group and file prunes. The expression
  * form survives everywhere else (projections, join conditions), where
  * the codegen below runs.
  */
case class EnvIntersects(children: Seq[Expression]) extends Expression {
  require(children.length == 8, "env_intersects(minx, miny, maxx, maxy, w, s, e, n)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires eight double arguments, got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")")
      )

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "env_intersects"

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Double](8)
    var i = 0
    while (i < 8) {
      val v = children(i).eval(input)
      if (v == null) return false // missing envelope: no intersection
      vs(i) = v.asInstanceOf[Double]
      i += 1
    }
    // (minx, miny, maxx, maxy) vs query (w, s, e, n)
    vs(2) >= vs(4) && vs(0) <= vs(6) && vs(3) >= vs(5) && vs(1) <= vs(7)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce((a, b) => code"$a\n$b")
    val anyNull = evals.map(e => code"${e.isNull}").reduce((a, b) => code"$a || $b")
    val cond =
      code"""${evals(2).value} >= ${evals(4).value} && ${evals(0).value} <= ${evals(6).value} &&
            |${evals(3).value} >= ${evals(5).value} && ${evals(1).value} <= ${evals(7).value}""".stripMargin
    ev.copy(
      code = code"""
        |$childCode
        |boolean ${ev.value} = false;
        |if (!($anyNull)) {
        |  ${ev.value} = $cond;
        |}""".stripMargin,
      isNull = FalseLiteral
    )
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Expand [[EnvIntersects]] inside `Filter` conditions into the four
  * standard range comparisons so the parquet scan can push them
  * (min/max row-group stats + file pruning — the replacement for the
  * reference's SpatiaLite MBR index).
  *
  * Scope: ONLY occurrences that are themselves a top-level conjunct of
  * the filter condition (split on `And`). There the swap is exact: the
  * expression returns FALSE on a null envelope, the expanded
  * conjunction returns NULL, and `Filter` drops the row either way.
  * Anywhere null-observing — under NOT, inside OR, CASE, `IS NULL` —
  * false vs NULL flips row retention (`WHERE NOT env_intersects(...)`
  * must KEEP null-envelope rows), so those occurrences keep the
  * non-nullable expression form and its codegen; they were never
  * parquet-pushable anyway. */
object EnvIntersectsRewrite extends Rule[LogicalPlan] {
  private def splitAnd(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform { case f: Filter =>
    var changed = false
    val conjuncts = splitAnd(f.condition).map {
      case EnvIntersects(cs) =>
        changed = true
        val Seq(minx, miny, maxx, maxy, w, s, e, n) = cs
        And(
          And(GreaterThanOrEqual(maxx, w), LessThanOrEqual(minx, e)),
          And(GreaterThanOrEqual(maxy, s), LessThanOrEqual(miny, n))
        )
      case other => other
    }
    if (changed) f.copy(condition = conjuncts.reduce(And)) else f
  }
}

object EnvExpressions {

  /** Expression builder: casts non-double numeric arguments so SQL
    * integer literals work (the expression itself is strict-double). */
  def build(exprs: Seq[Expression]): EnvIntersects =
    EnvIntersects(exprs.map(e => if (e.dataType == DoubleType) e else Cast(e, DoubleType)))

  /** Register `env_intersects` + its pushdown rewrite on an existing
    * session (any driver-built session; [[GraftExtensions]] is the
    * declarative route for sessions built with `spark.sql.extensions`).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry
    reg.createOrReplaceTempFunction("env_intersects", exprs => EnvExpressions.build(exprs), "built-in")
    val exp = spark.experimental
    if (!exp.extraOptimizations.exists(_ eq EnvIntersectsRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ EnvIntersectsRewrite
  }

  def envIntersects(
      minx: Column,
      miny: Column,
      maxx: Column,
      maxy: Column,
      w: Double,
      s: Double,
      e: Double,
      n: Double
  ): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("env_intersects", minx, miny, maxx, maxy, lit(w), lit(s), lit(e), lit(n))
  }
}
