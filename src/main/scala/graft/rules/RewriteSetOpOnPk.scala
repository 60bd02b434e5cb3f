package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftTableV2

/** INTERSECT / EXCEPT over the full primary-key column set of Graft tables
  * rewrite to left-semi / left-anti joins (reference
  * `star/rules/StarLakePostHocAnalysis.scala:31-95`): PKs are unique and
  * non-null, so set semantics are preserved — and the join needs no
  * deduplicating aggregate and, on co-bucketed tables, no shuffle at all.
  */
case class RewriteSetOpOnPk(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case Intersect(left, right, false)
        if left.resolved && right.resolved && pkComplete(left) && pkComplete(right) =>
      Join(left, right, LeftSemi, joinCond(left, right), JoinHint.NONE)
    case Except(left, right, false)
        if left.resolved && right.resolved && pkComplete(left) && pkComplete(right) =>
      Join(left, right, LeftAnti, joinCond(left, right), JoinHint.NONE)
  }

  private def joinCond(left: LogicalPlan, right: LogicalPlan): Option[Expression] =
    left.output.zip(right.output)
      .map { case (l, r) => EqualNullSafe(l, r): Expression }
      .reduceOption(org.apache.spark.sql.catalyst.expressions.And)

  /** Output is exactly the PK column set of one Graft PK table. */
  private def pkComplete(p: LogicalPlan): Boolean = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      pkOf(child).exists(pk =>
        exprs.map(_.name).sorted == pk.sorted && exprs.length == pk.length)
    case other =>
      pkOf(other).exists(pk =>
        other.output.map(_.name).sorted == pk.sorted && other.output.length == pk.length)
  }

  private def pkOf(p: LogicalPlan): Option[Seq[String]] = p match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTableV2 =>
        g.snapshotOpt.map(_.tableInfo).filter(_.hasPrimaryKey).map(_.hashColumns)
      case _ => None
    }
    case SubqueryAlias(_, child) => pkOf(child)
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      pkOf(child)
    case _ => None
  }

  private type NE = NamedExpression
}
