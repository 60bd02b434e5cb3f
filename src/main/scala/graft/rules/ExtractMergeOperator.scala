package graft.rules

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, ExpressionInfo, NamedExpression, UnaryExpression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.merge.GraftMergeOperator
import graft.sources.GraftTableV2

/** Marker expression produced by the `graft_merge_op_<name>(col)` SQL
  * functions; never evaluated — `ExtractMergeOperator` strips it into the
  * scan's merge-operator assignment during analysis (reference marker-UDF
  * scheme, `merge_operator/MergeOperator.scala:28-72` +
  * `star/StarLakeUtils.scala:250-253`).
  */
case class GraftMergeOpMarker(child: Expression, op: String)
  extends UnaryExpression with Unevaluable {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftMergeOpMarker {
  val PREFIX = "graft_merge_op_"
  /** Names injected as SQL functions. Built-ins plus anything registered
    * in the operator registry before session construction. */
  def knownOps: Seq[String] = Seq("last", "sum", "concat")

  def functionInjections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    knownOps.map { op =>
      val name = s"$PREFIX$op"
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftMergeOpMarker].getName, name),
        (children: Seq[Expression]) => GraftMergeOpMarker(children.head, op))
    }
}

/** Strips `GraftMergeOpMarker`s from projections over Graft PK tables and
  * rewrites the relation's scan options with the per-column operator
  * assignment (reference `star/rules/ExtractMergeOperator.scala:43-97`).
  */
case class ExtractMergeOperator(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p @ Project(exprs, child) if p.resolved &&
        exprs.exists(_.exists(_.isInstanceOf[GraftMergeOpMarker])) =>
      // Attribute each marker BY EXPRID to the graft relation that actually
      // produces its column — not to "the first graft relation anywhere
      // below". In a join, a marker over the OTHER side's column must stay
      // un-stripped (the check rule then rejects it loudly) instead of
      // silently folding an unrelated same-named column; in a self-join,
      // each side gets exactly its own assignments.
      val graftRels = child.collect {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] => r
      }
      if (graftRels.isEmpty) p
      else {
        val perRel = scala.collection.mutable.Map
          .empty[DataSourceV2Relation,
            scala.collection.mutable.Map[String, String]]
        val stripped: Seq[NamedExpression] = exprs.map { ne =>
          ne.transformUp {
            case m @ GraftMergeOpMarker(arg, op) =>
              val owner = arg.references.headOption.flatMap(attr =>
                graftRels.find(_.outputSet.contains(attr)).map((attr, _)))
              owner match {
                case Some((attr, r)) =>
                  perRel.getOrElseUpdate(r,
                    scala.collection.mutable.Map.empty) += (attr.name -> op)
                  arg
                case None => m
              }
          }.asInstanceOf[NamedExpression]
        }
        if (perRel.isEmpty) p
        else {
          val newChild = child.transform {
            case r: DataSourceV2Relation if perRel.contains(r) =>
              val merged = r.options.asCaseSensitiveMap().asScala.toMap ++ Map(
                GraftMergeOperator.SCAN_OPTION ->
                  GraftMergeOperator.formatAssignments(perRel(r).toMap))
              r.copy(options = new CaseInsensitiveStringMap(merged.asJava))
          }
          Project(stripped, newChild)
        }
      }
  }
}

/** Check rule: a merge-operator marker that survived analysis means it was
  * applied over something that is not a Graft scan (reference
  * `NonMergeOperatorUDFCheck`, `ExtractMergeOperator.scala:106-121`). */
object MergeOperatorMarkerCheck extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = {
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case m: GraftMergeOpMarker =>
          throw new IllegalArgumentException(
            s"graft_merge_op_${m.op} may only be applied to columns of a " +
            "graft primary-key table scan")
        case _ =>
      })
    }
  }
}
