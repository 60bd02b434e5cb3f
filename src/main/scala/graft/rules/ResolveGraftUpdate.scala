package graft.rules

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}

/** Routes SQL `UPDATE t SET ... WHERE ...` on graft tables to the engine's
  * transactional rewrite (reference `StarLakeAnalysis.scala:43-197` →
  * `PreprocessTableUpdate` → `commands/UpdateCommand.scala:61-153`).
  * The resolved assignments/condition are carried as SQL text so the
  * command node stays a resolved leaf; `UpdateCommand` re-binds them
  * against its own pinned-snapshot read.
  */
case class ResolveGraftUpdate(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UpdateTable if u.resolved =>
      graftPathOf(u.table) match {
        case Some(path) =>
          checkSupported(u.assignments, u.condition)
          toCommand(path, u.assignments, u.condition).getOrElse(u)
        case None => u
      }
  }

  /** Reject shapes the transactional rewrite cannot express, at analysis
    * time with a clear message (reference
    * `star/rules/PreprocessTableUpsert.scala:30-69` does the same for its
    * DML routing): the condition and assignment values are re-bound against
    * the command's own pinned-snapshot read, so they must be deterministic
    * and self-contained — a subquery would otherwise surface later as an
    * opaque parse/bind failure, and a nondeterministic expression would
    * evaluate differently between the rewrite's copy passes. */
  private def checkSupported(
      assignments: Seq[Assignment], condition: Option[Expression]): Unit = {
    def fail(what: String, e: Expression): Nothing =
      throw new UnsupportedOperationException(
        s"UPDATE on graft tables does not support $what: ${e.sql}")
    condition.foreach { c =>
      if (c.exists(_.isInstanceOf[SubqueryExpression]))
        fail("subqueries in the WHERE condition", c)
      if (!c.deterministic) fail("a nondeterministic WHERE condition", c)
    }
    assignments.foreach { a =>
      if (a.value.exists(_.isInstanceOf[SubqueryExpression]))
        fail("subqueries in SET values", a.value)
      if (!a.value.deterministic) fail("nondeterministic SET values", a.value)
    }
  }

  private def graftPathOf(table: LogicalPlan): Option[String] = table match {
    case SubqueryAlias(_, child) => graftPathOf(child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case g: graft.sources.GraftTableV2 => Some(g.path)
        case _ => None
      }
    case _ => None
  }

  /** Render without catalog qualifiers so the command can re-parse the
    * expression against its own bare table read. */
  private def cleanSql(e: Expression): String =
    e.transform {
      case ar: AttributeReference => ar.withQualifier(Nil)
    }.sql

  private def toCommand(
      path: String,
      assignments: Seq[Assignment],
      condition: Option[Expression]): Option[LogicalPlan] = {
    // keys may address nested struct fields (`SET props.a = ...`): the
    // resolved key is a GetStructField chain over the column attribute
    def keyPath(e: Expression): Option[String] = e match {
      case ar: AttributeReference => Some(ar.name)
      case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
        keyPath(g.child).map(p => s"$p.${g.extractFieldName}")
      case _ => None
    }
    val sets = assignments.map { a =>
      keyPath(a.key) match {
        case Some(path) => path -> cleanSql(a.value)
        case None => return None // map/array element updates not supported
      }
    }
    Some(GraftUpdateTableCommand(path, sets, condition.map(cleanSql)))
  }
}

/** V1 command executing the transactional update at runtime. */
case class GraftUpdateTableCommand(
    path: String,
    sets: Seq[(String, String)],
    condSql: Option[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    graft.commands.UpdateCommand.run(
      session, path,
      condSql.map(expr).getOrElse(lit(true)),
      sets.map { case (n, v) => n -> expr(v) }.toMap)
    Seq.empty
  }
}

/** Routes SQL `DELETE FROM t WHERE ...` on graft tables to the engine's
  * full delete ladder (metadata-only / deletion vectors / rewrite). The
  * `SupportsDelete` bridge on the table only accepts V1-translatable
  * filters, so without this rule a perfectly good `WHERE id % 500 = 3`
  * fails analysis ("Cannot delete from table"); here ANY deterministic,
  * subquery-free condition works — it is carried as SQL text and re-bound
  * by `DeleteCommand` against its own pinned-snapshot read. */
case class ResolveGraftDelete(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable(
        table, condition) if d.resolved =>
      graftPathOf(table) match {
        case Some(path) =>
          if (condition.exists(_.isInstanceOf[SubqueryExpression]))
            throw new UnsupportedOperationException(
              "DELETE on graft tables does not support subqueries in the " +
              s"WHERE condition: ${condition.sql}")
          if (!condition.deterministic)
            throw new UnsupportedOperationException(
              "DELETE on graft tables does not support a nondeterministic " +
              s"WHERE condition: ${condition.sql}")
          GraftDeleteTableCommand(path, condition.transform {
            case ar: AttributeReference => ar.withQualifier(Nil)
          }.sql)
        case None => d
      }
  }

  private def graftPathOf(table: LogicalPlan): Option[String] = table match {
    case SubqueryAlias(_, child) => graftPathOf(child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case g: graft.sources.GraftTableV2 => Some(g.path)
        case _ => None
      }
    case _ => None
  }
}

/** V1 command executing the transactional delete at runtime. */
case class GraftDeleteTableCommand(
    path: String, condSql: String) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    graft.commands.DeleteCommand.run(session, path, expr(condSql))
    Seq.empty
  }
}
