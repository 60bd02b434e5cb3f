package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftTableV2

/** Answers bare `COUNT(*)` over a graft table from manifest statistics —
  * zero tasks, zero I/O (the Delta `OptimizeMetadataOnlyDeltaQuery`
  * technique): every committed file records its footer row count, so the
  * table's row count is a driver-side sum over the manifest.
  *
  * Strictly scoped to keep the rewrite exact:
  *  - grouping must be empty and every aggregate a non-distinct
  *    `count(<non-null literal>)` (`count(*)` / `count(1)`) with no
  *    FILTER clause;
  *  - the child must be the bare relation (projections are transparent —
  *    they never change cardinality; filters/joins/generators are not);
  *  - the table must have NO primary key: merge-on-read deduplicates keys
  *    across (and inside) files at read time, so file row counts overcount
  *    a PK table;
  *  - every live file must carry a footer row count (files written with
  *    stats disabled, or by pre-stats versions of the engine, fall back
  *    to the scan).
  *
  * At 100 TB this turns the most common dashboard probe from a
  * full-table scan into a metadata lookup.
  */
case class OptimizeMetadataOnlyCount(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption("spark.graft.stats.metadataOnlyCount.enabled")
      .forall(_.toBoolean)
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
        countableFiles(child) match {
          case Some(files) if files.forall(_.numRecords >= 0L) =>
            val total = files.map(_.numRecords).sum
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(aggExprs.map(_ => total))))
          case _ => agg
        }
    }
  }

  /** The live file list IF the child is a bare non-PK graft relation
    * (optionally under cardinality-preserving projections). */
  private def countableFiles(plan: LogicalPlan)
      : Option[Seq[graft.meta.DataFileInfo]] = plan match {
    case p: Project => countableFiles(p.child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTableV2 =>
        t.snapshotOpt.filterNot(_.tableInfo.hasPrimaryKey).map(_.files)
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(c: Count, _, false, None, _), _) =>
      c.children.forall {
        case l: Literal => l.value != null
        case _ => false
      }
    case _ => false
  }
}
