package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Literal, NamedExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.DataFileInfo
import graft.sources.{FileStats, GraftFileIndex, GraftTableV2}

/** Answers bare aggregates over a graft table from manifest statistics —
  * zero tasks, zero I/O (the Delta `OptimizeMetadataOnlyDeltaQuery`
  * technique, extended to MIN/MAX/COUNT(col)): every committed file
  * records footer row counts, per-column min/max, and null counts, so
  * the classic dashboard probes collapse to driver-side arithmetic:
  *
  *  - `COUNT(*)`     = sum of file row counts;
  *  - `COUNT(col)`   = sum of (rows - nulls(col));
  *  - `MIN/MAX(col)` = min of file mins / max of file maxes — for
  *    integer-family, date, timestamp, boolean, and string columns
  *    (floating point excluded: parquet omits stats around NaN and the
  *    ±0.0 ordering is writer-dependent, so a metadata answer could
  *    disagree with a scan);
  *  - a `WHERE` on RANGE-PARTITION columns only restricts the file set
  *    (partition predicate evaluated against manifest partition values,
  *    interpreted, no job).
  *
  * Strict scope keeps the rewrite exact: empty grouping; non-distinct,
  * unfiltered aggregate calls; bare relation under projections; NO
  * primary key (merge-on-read dedups keys, so file counts overcount and
  * a deleted-then-reinserted key's extremes may live in superseded
  * versions); every live file must carry the needed stat — files written
  * with stats disabled, or holding no verdict for a column (e.g. NaN),
  * fall back to the scan. At 100 TB this turns the most common probes
  * from full-table scans into metadata lookups.
  */
case class OptimizeMetadataOnlyCount(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption("spark.graft.stats.metadataOnlyCount.enabled")
      .forall(_.toBoolean)
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
        statableFiles(child) match {
          case Some((files, schema)) =>
            // EXPRID guard (mirrors the Filter case): every attribute the
            // aggregate reads must be the RELATION's own output. An
            // intermediate Project can alias a computed value under a real
            // column's NAME (`SELECT max(b) FROM (SELECT rand() AS b FROM
            // t)`); answering that from t.b's manifest stats would be a
            // wrong result, not a missed optimization.
            val fromRelation = relationNode(child).exists(r =>
              aggExprs.forall(_.references.subsetOf(r.outputSet)))
            val answers =
              if (fromRelation) aggExprs.map(answer(_, files, schema))
              else Seq(None)
            if (answers.forall(_.isDefined)) {
              LocalRelation(agg.output,
                Seq(InternalRow.fromSeq(answers.map(_.get))))
            } else agg
          case _ => agg
        }
    }
  }

  /** The live file list + data schema IF the child is a bare non-PK graft
    * relation under cardinality-preserving projections, optionally behind
    * ONE filter touching only range-partition columns (which restricts
    * the file set instead of blocking the rewrite). */
  private def statableFiles(plan: LogicalPlan)
      : Option[(Seq[DataFileInfo], StructType)] = plan match {
    case p: Project => statableFiles(p.child)
    case f: Filter =>
      statableFiles(f.child).flatMap { case (files, schema) =>
        relationNode(f.child).flatMap { r =>
          relationInfo(f.child).flatMap { ti =>
            val rangeSet = ti.rangeColumns.map(_.toLowerCase).toSet
            // deterministic only: rand() < 0.5 carries no references, and a
            // plan-time evaluation would collapse a per-row sample into an
            // all-or-nothing per-partition verdict.
            // References resolve by EXPRID against the RELATION's own
            // output: an intermediate Project computing or renaming a
            // column (e.g. `SELECT rand() AS country`) mints a fresh
            // exprId, so a filter over the shadowing alias bails out here
            // instead of being mis-evaluated against manifest partition
            // values.
            val refs = f.condition.references
            if (f.condition.deterministic && refs.nonEmpty &&
                refs.subsetOf(r.outputSet) &&
                refs.forall(a => rangeSet.contains(a.name.toLowerCase)))
              partitionMatches(f.condition, ti).map(keep =>
                (files.filter(keep), schema))
            else None
          }
        }
      }
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTableV2 =>
        t.snapshotOpt.filterNot(_.tableInfo.hasPrimaryKey)
          .map(s => (s.files, s.tableInfo.dataSchema))
      case _ => None
    }
    case _ => None
  }

  private def relationInfo(plan: LogicalPlan): Option[graft.meta.TableInfo] =
    plan match {
      case p: Project => relationInfo(p.child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTableV2 => t.snapshotOpt.map(_.tableInfo)
        case _ => None
      }
      case _ => None
    }

  /** The underlying graft relation node (for exprId-level resolution). */
  private def relationNode(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan match {
      case p: Project => relationNode(p.child)
      case f: Filter => relationNode(f.child)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
        Some(r)
      case _ => None
    }

  /** Interpreted per-file partition-predicate evaluator (no Spark job:
    * partition values are manifest metadata). None = predicate shape not
    * evaluable (unknown column, cast failure) -> no rewrite. */
  private def partitionMatches(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      ti: graft.meta.TableInfo): Option[DataFileInfo => Boolean] =
    try {
      val pschema = ti.rangePartitionSchema
      val bound = cond.transform {
        case a: AttributeReference =>
          val idx = pschema.fields.indexWhere(_.name.equalsIgnoreCase(a.name))
          if (idx < 0) return None
          BoundReference(idx, pschema.fields(idx).dataType, nullable = true)
        case u: UnresolvedAttribute => return None
      }
      val pred = Predicate.createInterpreted(bound)
      pred.initialize(0)
      val tz = org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(spark).sessionState.conf.sessionLocalTimeZone
      // one evaluation per distinct range key, reused across its files
      val byKey = scala.collection.mutable.Map.empty[String, Boolean]
      Some { f =>
        byKey.getOrElseUpdate(f.rangeKey, {
          val row = InternalRow.fromSeq(pschema.fields.toSeq.map(sf =>
            GraftFileIndex.castPartitionValue(
              f.partitionValues.getOrElse(sf.name, null), sf, tz)))
          pred.eval(row)
        })
      }
    } catch { case _: Exception => None }

  /** Metadata answer for one output expression; None = not answerable. */
  private def answer(
      e: NamedExpression, files: Seq[DataFileInfo],
      schema: StructType): Option[Any] = e match {
    case Alias(l: Literal, _) => Some(l.value)
    case Alias(AggregateExpression(c: Count, _, false, None, _), _)
        if c.children.forall { case l: Literal => l.value != null; case _ => false } =>
      // deletion vectors stay metadata-only: COUNT(*) sums live rows
      if (files.forall(_.numRecords >= 0L)) Some(files.map(_.liveRecords).sum)
      else None
    case Alias(AggregateExpression(c: Count, _, false, None, _), _) =>
      c.children match {
        case Seq(a: AttributeReference) =>
          // COUNT(col) is unanswerable for a DV'd file: how many of its
          // deleted rows were null in `col` is not recorded
          val key = statKeyIn(files, a.name)
          if (files.forall(f => f.numRecords >= 0L && !f.hasDv &&
              key.exists(f.nullCounts.contains)))
            Some(files.map(f => f.numRecords - f.nullCounts(key.get)).sum)
          else None
        case _ => None
      }
    case Alias(AggregateExpression(m: Min, _, false, None, _), _) =>
      extremum(m.child, files, schema, useMax = false)
    case Alias(AggregateExpression(m: Max, _, false, None, _), _) =>
      extremum(m.child, files, schema, useMax = true)
    case _ => None
  }

  /** Manifest key for `col` (written-schema case), if any file has one —
    * per-file resolution delegated to [[FileStats.statKey]]. */
  private def statKeyIn(files: Seq[DataFileInfo], col: String): Option[String] =
    files.iterator.flatMap(FileStats.statKey(_, col)).nextOption()

  private def extremum(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      files: Seq[DataFileInfo], schema: StructType,
      useMax: Boolean): Option[Any] = child match {
    case a: AttributeReference if minMaxSafe(a.dataType) =>
      // a deletion vector invalidates min/max: the extremum row may be
      // among the deleted ones (stats describe the PHYSICAL file)
      if (files.exists(_.hasDv)) return None
      val key = statKeyIn(files, a.name).getOrElse(return None)
      // a file must either contribute a verdict or provably hold no
      // non-null value for the column (all-null or empty)
      val contributions = Seq.newBuilder[String]
      files.foreach { f =>
        val m = (if (useMax) f.maxValues else f.minValues).get(key)
        m match {
          case Some(v) => contributions += v
          case None =>
            val allNull = f.numRecords == 0L ||
              (f.numRecords > 0L && f.nullCounts.get(key).contains(f.numRecords))
            if (!allNull) return None
        }
      }
      val vals = contributions.result()
      if (vals.isEmpty) Some(null) // min/max over no non-null rows
      else {
        // FileStats owns the manifest-encoding order (UTF-8 byte order for
        // strings) — one comparator for skipping AND metadata answers
        val pick = vals.reduce((x, y) =>
          if (FileStats.statLess(x, y, a.dataType) != useMax) x else y)
        Some(internalValue(pick, a.dataType))
      }
    case _ => None
  }

  /** Floating point excluded (NaN/±0.0); see class doc. */
  private def minMaxSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Manifest-encoded stat -> catalyst internal value of `dt`. */
  private def internalValue(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toLong.toByte
    case ShortType => s.toLong.toShort
    case IntegerType | DateType => s.toLong.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case BooleanType => s.toBoolean
    case StringType => UTF8String.fromString(s)
    case _ => throw new IllegalStateException(s"unexpected type $dt")
  }
}
