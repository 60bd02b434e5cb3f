package graft.rules

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, logical}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, Join, JoinHint, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._

/** Routes SQL `MERGE INTO` on graft PRIMARY-KEY tables to the engine's
  * delta upsert (the reference's merge primitive is exactly its upsert,
  * `commands/UpsertCommand.scala:107-153`; SQL MERGE is the standard way
  * to spell it). The supported shape is the canonical keyed merge:
  *
  * {{{
  * MERGE INTO t USING s ON t.pk1 = <src expr> [AND t.pk2 = ...]
  * WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ...
  * WHEN NOT MATCHED [AND c] THEN INSERT (cols...) VALUES (...)
  * }}}
  *
  * Execution: ONE left-outer join of the source against the target's
  * merged state evaluates every clause (first-true-wins, per the SQL
  * ordered-clause rule); the surviving rows — updated images of matched
  * rows plus insert images of unmatched ones — commit as ONE delta-upsert
  * (last-wins merge-on-read). Rows no clause touches are simply not
  * emitted, so the target's other rows never rewrite. Source rows that
  * match the SAME target key fail loudly (SQL's multiple-match error) —
  * last-wins would silently pick one.
  *
  * Rejected loudly (not silently mis-executed): non-PK targets (no key to
  * merge on), WHEN MATCHED THEN DELETE (PK deletes rewrite buckets — use
  * DELETE), WHEN NOT MATCHED BY SOURCE, ON conditions beyond a PK-equality
  * conjunction, subqueries, nondeterministic expressions, assignments to
  * PK/partition columns, and nested-field assignments.
  */
case class ResolveGraftMerge(spark: SparkSession) extends Rule[LogicalPlan] {

  // Vanilla Spark resolves MergeIntoTable references only for tables
  // implementing SupportsRowLevelOperations — for everything else the node
  // reaches CheckAnalysis unresolved with a misleading "column cannot be
  // resolved" error. So this rule matches the merge as soon as BOTH sides
  // are resolved and resolves condition/action expressions itself (the
  // same move Delta's analysis extension makes).
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved =>
      graftPathOf(m.targetTable) match {
        case Some((path, info)) => toCommand(m, path, info)
        case None => m
      }
  }

  /** Fully resolve `e` against `plans` by running the whole analyzer over a
    * throwaway projection — functions, casts and type coercion included. */
  private def resolveExpr(e: Expression, plans: Seq[LogicalPlan]): Expression = {
    if (e.resolved) return e
    val base = plans.reduceLeft[LogicalPlan](
      (l, r) => Join(l, r, Inner, None, JoinHint.NONE))
    val fake = Project(Seq(Alias(e, "__gm_resolve")()), base)
    val analyzed = spark.sessionState.analyzer.execute(fake)
    analyzed match {
      case Project(Seq(a: Alias), _) if a.child.resolved => a.child
      case _ => fail(s"cannot resolve: ${e.sql}")
    }
  }

  private def graftPathOf(table: LogicalPlan)
      : Option[(String, graft.meta.TableInfo)] = table match {
    case SubqueryAlias(_, child) => graftPathOf(child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case g: graft.sources.GraftTableV2 =>
          graft.meta.SnapshotManagement.snapshotOpt(g.path)
            .map(s => (g.path, s.tableInfo))
        case _ => None
      }
    case _ => None
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"MERGE INTO graft table: $msg")

  private def toCommand(
      m: MergeIntoTable, path: String, info: graft.meta.TableInfo): LogicalPlan = {
    if (!info.hasPrimaryKey)
      fail("the target is not a primary-key table — merge pairs rows by " +
        "key; use upsert tables (hashPartitions) or UPDATE/DELETE instead")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    if (m.schemaEvolutionEnabled)
      fail("WITH SCHEMA EVOLUTION is not supported")

    val targetAttrs = m.targetTable.outputSet
    val sourceAttrs = m.sourceTable.outputSet
    val both = Seq(m.sourceTable, m.targetTable)
    def render(e0: Expression, scope: Seq[LogicalPlan]): String = {
      val e = resolveExpr(e0, scope)
      if (e.exists(_.isInstanceOf[SubqueryExpression])) fail(s"subqueries: ${e.sql}")
      if (!e.deterministic) fail(s"nondeterministic expressions: ${e.sql}")
      e.transform {
        case ar: AttributeReference if targetAttrs.contains(ar) =>
          ar.withQualifier(Seq("__gt"))
        case ar: AttributeReference if sourceAttrs.contains(ar) =>
          ar.withQualifier(Seq("__gs"))
      }.sql
    }

    // ON must be exactly a PK-equality conjunction (each conjunct pairs one
    // target PK column with a source-only expression, all PKs covered) —
    // anything looser breaks the matched ⇒ same-key mapping onto upsert
    val onResolved = resolveExpr(m.mergeCondition, both)
    val conjuncts = graft.commands.RewriteSupport.splitConjuncts(onResolved)
    val pkSet = info.hashColumns.map(_.toLowerCase).toSet
    val covered = scala.collection.mutable.Set.empty[String]
    // source-side key expressions, one per PK conjunct: the duplicate-match
    // guard windows over these (never null-skewed — unmatched rows keep
    // their own key values, unlike the target PK which is null for them)
    val srcKeys = scala.collection.mutable.ArrayBuffer.empty[String]
    conjuncts.foreach {
      case EqualTo(l, r) =>
        def targetPk(e: Expression): Option[String] = e match {
          case ar: AttributeReference if targetAttrs.contains(ar) &&
            pkSet.contains(ar.name.toLowerCase) => Some(ar.name.toLowerCase)
          case _ => None
        }
        def sourceOnly(e: Expression): Boolean =
          e.references.forall(sourceAttrs.contains)
        (targetPk(l), targetPk(r)) match {
          case (Some(c), _) if sourceOnly(r) =>
            covered += c; srcKeys += render(r, Seq(m.sourceTable))
          case (_, Some(c)) if sourceOnly(l) =>
            covered += c; srcKeys += render(l, Seq(m.sourceTable))
          case _ => fail("the ON condition must be a conjunction of " +
            s"`target.pkCol = <source expression>`; got: ${onResolved.sql}")
        }
      case other => fail("the ON condition must be a conjunction of " +
        s"`target.pkCol = <source expression>`; got: ${other.sql}")
    }
    if (!pkSet.subsetOf(covered))
      fail(s"the ON condition must cover every primary-key column " +
        s"(${info.hashColumns.mkString(", ")}); covered: ${covered.mkString(", ")}")

    val layoutCols = (info.hashColumns ++ info.rangeColumns).map(_.toLowerCase).toSet
    def renderAssignments(
        as: Seq[Assignment], isUpdate: Boolean): Seq[(String, String)] =
      as.map { a =>
        val key = resolveExpr(a.key, Seq(m.targetTable)) match {
          case ar: AttributeReference => ar.name
          case other => fail(s"nested-field assignment: ${other.sql}")
        }
        if (isUpdate && layoutCols.contains(key.toLowerCase))
          fail(s"cannot UPDATE primary-key/partition column $key")
        // UPDATE values see both sides; INSERT values the source only
        key -> render(a.value, if (isUpdate) both else Seq(m.sourceTable))
      }

    // `SET *` / `INSERT *`: every target column from the same-named source
    // column (fails when the source lacks one — no silent null-fill)
    def starAssignments: Seq[(String, String)] =
      info.schema.fields.toSeq.map { f =>
        val v = m.sourceTable.resolve(Seq(f.name),
            spark.sessionState.conf.resolver)
          .getOrElse(fail(s"`*` needs source column ${f.name}"))
          .toAttribute
        f.name -> v.withQualifier(Seq("__gs")).sql
      }

    val matched = m.matchedActions.map {
      case UpdateAction(cond, as, _) =>
        (cond.map(render(_, both)), renderAssignments(as, isUpdate = true))
      case UpdateStarAction(cond) =>
        (cond.map(render(_, both)),
          starAssignments.filterNot(a => layoutCols.contains(a._1.toLowerCase)))
      case _: DeleteAction =>
        fail("WHEN MATCHED THEN DELETE is not supported on primary-key " +
          "tables (deletes rewrite buckets) — run DELETE separately")
      case other => fail(s"unsupported matched action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertAction(cond, as) =>
        (cond.map(render(_, Seq(m.sourceTable))),
          renderAssignments(as, isUpdate = false))
      case InsertStarAction(cond) =>
        (cond.map(render(_, Seq(m.sourceTable))), starAssignments)
      case other => fail(s"unsupported not-matched action: $other")
    }
    GraftMergeIntoCommand(path, m.sourceTable, render(onResolved, both),
      srcKeys.toSeq, matched, notMatched)
  }
}

/** V1 command executing the merge at runtime: ONE join of source against the
  * target's merged state feeds both the duplicate-match guard and the emit
  * projection — the guard is a window count over the source-side join keys
  * with a conditional `raise_error` in the output, not a second action
  * (a separate count() would re-execute the dominant join at scale). */
case class GraftMergeIntoCommand(
    path: String,
    source: LogicalPlan,
    onSql: String,
    srcKeys: Seq[String],
    matched: Seq[(Option[String], Seq[(String, String)])],
    notMatched: Seq[(Option[String], Seq[(String, String)])])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.expressions.Window
    val info = graft.meta.SnapshotManagement
      .snapshot(graft.meta.SnapshotManagement.normalize(path)).tableInfo
    val src = org.apache.spark.sql.graft.SparkShims
      .ofRows(session, source).alias("__gs")
    val tgt = graft.sources.GraftRead.read(session, path).alias("__gt")
    val joined = src.join(tgt, expr(onSql), "left_outer")
    val isMatched = col(s"__gt.${info.hashColumns.head}").isNotNull

    // SQL's multiple-match rule: >1 source row pairing with one target key
    // is an error (upsert's last-wins would silently pick one). Windowing
    // over the SOURCE-side key expressions keeps unmatched rows spread
    // across their own keys (the target PK is null for all of them) and
    // lets the window reuse the join's partitioning where the planner can.
    val dupWindow = Window.partitionBy(srcKeys.map(expr): _*)
    val matchCnt = sum(when(isMatched, lit(1L)).otherwise(lit(0L)))
      .over(dupWindow)

    // one struct per clause, first-true-wins; null = no clause applied
    val schema = tgt.schema
    def image(sets: Map[String, String], forUpdate: Boolean): Column =
      struct(schema.fields.toSeq.map { f =>
        sets.collectFirst { case (k, v) if k.equalsIgnoreCase(f.name) =>
          expr(v).cast(f.dataType)
        }.getOrElse(
          if (forUpdate) col(s"__gt.${f.name}")
          else lit(null).cast(f.dataType)
        ).as(f.name)
      }: _*)
    val clauses: Seq[(Column, Column)] =
      matched.map { case (cond, sets) =>
        (isMatched && cond.map(expr).getOrElse(lit(true)),
          image(sets.toMap, forUpdate = true))
      } ++ notMatched.map { case (cond, sets) =>
        (!isMatched && cond.map(expr).getOrElse(lit(true)),
          image(sets.toMap, forUpdate = false))
      }
    val structType = org.apache.spark.sql.types.StructType(schema.fields)
    val picked = clauses.foldRight(lit(null).cast(structType)) {
      case ((c, img), rest) => when(c, img).otherwise(rest)
    }
    // the guard rides the emit projection: evaluated per row, throws only
    // when a duplicate actually exists (branch never taken otherwise)
    val guarded = when(col("__gm_dup") > 1, raise_error(lit(
        "MERGE INTO: multiple source rows matched the same target row; " +
        "deduplicate the source on the join keys first")).cast(structType))
      .otherwise(picked)
    val out = joined.withColumn("__gm_dup", matchCnt)
      .select(guarded.as("__gm"))
      .filter(col("__gm").isNotNull)
      .select(col("__gm.*"))
    graft.commands.UpsertCommand.run(session, path, out)
    Seq.empty
  }
}
