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
  * WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ... | DELETE
  * WHEN NOT MATCHED [AND c] THEN INSERT (cols...) VALUES (...)
  * WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE ... | DELETE
  * }}}
  * plus `WITH SCHEMA EVOLUTION` (new assignment/source-star columns join
  * the target schema through the delta write's mergeSchema path).
  *
  * Execution: ONE join of the source against the target's merged state
  * evaluates every clause (first-true-wins, per the SQL ordered-clause
  * rule); the surviving rows — updated images of matched rows, insert
  * images of unmatched ones, and TOMBSTONE marker rows (key +
  * `__graft_deleted=true`, see [[graft.meta.Tombstones]]) for DELETE
  * clauses — commit as ONE delta-upsert (last-wins merge-on-read). The
  * join is left-outer normally and full-outer only when a NOT MATCHED BY
  * SOURCE clause needs the target-only rows. Rows no clause touches are
  * simply not emitted, so the target's other rows never rewrite; a DELETE
  * costs one marker row, never a bucket rewrite. Source rows that match
  * the SAME target key fail loudly (SQL's multiple-match error) —
  * last-wins would silently pick one.
  *
  * UPDATE assignments may address nested struct fields (`SET props.a =
  * ...`) — the emit projection starts from the target's old struct value
  * and writes each assigned field in place via `withField`, the same
  * mechanism SQL UPDATE uses. Rejected loudly (not silently mis-executed):
  * non-PK targets (no key to merge on), ON conditions beyond a PK-equality
  * conjunction, subqueries, nondeterministic expressions, assignments to
  * PK/partition columns, nested-field assignment in INSERT, and schema
  * evolution of a nested field.
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
    // WITH SCHEMA EVOLUTION: assignment keys may name columns absent from
    // the target (they join the schema through the delta write's mergeSchema
    // path) and `SET *`/`INSERT *` also carry source-only columns.
    // `withSchemaEvolution` is the raw parser flag — the derived
    // `schemaEvolutionEnabled` requires V2 row-level-operation capabilities
    // this table intentionally routes around.
    val evolve = m.withSchemaEvolution

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
    // (pk column, source-side key expression) pairs, one per PK conjunct:
    // the duplicate-match guard windows over the source keys (never
    // null-skewed — unmatched rows keep their own key values, unlike the
    // target PK which is null for them)
    val srcKeys = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
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
            covered += c; srcKeys += (c -> render(r, Seq(m.sourceTable)))
          case (_, Some(c)) if sourceOnly(l) =>
            covered += c; srcKeys += (c -> render(l, Seq(m.sourceTable)))
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
    val targetCols = info.schema.fieldNames.map(_.toLowerCase).toSet
    // a resolved assignment key is either a column attribute or a
    // GetStructField chain over one (`SET props.a.b = ...`) — the chain
    // renders as the dotted path, and its successful RESOLUTION already
    // proves every step of the path exists in the target schema
    def keyPath(e: Expression): Option[String] = e match {
      case ar: AttributeReference => Some(ar.name)
      case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
        keyPath(g.child).map(p => s"$p.${g.extractFieldName}")
      case _ => None
    }
    // dotted path addressing a nested field (vs a literal-dot column name)
    def isNestedKey(k: String): Boolean =
      k.contains(".") && !targetCols.contains(k.toLowerCase)
    // names the target side may legitimately be qualified by (its alias /
    // table name): a TWO-part evolution key must use one of these as its
    // head, or `SET tt.newcol = 1` with a typo'd alias would silently
    // create (or update) `newcol` under the wrong qualifier
    lazy val targetQualifiers: Set[String] =
      (m.targetTable.output.flatMap(_.qualifier) ++
        m.targetTable.collect {
          case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
            s.alias
        }).map(_.toLowerCase).toSet
    def renderAssignments(
        as: Seq[Assignment], isUpdate: Boolean,
        scope: Seq[LogicalPlan]): Seq[(String, String)] = {
      val rendered = as.map { a =>
        val key = a.key match {
          // a name the target can't resolve is a NEW column when evolution
          // is on — its spelling is the key (single-part names only; a
          // nested path can't create a column)
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if evolve &&
              m.targetTable.resolve(u.nameParts,
                spark.sessionState.conf.resolver).isEmpty =>
            if (u.nameParts.size > 2 ||
                (u.nameParts.size == 2 &&
                  targetCols.contains(u.nameParts.head.toLowerCase)))
              fail(s"schema evolution cannot create the nested field " +
                s"${u.sql}; add the field with ALTER TABLE first")
            if (u.nameParts.size == 2 &&
                !targetQualifiers.contains(u.nameParts.head.toLowerCase))
              fail(s"cannot resolve ${u.sql} in MERGE assignment: " +
                s"'${u.nameParts.head}' is neither a target column nor " +
                "the target's alias")
            u.nameParts.last
          case k => resolveExpr(k, Seq(m.targetTable)) match {
            case ar: AttributeReference => ar.name
            case other => keyPath(other).getOrElse(
              fail(s"unsupported assignment target: ${other.sql}"))
          }
        }
        // nested-field assignment is legal in INSERT too: the emitted
        // image composes the whole column from an all-null struct shell
        // plus the assigned paths (image() below) — there is no target
        // old value to start from on the not-matched side
        // layout guard target: the whole key when it IS a column (covers
        // literal-dot column names); the path head when it is a nested
        // field (layout columns are scalar, so only the head can collide)
        val guardKey =
          if (isNestedKey(key)) key.split("\\.").head else key
        if (isUpdate && layoutCols.contains(guardKey.toLowerCase))
          fail(s"cannot UPDATE primary-key/partition column $guardKey")
        key -> render(a.value, scope)
      }
      // within one clause: no duplicate targets, and no assignment to both
      // a path and one of its prefixes (`SET props = ..., props.a = ...`)
      val keys = rendered.map(_._1.toLowerCase)
      keys.diff(keys.distinct).distinct.foreach(k =>
        fail(s"duplicate assignment to $k in one clause"))
      for (k1 <- keys; k2 <- keys if k2.startsWith(k1 + "."))
        fail(s"conflicting assignments to $k1 and $k2 in one clause")
      rendered
    }

    // `SET *` / `INSERT *`: every target column from the same-named source
    // column (fails when the source lacks one — no silent null-fill).
    // Under WITH SCHEMA EVOLUTION, source-only columns ride along as new
    // target columns.
    def starAssignments: Seq[(String, String)] = {
      val resolver = spark.sessionState.conf.resolver
      val base = info.schema.fields.toSeq.map { f =>
        val v = m.sourceTable.resolve(Seq(f.name), resolver)
          .getOrElse(fail(s"`*` needs source column ${f.name}"))
          .toAttribute
        f.name -> v.withQualifier(Seq("__gs")).sql
      }
      val extra = if (!evolve) Nil else
        m.sourceTable.output
          .filterNot(a => info.schema.fieldNames.exists(resolver(_, a.name)))
          .map(a => a.name -> a.withQualifier(Seq("__gs")).sql)
      base ++ extra
    }

    val matched = m.matchedActions.map {
      case UpdateAction(cond, as, _) =>
        MergeClause(cond.map(render(_, both)), MergeClause.UPDATE,
          renderAssignments(as, isUpdate = true, both))
      case UpdateStarAction(cond) =>
        MergeClause(cond.map(render(_, both)), MergeClause.UPDATE,
          starAssignments.filterNot(a => layoutCols.contains(a._1.toLowerCase)))
      case DeleteAction(cond) =>
        // a PK delete is one tombstone marker row in the same delta commit
        MergeClause(cond.map(render(_, both)), MergeClause.DELETE, Nil)
      case other => fail(s"unsupported matched action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertAction(cond, as) =>
        MergeClause(cond.map(render(_, Seq(m.sourceTable))), MergeClause.INSERT,
          renderAssignments(as, isUpdate = false, Seq(m.sourceTable)))
      case InsertStarAction(cond) =>
        MergeClause(cond.map(render(_, Seq(m.sourceTable))), MergeClause.INSERT,
          starAssignments)
      case other => fail(s"unsupported not-matched action: $other")
    }
    // NOT MATCHED BY SOURCE rows exist only on the target side — clause
    // conditions and update values may reference target columns only
    val bySource = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, as, _) =>
        MergeClause(cond.map(render(_, Seq(m.targetTable))), MergeClause.UPDATE,
          renderAssignments(as, isUpdate = true, Seq(m.targetTable)))
      case DeleteAction(cond) =>
        MergeClause(cond.map(render(_, Seq(m.targetTable))),
          MergeClause.DELETE, Nil)
      case other => fail(s"unsupported not-matched-by-source action: $other")
    }
    GraftMergeIntoCommand(path, m.sourceTable, render(onResolved, both),
      srcKeys.toSeq, matched, notMatched, bySource, evolve)
  }
}

/** One rendered MERGE clause: SQL-text condition (already qualified with
  * `__gs`/`__gt`), the action kind, and the rendered SET/VALUES pairs. */
case class MergeClause(
    cond: Option[String], kind: String, sets: Seq[(String, String)])

object MergeClause {
  val UPDATE = "update"
  val INSERT = "insert"
  val DELETE = "delete"
}

/** V1 command executing the merge at runtime: ONE join of source against the
  * target's merged state feeds both the duplicate-match guard and the emit
  * projection — the guard is a window count over the join keys with a
  * conditional `raise_error` in the output, not a second action (a separate
  * count() would re-execute the dominant join at scale). The join is
  * left-outer unless a NOT MATCHED BY SOURCE clause exists, which needs the
  * target-only rows and upgrades it to full-outer. DELETE clauses emit
  * tombstone marker rows (target key + `__graft_deleted=true`, other
  * columns null) into the SAME delta-upsert commit; the k-way merge reader
  * applies per-row marker-reset semantics, so update/insert/delete images
  * can share one file.
  */
case class GraftMergeIntoCommand(
    path: String,
    source: LogicalPlan,
    onSql: String,
    srcKeys: Seq[(String, String)],
    matched: Seq[MergeClause],
    notMatched: Seq[MergeClause],
    bySource: Seq[MergeClause],
    evolve: Boolean = false)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.expressions.Window
    val npath = graft.meta.SnapshotManagement.normalize(path)
    // the transaction opens BEFORE the target read: the emitted images are
    // a read-modify-write over the pinned snapshot, and the guarded commit
    // below turns any concurrent touch of the written partitions into a
    // conflict. withRewriteTransaction restarts this whole body (fresh
    // pin, fresh join) on conflict, so the merge re-decides instead of
    // shadowing the concurrent writer's rows with stale full images.
    graft.meta.SnapshotManagement.withRewriteTransaction(npath) { txn =>
    val snapshot = txn.snapshotOpt.getOrElse(
      throw new graft.meta.GraftTableNotFoundException(npath))
    val info = snapshot.tableInfo
    // presence tag: under full-outer the target-only rows must be
    // distinguishable from matched rows even if every source column is
    // legitimately null — a non-null literal on the source side is the
    // only airtight signal
    val src = org.apache.spark.sql.graft.SparkShims
      .ofRows(session, source).withColumn("__gm_src", lit(true)).alias("__gs")
    val tgt = graft.sources.GraftRead
      .readFiles(session, npath, snapshot, snapshot.files).alias("__gt")
    val joinType = if (bySource.nonEmpty) "full_outer" else "left_outer"
    val joined = src.join(tgt, expr(onSql), joinType)
    val srcPresent = col("__gs.__gm_src").isNotNull
    val tgtPresent =
      col(s"__gt.`${info.hashColumns.head.replace("`", "``")}`").isNotNull
    val isMatched = srcPresent && tgtPresent

    // Multiple-row guard: >1 EMITTED row per key is an error — two matched
    // source rows both updating/deleting one target row (SQL's multiple-
    // match rule) or two unmatched source rows both inserting the same new
    // key (a PK-violation last-wins would silently swallow). Rows no
    // clause touches don't count, per the standard: extra matches are fine
    // as long as at most one row actually changes the key. The window runs
    // over the EMITTED image's own PK first: UPDATE of a PK column is
    // rejected at analysis, so for matched/by-source emissions the emitted
    // PK IS the matched target key, and for INSERT emissions it is the key
    // the row will actually land under — two unmatched source rows with
    // DIFFERENT source keys whose INSERT clauses supply the SAME explicit
    // PK value therefore collide in one partition and fail loudly instead
    // of committing a silent last-wins pair. Rows that emit nothing have a
    // null image and fall back to the source key expression (and, under
    // full-outer, the target PK); they contribute 0 to the count, so their
    // partition assignment is immaterial.
    val exactPk = (lc: String) => info.hashColumns
      .find(_.equalsIgnoreCase(lc)).getOrElse(lc)
    val keyExprs = srcKeys.map { case (pk, srcExpr) =>
      val tgtFallback =
        if (bySource.isEmpty) Nil else Seq(col(s"__gt.`${exactPk(pk)}`"))
      coalesce(col(s"__gm_pick.`${exactPk(pk)}`") +: expr(srcExpr) +:
        tgtFallback: _*) }
    val dupWindow = Window.partitionBy(keyExprs: _*)

    // one struct per clause, first-true-wins; null = no clause applied.
    // With any DELETE clause the emitted schema gains the marker column:
    // true on delete images, null elsewhere (so non-delete rows still pass
    // invariant checks and the reader treats them as plain contributions).
    val schema = tgt.schema
    val hasDelete = (matched ++ bySource).exists(_.kind == MergeClause.DELETE)
    val boolType = org.apache.spark.sql.types.BooleanType
    val keySet = (info.rangeColumns ++ info.hashColumns)
      .map(_.toLowerCase).toSet
    // WITH SCHEMA EVOLUTION: assignment keys absent from the target become
    // new columns (a dotted key whose head IS a target column addresses a
    // nested field, not a new column); the column's type is the widest
    // common type over ALL expressions assigning it — mismatched clause
    // types either widen like UNION would or fail analysis loudly, never
    // an opaque runtime cast. Clauses that don't set a new column emit
    // null there — the k-way reader skips null contributions, so untouched
    // keys keep "column absent" semantics.
    val targetLower = schema.fieldNames.map(_.toLowerCase).toSet
    def nestedKeySplit(k: String): Option[(String, Seq[String])] = {
      if (targetLower.contains(k.toLowerCase)) return None
      val parts = k.split("\\.").toSeq
      if (parts.length > 1 && targetLower.contains(parts.head.toLowerCase))
        Some((parts.head, parts.tail))
      else None
    }
    val newFields: Seq[org.apache.spark.sql.types.StructField] = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
      (matched ++ notMatched ++ bySource).foreach(_.sets.foreach {
        case (k, v) if !targetLower.contains(k.toLowerCase) &&
            nestedKeySplit(k).isEmpty =>
          if (!seen.contains(k.toLowerCase)) seen(k.toLowerCase) = k
        case _ => ()
      })
      seen.values.toSeq.map { k =>
        val types = (matched ++ notMatched ++ bySource).iterator
          .flatMap(_.sets).collect {
            case (k2, v2) if k2.equalsIgnoreCase(k) =>
              joined.select(expr(v2)).schema.head.dataType }.toSeq.distinct
        val dt = if (types.size == 1) types.head
          else org.apache.spark.sql.catalyst.analysis.TypeCoercion
            .findWiderCommonType(types).getOrElse(throw
              new UnsupportedOperationException(
                s"MERGE WITH SCHEMA EVOLUTION: clauses assign new column " +
                s"$k incompatible types " +
                s"(${types.map(_.simpleString).mkString(", ")}); cast the " +
                "assignments to one type"))
        org.apache.spark.sql.types.StructField(k, dt, nullable = true)
      }
    }
    require(evolve || newFields.isEmpty,
      s"MERGE assigns unknown column(s) ${newFields.map(_.name).mkString(", ")}")
    val allFields = schema.fields.toSeq ++ newFields
    def withMarker(fields: Seq[Column], marker: Column): Seq[Column] =
      if (hasDelete) fields :+ marker.cast(boolType).as(graft.meta.Tombstones.COL)
      else fields
    // old-value reference into the target side, backtick-escaped: a column
    // literally named `a.b` (or carrying a backtick) must resolve as ONE
    // column of __gt, not as field b of column a
    def tgtCol(name: String): Column =
      col(s"__gt.`${name.replace("`", "``")}`")
    // navigate a struct type along a (case-insensitive) nested path — the
    // analysis rule proved the path resolves, so the navigation succeeds
    def nestedType(dt: org.apache.spark.sql.types.DataType,
        path: Seq[String]): Option[org.apache.spark.sql.types.DataType] =
      path.foldLeft(Option(dt)) {
        case (Some(st: org.apache.spark.sql.types.StructType), p) =>
          st.fields.find(_.name.equalsIgnoreCase(p)).map(_.dataType)
        case _ => None
      }
    def image(sets: Map[String, String], forUpdate: Boolean): Column =
      struct(withMarker(allFields.map { f =>
        val whole = sets.collectFirst {
          case (k, v) if k.equalsIgnoreCase(f.name) => expr(v).cast(f.dataType)
        }
        // nested-field sets (`SET props.a = ...`): start from the target's
        // OLD struct value and write each assigned field in place — the
        // same withField mechanism SQL UPDATE uses (UpdateCommand.applySet)
        val nested = sets.toSeq.flatMap { case (k, v) =>
          nestedKeySplit(k) match {
            case Some((head, rest)) if head.equalsIgnoreCase(f.name) =>
              Some((rest, v))
            case _ => None
          }
        }
        // INSERT has no old target value to patch: its nested base is a
        // struct SHELL — non-null structs all the way down, null leaves —
        // because withField into a NULL (sub)struct yields null and would
        // silently swallow the assignment
        def nullShell(dt: org.apache.spark.sql.types.DataType): Column =
          dt match {
            case st: org.apache.spark.sql.types.StructType =>
              struct(st.fields.toSeq.map(sf =>
                nullShell(sf.dataType).as(sf.name)): _*)
            case other => lit(null).cast(other)
          }
        whole.orElse {
          if (nested.isEmpty) None
          else Some(nested.foldLeft(
            if (forUpdate) tgtCol(f.name) else nullShell(f.dataType)) {
            case (c, (rest, v)) =>
              val cast = nestedType(f.dataType, rest)
                .map(expr(v).cast).getOrElse(expr(v))
              c.withField(rest.mkString("."), cast)
          })
        }.getOrElse(
          if (forUpdate && targetLower.contains(f.name.toLowerCase))
            tgtCol(f.name)
          else lit(null).cast(f.dataType)
        ).as(f.name)
      }, lit(null)): _*)
    // a delete image is the target key plus the marker — nothing else
    def deleteImage: Column =
      struct(withMarker(allFields.map { f =>
        (if (keySet.contains(f.name.toLowerCase)) tgtCol(f.name)
         else lit(null).cast(f.dataType)).as(f.name)
      }, lit(true)): _*)
    def render(group: Seq[MergeClause], applies: Column): Seq[(Column, Column)] =
      group.map { cl =>
        (applies && cl.cond.map(expr).getOrElse(lit(true)),
          cl.kind match {
            case MergeClause.DELETE => deleteImage
            case MergeClause.INSERT => image(cl.sets.toMap, forUpdate = false)
            case _ => image(cl.sets.toMap, forUpdate = true)
          })
      }
    // the three groups partition the joined rows, so concatenation keeps
    // first-true-wins exact within each population
    val clauses: Seq[(Column, Column)] =
      render(matched, isMatched) ++
      render(notMatched, srcPresent && !tgtPresent) ++
      render(bySource, !srcPresent)
    val structType = org.apache.spark.sql.types.StructType(
      if (hasDelete)
        allFields :+ org.apache.spark.sql.types.StructField(
          graft.meta.Tombstones.COL, boolType, nullable = true)
      else allFields)
    val picked = clauses.foldRight(lit(null).cast(structType)) {
      case ((c, img), rest) => when(c, img).otherwise(rest)
    }
    // the guard rides the emit projection: the struct is materialized once
    // per row, the window counts the non-null (= emitted) ones per key, and
    // raise_error's branch is taken only when a real duplicate exists.
    // NULL-key emissions get their own dedicated error FIRST: a NULL source
    // key never matches anything (SQL three-valued logic), so the only way
    // a NULL lands in an emitted key is an INSERT clause producing a NULL
    // primary-key value — without this check all such rows would share one
    // window partition and misreport as "multiple source rows".
    val pkNull = info.hashColumns.map(c => col(s"__gm_pick.`$c`").isNull)
      .reduce(_ || _)
    // every emitted row counts: the window keys lead with the emitted
    // image's PK, so any two emissions of the same final key — whatever
    // their source keys were — land in one partition and duplicate
    val emitCnt = sum(when(col("__gm_pick").isNotNull, lit(1L))
      .otherwise(lit(0L))).over(dupWindow)
    val guarded = when(col("__gm_pick").isNotNull && pkNull, raise_error(lit(
        "MERGE INTO: an emitted row has a NULL primary-key value — INSERT " +
        "values must supply every primary-key column (NULL keys never " +
        "match and cannot identify a row)")).cast(structType))
      .otherwise(when(col("__gm_cnt") > 1, raise_error(lit(
        "MERGE INTO: multiple source rows update, delete, or insert the " +
        "same key; deduplicate the source on the join keys first"))
        .cast(structType))
      .otherwise(col("__gm_pick")))
    val out = joined.withColumn("__gm_pick", picked)
      .withColumn("__gm_cnt", emitCnt)
      .select(guarded.as("__gm"))
      .filter(col("__gm").isNotNull)
      .select(col("__gm.*"))
    // strictWindow when BY SOURCE clauses read the WHOLE table: their
    // conditions may depend on rows in partitions the output never
    // touches, so partition-level conflict detection is not enough
    graft.commands.UpsertCommand.runDeltaIn(session, npath, out,
      if (evolve) Map(graft.commands.WriteIntoTable.MERGE_SCHEMA -> "true")
      else Map.empty,
      txn, rewriteGuard = true, strictWindow = bySource.nonEmpty)
    }
    // merges are delta appends too: the same fan-in trigger that bounds
    // upsert stacks applies (mirrors UpsertCommand.run)
    if (session.conf.getOption("spark.graft.compaction.auto")
        .exists(_.toBoolean)) {
      graft.commands.CompactionCommand.run(session, npath, force = false)
    }
    Seq.empty
  }
}
