package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.graft.SparkShims

import graft.meta.SnapshotManagement

/** Cross-table SNAPSHOT-ISOLATED SQL: run a query with every graft
  * relation replaced by a read of a snapshot pinned NOW (immutable file
  * lists), so a multi-table query observes ONE consistent version per
  * table even while writers commit concurrently — the multi-statement
  * consistency a lakehouse loses by having no cross-table transaction.
  * A plain `spark.sql` re-resolves each table at execution and can join
  * orders@v12 against customers@v9-then-v10 across stage retries; the
  * pinned frame cannot. Non-graft relations (plain parquet, temp views
  * over non-graft sources) are left as-is — only graft tables carry the
  * version pin. This is the same machinery materialized-view rebuilds
  * use to make their recorded relation versions exact.
  *
  * Scale: pinning is O(relations) driver metadata work; the pinned read
  * is the ordinary pruned/runtime-filtered scan (a pinned file list, not
  * a frozen plan), so plan quality is unchanged. */
object SnapshotSql {

  /** Pin every ORIGINAL graft relation of `df`'s analyzed plan to a
    * snapshot taken now. Returns None when a concurrently-ALTERed table
    * makes a pinned column unresolvable (callers retry or fall back).
    * Replacement is by IDENTITY: the pinned read is itself a graft V2
    * relation, and `transform` recurses into its replacement's children —
    * matching on type alone would re-wrap the fresh read forever.
    * Relations the USER already pinned (versionAsOf / timestampAsOf time
    * travel) are left alone: re-pinning them to the latest snapshot would
    * silently serve wrong-version data — and they are immutable, so they
    * need no version entry for staleness either. Subquery plans (IN /
    * EXISTS / scalar) are walked too: a relation hiding inside a subquery
    * expression is exactly as torn-read-prone as a joined one. */
  private[graft] def tryPin(spark: SparkSession, df: DataFrame)
      : Option[(DataFrame, Map[String, Long])] = {
    val analyzed = castToImpl(df).queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    val versions = scala.collection.mutable.Map.empty[String, Long]
    val snaps = scala.collection.mutable
      .Map.empty[String, graft.meta.Snapshot]
    val targets = (analyzed +: analyzed.subqueriesAll).flatMap(_.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftTableV2] &&
            !r.table.asInstanceOf[graft.sources.GraftTableV2].isPinned => r
    })
    try {
      val pinnedPlan = analyzed.transformDownWithSubqueries {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation if targets.exists(_ eq r) =>
          val np = SnapshotManagement.normalize(
            r.table.asInstanceOf[graft.sources.GraftTableV2].path)
          val snap = snaps.getOrElseUpdate(np, SnapshotManagement.snapshot(np))
          versions(np) = snap.version
          val pinned = castToImpl(
            graft.sources.GraftRead.readFiles(spark, np, snap, snap.files))
            .queryExecution.analyzed
          val proj = r.output.map { a =>
            pinned.output.find(f => resolver(f.name, a.name)) match {
              case Some(fa) => Alias(fa, a.name)(exprId = a.exprId)
              case None => throw new NoSuchElementException(a.name)
            }
          }
          Project(proj, pinned)
      }
      Some((SparkShims.ofRows(spark, pinnedPlan), versions.toMap))
    } catch {
      case _: NoSuchElementException => None
    }
  }

  /** Run `sqlText` snapshot-isolated and also return the exact
    * (table path → version) map the frame reads — replaying the same
    * query with `versionAsOf` those versions reproduces it bit-for-bit.
    * The materialized-view rewrite is disabled inside: substituting a
    * possibly-stale view table would break the versions contract. Retries
    * when a concurrent schema change races the pin (the ALTER advances
    * the version; fresh analysis resolves against the new schema). */
  def sqlWithVersions(
      spark: SparkSession, sqlText: String, maxAttempts: Int = 3)
      : (DataFrame, Map[String, Long]) = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val df = graft.mv.RewriteQueryByMaterialView.withoutRewrite {
        spark.sql(sqlText)
      }
      tryPin(spark, df) match {
        case Some(r) => return r
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"snapshot-isolated analysis lost $maxAttempts races against " +
      "concurrent schema changes; retry when ALTERs quiesce")
  }

  /** Snapshot-isolated `spark.sql`. */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    sqlWithVersions(spark, sqlText)._1
}
