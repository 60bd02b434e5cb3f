package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.commands._
import graft.meta.{Snapshot, SnapshotManagement}
import graft.sources.GraftRead

/** User-facing table handle (reference `tables/StarTable.scala`):
  * {{{
  *   val t = GraftTable.forPath(spark, "/data/events")
  *   t.upsert(df)
  *   t.update(col("x") > 1, Map("y" -> lit(0)))
  *   t.delete(col("x") === 42)
  *   t.compaction()
  *   t.toDF.filter(...)
  * }}}
  */
class GraftTable private (spark: SparkSession, val path: String) {

  def toDF: DataFrame = GraftRead.read(spark, path)

  def snapshot: Snapshot = SnapshotManagement.snapshot(path)

  /** Commit history, newest first: (version, commitType, timestamp,
    * addedFiles, removedFiles). */
  def history(): DataFrame = {
    import spark.implicits._
    val store = graft.meta.MetaStore.fs
    val latest = store.latestVersion(path)
    (0L to latest).map { v =>
      val entries = store.read(path, v)
      val info = entries.flatMap(_.commit).headOption
      (v, info.map(_.commitType).getOrElse(""),
        info.map(_.timestamp).getOrElse(0L),
        entries.count(_.add.isDefined), entries.count(_.remove.isDefined))
    }.sortBy(-_._1)
      .toDF("version", "commitType", "timestamp", "addedFiles", "removedFiles")
  }

  /** Change Data Feed over `[startVersion, endVersion]` (endVersion = -1 →
    * latest): row-level changes with `_change_type` / `_commit_version` /
    * `_commit_timestamp` columns. See [[ChangeFeed]] for per-commit-type
    * semantics. */
  def changes(startVersion: Long, endVersion: Long = -1L): DataFrame =
    ChangeFeed.changes(spark, path, startVersion, endVersion)

  /** Merge-on-read upsert; source must contain the table's PK columns and
    * may carry any column subset. `mode = "merge"` rewrites base files via
    * a full-outer join instead of appending delta files. `condition` (a
    * range-partition predicate, e.g. `"dt = '2020-11-01'"`) scopes a
    * merge-mode rewrite to the matching partitions — at scale a
    * one-partition upsert must not rewrite the whole table (reference
    * `UpsertCommand` condition support). */
  def upsert(source: DataFrame, mode: String = "delta",
      condition: Option[String] = None): Unit =
    UpsertCommand.run(spark, path, source,
      Map("mode" -> mode) ++ condition.map("condition" -> _))

  def update(condition: Column, set: Map[String, Column]): Unit =
    UpdateCommand.run(spark, path, condition, set)

  def updateExpr(condition: String, set: Map[String, String]): Unit =
    UpdateCommand.run(spark, path,
      org.apache.spark.sql.functions.expr(condition),
      set.map { case (k, v) => k -> org.apache.spark.sql.functions.expr(v) })

  def delete(condition: Column): Unit = DeleteCommand.run(spark, path, condition)

  def deleteExpr(condition: String): Unit =
    delete(org.apache.spark.sql.functions.expr(condition))

  /** Merge delta files into deduplicated base files. `mergeOperators`
    * (column -> operator name) materializes operator results into the
    * rewritten files (reference `compaction(mergeOperatorInfo)`). */
  def compaction(force: Boolean = true, partitionPredicate: Option[String] = None,
      mergeOperators: Map[String, String] = Map.empty): Unit =
    CompactionCommand.run(spark, path, force, partitionPredicate,
      mergeOperators = mergeOperators)

  /** Rewrite the table (or the matching partitions) clustered on the
    * Morton curve of `cols`, so manifest min/max stats prune filters on
    * every listed column (non-PK tables; see [[graft.commands.ZOrder]]). */
  def zOrder(cols: Seq[String], partitionPredicate: Option[String] = None): Unit =
    CompactionCommand.run(spark, path, force = true, partitionPredicate,
      zOrderBy = cols)

  /** Rewind the table to `version` with one metadata-only commit (files
    * are re-referenced, not rewritten; lineage preserved — the restore is
    * itself a new commit). Fails if a needed file was vacuumed. Returns
    * the restore commit's version. */
  def restore(version: Long): Long = RestoreCommand.run(spark, path, version)

  /** Rewind to the newest version committed at or before `timestamp`
    * (accepts the same forms as the `timestampAsOf` read option: timestamp
    * strings, yyyyMMdd dates, epoch millis). */
  def restoreToTimestamp(timestamp: String): Long = {
    val snap = SnapshotManagement.snapshotAtTimestamp(path,
      graft.sources.GraftTableV2.parseTs(spark, timestamp))
    restore(snap.version)
  }

  /** Remove files no longer referenced by the latest snapshot. */
  def cleanup(retainMillis: Long = 5L * 3600 * 1000, dryRun: Boolean = false): Seq[String] =
    CleanupCommand.run(spark, path, retainMillis, dryRun)

  def dropTable(): Unit = DropCommands.dropTable(path)

  def dropPartition(predicate: String): Unit =
    DropCommands.dropPartition(spark, path, predicate)
}

object GraftTable {
  def forPath(spark: SparkSession, path: String): GraftTable =
    new GraftTable(spark, SnapshotManagement.normalize(path))

  /** Resolve a catalog table or view NAME to its graft table (reference
    * `tables/StarTable.scala` `forName`). Works for tables registered
    * through `GraftCatalog` and for temp views over graft reads — anything
    * whose analyzed plan bottoms out in exactly one graft relation. */
  def forName(spark: SparkSession, name: String): GraftTable = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    // suppress the MV rewrite: a fresh covering view would otherwise
    // substitute its own scan here and DML through the returned handle
    // would mutate the VIEW's files instead of the base table
    val plan = graft.mv.RewriteQueryByMaterialView.withoutRewrite {
      castToImpl(spark.table(name)).queryExecution.analyzed
    }
    val paths = plan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftTableV2] =>
        r.table.asInstanceOf[graft.sources.GraftTableV2].path
    }.distinct
    paths match {
      case Seq(p) => forPath(spark, p)
      case Seq() => throw new IllegalArgumentException(
        s"$name does not resolve to a graft table")
      case many => throw new IllegalArgumentException(
        s"$name resolves to ${many.length} graft tables; use forPath")
    }
  }

  def exists(path: String): Boolean =
    SnapshotManagement.exists(SnapshotManagement.normalize(path))
}
