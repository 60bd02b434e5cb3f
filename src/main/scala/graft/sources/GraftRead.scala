package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{DataFileInfo, Snapshot, SnapshotManagement}

/** Programmatic readers over Graft tables. */
object GraftRead {

  /** Latest-snapshot read (same as `spark.read.format("graft").load`). */
  def read(spark: SparkSession, path: String): DataFrame =
    relationFor(spark, new GraftTableV2(spark, SnapshotManagement.normalize(path)))

  /** Pinned read over an explicit snapshot + file list — used by
    * update/delete/compaction so the rewrite sees exactly the files the
    * commit will expire. `options` pass scan options (e.g. the merge-
    * operator assignment for compaction-with-operators). */
  def readFiles(
      spark: SparkSession, path: String, snapshot: Snapshot,
      files: Seq[DataFileInfo],
      options: Map[String, String] = Map.empty): DataFrame = {
    val pinnedSnap = snapshot.copy(files = files)
    relationFor(spark,
      new GraftTableV2(spark, SnapshotManagement.normalize(path),
        pinned = Some(pinnedSnap)), options)
  }

  private def relationFor(
      spark: SparkSession, table: GraftTableV2,
      options: Map[String, String] = Map.empty): DataFrame =
    SparkShims.ofRows(spark,
      DataSourceV2Relation.create(table, None, None,
        new CaseInsensitiveStringMap(
          scala.jdk.CollectionConverters.MapHasAsJava(options).asJava)))
}
