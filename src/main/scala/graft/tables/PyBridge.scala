package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Py4J-friendly entry points for the Python binding (reference
  * `python/star/tables.py:1-291` calls the JVM side the same way).
  *
  * Py4J resolves methods by exact reflected arity and speaks Java
  * collections, so this bridge exposes overloads instead of Scala default
  * arguments and accepts `java.util.Map`/nullable strings where the Scala
  * API uses Scala maps and `Option`s. It contains no logic of its own —
  * every call lands on [[GraftTable]].
  */
object PyBridge {

  def forPath(spark: SparkSession, path: String): GraftTable =
    GraftTable.forPath(spark, path)

  def forName(spark: SparkSession, name: String): GraftTable =
    GraftTable.forName(spark, name)

  def exists(path: String): Boolean = GraftTable.exists(path)

  def snapshotSql(spark: SparkSession, sqlText: String): DataFrame =
    graft.ops.SnapshotSql.sql(spark, sqlText)

  def toDF(t: GraftTable): DataFrame = t.toDF

  def history(t: GraftTable): DataFrame = t.history()

  def detail(t: GraftTable): DataFrame = t.detail()

  def partitions(t: GraftTable): DataFrame = t.partitions()

  def changes(t: GraftTable, startVersion: Long, endVersion: Long): DataFrame =
    t.changes(startVersion, endVersion)

  def restore(t: GraftTable, version: Long): Long = t.restore(version)

  def restoreToTimestamp(t: GraftTable, ts: String): Long =
    t.restoreToTimestamp(ts)

  def upsert(t: GraftTable, source: DataFrame): Unit = t.upsert(source)

  def upsert(t: GraftTable, source: DataFrame, mode: String): Unit =
    t.upsert(source, mode)

  def upsert(t: GraftTable, source: DataFrame, mode: String,
      condition: String): Unit =
    t.upsert(source, mode, Option(condition).filter(_.nonEmpty))

  def update(
      t: GraftTable, condition: Column,
      set: java.util.Map[String, Column]): Unit =
    t.update(condition, set.asScala.toMap)

  def updateExpr(
      t: GraftTable, condition: String,
      set: java.util.Map[String, String]): Unit =
    t.updateExpr(condition, set.asScala.toMap)

  def delete(t: GraftTable, condition: Column): Unit = t.delete(condition)

  def deleteExpr(t: GraftTable, condition: String): Unit =
    t.deleteExpr(condition)

  /** `predicate` empty or null compacts every partition. */
  def compaction(t: GraftTable, force: Boolean, predicate: String): Unit =
    t.compaction(force, Option(predicate).filter(_.nonEmpty))

  def zOrder(t: GraftTable, cols: java.util.List[String],
      predicate: String): Unit =
    t.zOrder(cols.asScala.toSeq, Option(predicate).filter(_.nonEmpty))

  def compaction(t: GraftTable, force: Boolean, predicate: String,
      mergeOperators: java.util.Map[String, String]): Unit =
    t.compaction(force, Option(predicate).filter(_.nonEmpty),
      scala.jdk.CollectionConverters.MapHasAsScala(mergeOperators).asScala.toMap)

  def rebucket(t: GraftTable, newBucketNum: Int): Long =
    t.rebucket(newBucketNum)

  def cloneTo(t: GraftTable, destPath: String): Long = t.cloneTo(destPath)

  def cloneTo(t: GraftTable, destPath: String, version: Long): Long =
    t.cloneTo(destPath, Some(version))

  def cloneDeep(t: GraftTable, destPath: String): Long =
    t.cloneTo(destPath, None, deep = true)

  def cloneDeep(t: GraftTable, destPath: String, version: Long): Long =
    t.cloneTo(destPath, Some(version), deep = true)

  def cloneToAtTimestamp(t: GraftTable, destPath: String,
      timestamp: String): Long = t.cloneToAtTimestamp(destPath, timestamp)

  def generateManifest(t: GraftTable): Long = t.generateManifest()

  def replicationStatus(spark: SparkSession, destPath: String)
      : GraftTable.ReplicationStatus =
    GraftTable.replicationStatus(spark, destPath)

  /** Instance form: validates the replica is fed from `t`. */
  def replicationStatusOf(t: GraftTable, destPath: String)
      : GraftTable.ReplicationStatus = t.replicationStatus(destPath)

  def replicateTo(t: GraftTable, destPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    t.replicateTo(destPath, checkpointDir)

  def applyChanges(
      t: GraftTable, source: DataFrame, opColumn: String,
      sequenceColumns: java.util.List[String],
      deleteOps: java.util.List[String]): Unit =
    t.applyChanges(source, opColumn, sequenceColumns.asScala.toSeq,
      deleteOps.asScala.toSeq)

  def cleanup(
      t: GraftTable, retainMillis: Long,
      dryRun: Boolean): java.util.List[String] =
    t.cleanup(retainMillis, dryRun).asJava

  def dropTable(t: GraftTable): Unit = t.dropTable()

  /** Register a [[graft.merge.GraftMergeOperator]] implementation by fully
    * qualified class name so `graft_merge_op_<name>` markers and scan
    * options can reference it (reference `StarTable.registerMergeOperator`). */
  def registerMergeOperator(className: String): Unit =
    graft.merge.GraftMergeOperator.register(
      Class.forName(className).getDeclaredConstructor().newInstance()
        .asInstanceOf[graft.merge.GraftMergeOperator])

  def dropPartition(t: GraftTable, predicate: String): Unit =
    t.dropPartition(predicate)
}
