package graft.commands

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Literal}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{DataFileInfo, Snapshot}
import graft.write.TransactionalWrite

/** Evaluates partition-only predicates against a table's range-partition
  * values to select the files a command touches (reference
  * `star/PartitionFilter.scala:28-103`: predicates run against a tiny
  * partition-values DataFrame, metadata-scale, never against data).
  */
object PartitionFilter {

  /** Files in partitions matching ALL `partitionPredicates` (empty = all). */
  def filterFiles(
      spark: SparkSession,
      snapshot: Snapshot,
      partitionPredicates: Seq[Expression]): Seq[DataFileInfo] = {
    if (partitionPredicates.isEmpty) return snapshot.files
    val info = snapshot.tableInfo
    if (info.rangeColumns.isEmpty) return snapshot.files
    val matching = matchingRangeKeys(spark, snapshot, partitionPredicates)
    snapshot.files.filter(f => matching.contains(f.rangeKey))
  }

  def matchingRangeKeys(
      spark: SparkSession,
      snapshot: Snapshot,
      partitionPredicates: Seq[Expression]): Set[String] = {
    val info = snapshot.tableInfo
    val pschema = info.rangePartitionSchema
    val keyCol = "__graft_range_key"
    val rows = snapshot.filesByRange.toSeq.map { case (key, files) =>
      val values = files.head.partitionValues
      Row.fromSeq(pschema.fields.toSeq.map(f =>
        castToExternal(spark, values.getOrElse(f.name, null), f.dataType)) :+ key)
    }
    val schema = StructType(pschema.fields :+ StructField(keyCol, StringType))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val cond = partitionPredicates.reduce(And)
    df.filter(org.apache.spark.sql.graft.SparkShims.column(cond))
      .select(col(keyCol)).collect().map(_.getString(0)).toSet
  }

  /** Partition values are stored as strings; cast back to the column type
    * and convert to the external (Row) representation. Delegates the
    * stored-string cast (HIVE_NULL marker + session-timezone Cast) to
    * [[graft.sources.GraftFileIndex.castPartitionValue]] — ONE copy of
    * that convention, shared with the scan-side file index. */
  def castToExternal(spark: SparkSession, s: String, dt: DataType): Any = {
    val catalyst = graft.sources.GraftFileIndex.castPartitionValue(s,
      org.apache.spark.sql.types.StructField("p", dt),
      spark.sessionState.conf.sessionLocalTimeZone)
    CatalystTypeConverters.convertToScala(catalyst, dt)
  }
}
