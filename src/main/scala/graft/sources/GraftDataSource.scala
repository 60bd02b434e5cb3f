package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.commands.WriteIntoTable
import graft.meta.SnapshotManagement

/** The `graft` format (reference `sources/StarLakeDataSource.scala:41-133`):
  * V2 TableProvider for reads and Append/Overwrite writes, V1
  * CreatableRelationProvider for ErrorIfExists/Ignore save modes, and a
  * streaming sink provider with exactly-once batch idempotence.
  */
class GraftDataSource
  extends org.apache.spark.sql.connector.catalog.TableProvider
  with DataSourceRegister
  with CreatableRelationProvider
  with StreamSinkProvider {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: java.util.Map[String, String]): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("'path' option is required for graft tables"))
    SnapshotManagement.normalize(p)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new GraftTableV2(SparkSession.active, pathOf(options),
      extraOptions = options.asCaseSensitiveMap().asScala.toMap).schema()

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    // same options as inferSchema: a versionAsOf/timestampAsOf read must
    // report the PINNED snapshot's partitioning (and reuse its resolution
    // instead of paying a second independent replay)
    new GraftTableV2(SparkSession.active, pathOf(options),
      extraOptions = options.asCaseSensitiveMap().asScala.toMap).partitioning()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTableV2(SparkSession.active, pathOf(properties),
      Option(schema), properties.asScala.toMap)

  /** V1 write path — covers all four SaveModes. `DataFrameWriter.save` is
    * the only caller, and its semantics are BY NAME: mark the write so the
    * command never positionally renames mismatched columns (SQL INSERT
    * arrives via the V2 plan, tagged by `TagWriteAlignment`). */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = SnapshotManagement.normalize(parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required")))
    WriteIntoTable.run(sqlContext.sparkSession, path, data, mode,
      parameters + (WriteIntoTable.BY_NAME -> "true"))
    // alias: inside the anonymous class `sqlContext` names ITS member, so
    // returning it unaliased would recurse forever if anything called it
    val outer = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = outer
      override def schema: StructType = data.schema
    }
  }

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = SnapshotManagement.normalize(parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required")))
    new GraftSink(sqlContext.sparkSession, path, parameters, partitionColumns,
      outputMode)
  }
}
