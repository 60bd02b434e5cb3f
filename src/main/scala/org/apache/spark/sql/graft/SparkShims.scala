package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.types.StructType

/** Narrow bridge to `private[sql]` Spark internals the engine needs.
  * Kept deliberately tiny; everything else uses public APIs.
  */
object SparkShims {

  /** Build a batch DataFrame from an already-computed InternalRow RDD —
    * needed by the streaming sink, where `data.write` on the micro-batch
    * DataFrame is disallowed (same approach as the reference's sink, which
    * re-wraps the incremental execution's RDD).
    */
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    castToImpl(spark).internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** The micro-batch's computed RDD without re-planning. */
  def toRdd(df: DataFrame): RDD[InternalRow] = castToImpl(df).queryExecution.toRdd

  /** Column <-> catalyst Expression bridges. */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** V2 catalog Column[] -> StructType (CatalogV2Util is private[sql]). */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(cols)

  /** DataFrame over an arbitrary logical plan. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)
}
