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

  /** Catalyst predicate -> V1 `sources.Filter` (protected[sql] in Spark;
    * used by the manifest file index to evaluate pushed filters against
    * per-file stats). */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Column <-> catalyst Expression bridges. Conversion is EAGER
    * (`ColumnNodeToExpressionConverter`), not the lazy
    * `ColumnNodeExpression` wrapper: `expr("g = 1")`-style columns carry
    * raw SQL text until converted, and callers that classify predicates
    * structurally (partition-conjunct splitting in update/delete) would
    * silently see an opaque node with no attribute references. */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Spark's row-index temporary column name (`private[sql]`): a parquet
    * read schema containing this column gets per-file row indices populated
    * by the stock readers — the deletion-vector scan keys its masks on it. */
  def rowIndexColumnName: String =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** V2 catalog Column[] -> StructType (CatalogV2Util is private[sql]). */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(cols)

  /** DataFrame over an arbitrary logical plan. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)

  /** Catalyst-internal value -> external Scala value of the given type
    * (UTF8String -> String, Decimal -> BigDecimal, days-int -> Date …);
    * v1 `sources.Filter` values are external by contract. */
  def toExternal(v: Any, dt: org.apache.spark.sql.types.DataType): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala(v, dt)

  /** A runtime-filter-shaped V2 IN predicate (exactly what
    * `DataSourceV2Strategy.translateRuntimeFilterV2` emits from a completed
    * dynamic-pruning subquery) — `LiteralValue` is `private[sql]`, so tests
    * exercising `SupportsRuntimeV2Filtering.filter` build it here. Values
    * are catalyst-INTERNAL (UTF8String for strings, boxed numerics). */
  def v2InPredicate(
      col: String,
      values: Seq[Any],
      dataType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.filter.Predicate = {
    val kids: Array[org.apache.spark.sql.connector.expressions.Expression] =
      org.apache.spark.sql.connector.expressions.FieldReference(col) +:
        values.toArray.map(v =>
          org.apache.spark.sql.connector.expressions.LiteralValue(v, dataType)
            : org.apache.spark.sql.connector.expressions.Expression)
    new org.apache.spark.sql.connector.expressions.filter.Predicate("IN", kids)
  }
}

/** ScanBuilder delegator that keeps the stock `ParquetScanBuilder`'s whole
  * pushdown surface (column pruning, catalyst filters, aggregates, variant
  * extractions) while wrapping the BUILT scan with a streaming-capable one.
  * Lives in the spark namespace because `SupportsPushDownCatalystFilters`
  * is `private[sql]`; a plain wrapper outside it would silently drop filter
  * pushdown (`ParquetScanBuilder.build()` narrows its return type, so a
  * subclass override cannot widen to the wrapper scan).
  */
class StreamableParquetScanBuilderShim(
    inner: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder,
    wrap: org.apache.spark.sql.connector.read.Scan =>
      org.apache.spark.sql.connector.read.Scan,
    allowAggPushdown: Boolean = true)
  extends org.apache.spark.sql.connector.read.ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner.pushFilters(filters)

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  // refused while deletion vectors exist: footer-derived aggregates
  // (COUNT/MIN/MAX from parquet metadata) would include deleted rows
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = allowAggPushdown && inner.pushAggregation(aggregation)

  override def pushVariantExtractions(
      extractions: Array[org.apache.spark.sql.connector.read.VariantExtraction])
      : Array[Boolean] = inner.pushVariantExtractions(extractions)

  override def build(): org.apache.spark.sql.connector.read.Scan =
    wrap(inner.build())
}
