package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.Snapshot

/** Chooses the physical scan (reference
  * `star/catalog/StarLakeScanBuilder.scala:99-158`):
  *  - no PK            -> stock vectorized parquet scan over the manifest
  *                        file index (pushdown + pruning for free);
  *  - PK, all base     -> bucket scan (one partition per bucket, no split,
  *                        declares hash partitioning + PK order);
  *  - PK, delta files  -> merge-on-read scan (k-way versioned merge).
  */
object GraftScanBuilder {
  def create(
      spark: SparkSession,
      path: String,
      snapshot: Snapshot,
      fullSchema: StructType,
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val ti = snapshot.tableInfo
    val optMap = options.asCaseSensitiveMap().asScala.toMap
    if (GraftCdfScan.wantsCdf(optMap)) {
      // streaming change feed: dedicated scan (no pushdown — every change
      // row ships with the three CDF columns appended)
      return new GraftCdfScanBuilder(spark, path, ti, fullSchema, optMap)
    }
    val index = new GraftFileIndex(spark, path, snapshot.tableInfo, snapshot.files)
    val ignoreChanges =
      Option(options.get("ignoreChanges")).exists(_.toBoolean)
    if (!ti.hasPrimaryKey) {
      // shim delegator: keeps the stock builder's pushdown surface visible
      // to V2ScanRelationPushDown while the BUILT scan gains the streaming
      // entry point (batch path = pure delegation)
      // dataSchema = fullSchema minus range columns, keeping fullSchema's
      // precise nullability (computed by the caller over the snapshot files)
      val preciseData = StructType(
        fullSchema.fields.filterNot(f => ti.rangeColumns.contains(f.name)))
      // deletion vectors: masked files are keyed by absolute path so the
      // built scan can mask them; their presence also vetoes aggregate
      // pushdown (footer counts include deleted rows)
      val dvByPath = snapshot.files.iterator.filter(_.hasDv).map(f =>
        graft.meta.FsMetaStore.stripScheme(s"$path/${f.path}") -> f.dvPath)
        .toMap
      new org.apache.spark.sql.graft.StreamableParquetScanBuilderShim(
        ParquetScanBuilder(spark, index, fullSchema, preciseData, options),
        s => new GraftStreamableScan(s, spark, path, ti, ignoreChanges,
          options.asCaseSensitiveMap().asScala.toMap, dvByPath),
        allowAggPushdown = dvByPath.isEmpty)
    } else {
      new GraftBucketScanBuilder(spark, path, snapshot, index, options)
    }
  }
}
