package graft.sources

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
    val index = new GraftFileIndex(spark, path, snapshot.tableInfo, snapshot.files)
    val ti = snapshot.tableInfo
    if (!ti.hasPrimaryKey) {
      ParquetScanBuilder(spark, index, fullSchema, ti.dataSchema, options)
    } else {
      new GraftBucketScanBuilder(spark, path, snapshot, index, options)
    }
  }
}
