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

  /** Async-I/O parity with the reference (`star/catalog/
    * StarLakeScanBuilder.scala:159-179`): there an async parquet reader is
    * reflection-gated on a patched-Spark class and opted in per table.
    * Spark 4's stock reader SUBSUMES it — Parquet 1.16 issues Hadoop
    * VECTORED I/O (asynchronous, coalesced parallel range reads,
    * PARQUET-2171) by default. This conf makes the choice explicit per
    * session for every graft scan: set `false` to fall back to sequential
    * positioned reads (e.g. object stores that mishandle range fan-out),
    * `true` to pin it on; unset leaves Parquet's default (on). */
  val ASYNC_IO_CONF = "spark.graft.scan.asyncIO.enabled"
  private val PARQUET_VECTORED_KEY = "parquet.hadoop.vectored.io.enabled"

  /** Extra hadoop-conf entries implementing [[ASYNC_IO_CONF]]; empty when
    * the session leaves the default. */
  def asyncIoOptions(spark: SparkSession): Map[String, String] =
    spark.conf.getOption(ASYNC_IO_CONF)
      .map(v => Map(PARQUET_VECTORED_KEY -> v.toBoolean.toString))
      .getOrElse(Map.empty)

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
        graft.meta.FsMetaStore.stripScheme(f.resolvedPath(path)) -> f.dvPath)
        .toMap
      // the stock builder derives its hadoopConf from these options, so
      // the async-I/O choice rides them into the parquet reader
      val optionsWithIo = {
        val extra = asyncIoOptions(spark)
        if (extra.isEmpty) options
        else new CaseInsensitiveStringMap(
          (options.asCaseSensitiveMap().asScala ++ extra).asJava)
      }
      new org.apache.spark.sql.graft.StreamableParquetScanBuilderShim(
        ParquetScanBuilder(spark, index, fullSchema, preciseData, optionsWithIo),
        s => new GraftStreamableScan(s, spark, path, ti, ignoreChanges,
          options.asCaseSensitiveMap().asScala.toMap, dvByPath),
        allowAggPushdown = dvByPath.isEmpty)
    } else {
      new GraftBucketScanBuilder(spark, path, snapshot, index, options)
    }
  }
}
