package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitioningAwareFileIndex, PartitionPath, PartitionSpec}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{DataFileInfo, TableInfo}
import graft.write.TransactionalWrite

/** Manifest-backed file index: file listing comes from the committed
  * metadata log, never from a filesystem scan (the Delta/`TahoeFileIndex`
  * technique; reference analog `star/StarLakeFileIndex.scala:32-150`).
  * Partition pruning runs against the manifest's partition values — at
  * 100 TB the driver reads one small JSON log, not a directory tree of
  * millions of files.
  *
  * Pass a pinned `files` list for commands that must see a fixed set
  * (update/delete rewrites, compaction) — the `BatchDataFileIndexV2` analog.
  */
class GraftFileIndex(
    spark: SparkSession,
    val tablePath: String,
    val tableInfo: TableInfo,
    val files: Seq[DataFileInfo])
  extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  // Qualify every path with the filesystem scheme — PartitioningAwareFileIndex
  // qualifies root paths before looking up leafDirToChildrenFiles, so the
  // map keys must be qualified identically.
  private val fs = new Path(tablePath).getFileSystem(hadoopConf)
  private val root = fs.makeQualified(new Path(tablePath))

  override def rootPaths: Seq[Path] = Seq(root)

  // Value equality: every scan build creates a fresh index over the same
  // manifest, and FileScan.equals compares fileIndex — without this, two
  // identical scans of one table never compare equal and
  // ReuseExchange/scan dedup cannot fire.
  override def equals(other: Any): Boolean = other match {
    case o: GraftFileIndex =>
      tablePath == o.tablePath && tableInfo == o.tableInfo && files == o.files
    case _ => false
  }
  override def hashCode(): Int =
    (tablePath, tableInfo, files).hashCode()

  private def absPath(f: DataFileInfo): Path =
    fs.makeQualified(new Path(f.resolvedPath(tablePath)))

  private lazy val statuses: Seq[(DataFileInfo, FileStatus)] = files.map { f =>
    f -> new FileStatus(f.size, false, 1, 128L * 1024 * 1024,
      f.modificationTime, absPath(f))
  }

  /** Qualified status path -> manifest entry (for scan builders). */
  lazy val fileInfoByStatusPath: Map[String, DataFileInfo] =
    statuses.map { case (f, st) => st.getPath.toString -> f }.toMap

  /** Partition pruning (super) + per-file stats skipping: any pushed data
    * filter whose column has min/max/nullCount stats in the manifest drops
    * files that cannot contain a matching row — BEFORE tasks are planned.
    * Untranslatable or un-statted filters keep every file (skipping is an
    * optimization, never a correctness gate). Callers control safety by
    * what they pass as `dataFilters`: the non-PK parquet path passes all
    * pushed filters (files are independent); the PK merge path passes only
    * PK-column filters (all versions of a key share its PK, so key-range
    * skipping can never split a merge group's versions for a surviving
    * key). */
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) return dirs
    val translated = dataFilters.flatMap(
      org.apache.spark.sql.graft.SparkShims.translateFilter)
    if (translated.isEmpty) return dirs
    val byPath = fileInfoByStatusPath
    val schema = tableInfo.dataSchema
    dirs.map { pd =>
      pd.copy(files = pd.files.filter { st =>
        byPath.get(st.getPath.toString)
          .forall(FileStats.mayMatch(_, translated, schema))
      })
    }.filter(_.files.nonEmpty)
  }

  override lazy val leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach { case (_, st) => m.put(st.getPath, st) }
    m
  }

  // Keyed by the file's LOGICAL directory under THIS table's root (root
  // itself, or root/<range-dir>), not the physical parent: a shallow
  // clone's manifest references files living under the SOURCE table, and
  // PartitioningAwareFileIndex resolves its lookups against rootPaths /
  // PartitionPath dirs — keys must match those, while the FileStatus keeps
  // the physical (possibly external) path tasks actually open.
  override lazy val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy { case (f, _) => logicalDir(f) }
      .map { case (dir, fs) => dir -> fs.map(_._2).toArray }

  private def logicalDir(f: DataFileInfo): Path =
    if (tableInfo.rangeColumns.isEmpty) root
    else new Path(root, tableInfo.rangeColumns
      .map(c => s"$c=${ExternalCatalogUtils.escapePathName(f.partitionValues(c))}")
      .mkString("/"))

  override def partitionSpec(): PartitionSpec = cachedPartitionSpec

  private lazy val cachedPartitionSpec: PartitionSpec = {
    val pschema = tableInfo.rangePartitionSchema
    if (pschema.isEmpty) PartitionSpec.emptySpec
    else {
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      val partitions = files.groupBy(_.rangeKey).toSeq.map { case (_, fs) =>
        val values = fs.head.partitionValues
        val row = InternalRow.fromSeq(pschema.fields.toSeq.map { f =>
          GraftFileIndex.castPartitionValue(values.getOrElse(f.name, null), f, tz)
        })
        val dir = tableInfo.rangeColumns
          .map(c => s"$c=${ExternalCatalogUtils.escapePathName(values(c))}")
          .mkString("/")
        PartitionPath(row, new Path(root, dir))
      }
      PartitionSpec(pschema, partitions)
    }
  }

  override def sizeInBytes: Long = files.map(_.size).sum

  override def refresh(): Unit = ()

  override def partitionSchema: StructType = tableInfo.rangePartitionSchema
}

object GraftFileIndex {
  /** Stored string -> catalyst value of the partition column's type. */
  def castPartitionValue(
      s: String, field: org.apache.spark.sql.types.StructField, tz: String): Any = {
    if (s == null || s == TransactionalWrite.HIVE_NULL) null
    else Cast(Literal(UTF8String.fromString(s), StringType), field.dataType,
      Some(tz)).eval(null)
  }
}
