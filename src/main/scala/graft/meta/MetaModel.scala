package graft.meta

import org.apache.spark.sql.types.{DataType, StructType}

/** Metadata model for Graft tables.
  *
  * Mirrors the reference data model (StarLake
  * `org/apache/spark/sql/star/utils/MetaData.scala:54-139`): a table is a
  * root path plus table metadata; data files carry range-partition values, a
  * hash-bucket id, a write version and the set of columns physically present
  * (`file_exist_cols` — upserts may write partial columns).
  *
  * Unlike the reference (which stores all of this in an external Cassandra
  * keyspace, `com/engineplus/star/meta/`), Graft persists metadata as a
  * versioned JSON-lines commit log under `<table>/_graft_log/` with
  * atomic-rename CAS — the design the reference itself sketches in its
  * dormant `star/storage/LogStore.scala` and that public lakehouse formats
  * (Delta-style logs) use. This keeps commits transactional without any
  * external service and scales: the log is O(commits), never O(rows).
  */
/** @param droppedColumns lowercase names of columns dropped metadata-only
  *   while data files still physically held them. Files address columns by
  *   NAME (no column-id mapping), so re-introducing such a name without
  *   care would resurrect pre-drop values from old files; the catalog's
  *   ADD COLUMN consults this list and rewrites stale data first, and the
  *   write path refuses to re-add the name via implicit schema merge. */
case class TableInfo(
    tableId: String,
    schemaJson: String,
    rangeColumns: Seq[String] = Nil,
    hashColumns: Seq[String] = Nil,
    bucketNum: Int = -1,
    configuration: Map[String, String] = Map.empty,
    shortName: Option[String] = None,
    droppedColumns: Seq[String] = Nil) {
  def schema: StructType =
    if (schemaJson.isEmpty) new StructType()
    else DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def hasPrimaryKey: Boolean = hashColumns.nonEmpty && bucketNum > 0
  def rangePartitionSchema: StructType =
    StructType(rangeColumns.flatMap(c => schema.fields.find(_.name == c)))
  def dataSchema: StructType =
    StructType(schema.fields.filterNot(f => rangeColumns.contains(f.name)))
}

/** One committed data file. `path` is relative to the table root.
  * `bucket` is -1 for non-PK tables. `writeVersion` is the log version that
  * added the file; merge-on-read orders versions with it.
  *
  * `numRecords`/`minValues`/`maxValues`/`nullCounts` are per-file column
  * statistics harvested from the parquet footer at commit time (Delta-style
  * data skipping): values encode in a type-stable string form (numbers via
  * `toString`, dates as epoch-day ints, timestamps as epoch-micro longs,
  * strings verbatim when short) so skipping never depends on session
  * timezone or locale. Absent entries mean "no stats — never skip".
  * Old log entries deserialize with the defaults (stats-free), so logs
  * written before this field existed replay unchanged.
  *
  * `dvPath`/`dvCardinality`: merge-on-read deletion vector (non-PK tables
  * only). `dvPath` is the table-root-relative path of a serialized bitmap
  * of DELETED row indices in this file; scans mask those rows out.
  * Re-adding the same `path` with a new `dvPath` is how a DV delete
  * commits (replay replaces by path). `minValues`/`maxValues` keep the
  * PHYSICAL file's bounds (deleted rows included) — skipping by them can
  * only over-keep, never over-skip; metadata-only MIN/MAX must therefore
  * refuse files with a DV, and COUNT uses `liveRecords`. Empty `dvPath`
  * (the default — all pre-DV log entries) means no deleted rows. */
case class DataFileInfo(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    bucket: Int = -1,
    size: Long = 0L,
    modificationTime: Long = 0L,
    writeVersion: Long = 0L,
    isBase: Boolean = true,
    fileExistCols: Seq[String] = Nil,
    numRecords: Long = -1L,
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty,
    dvPath: String = "",
    dvCardinality: Long = 0L) {
  /** Rows still visible through the deletion vector (physical − deleted);
    * -1 when the physical count is unknown. */
  def liveRecords: Long =
    if (numRecords < 0L) -1L else numRecords - dvCardinality
  def hasDv: Boolean = dvPath.nonEmpty
  /** Canonical range-partition identity, e.g. "lang=en/source=web". */
  def rangeKey: String = DataFileInfo.rangeKey(partitionValues)
  /** Physical location of this file. Usually `path` is table-root-relative;
    * a SHALLOW CLONE commits entries whose `path` points into the SOURCE
    * table absolutely (leading `/` or a scheme), which resolve as-is. */
  def resolvedPath(tableRoot: String): String =
    DataFileInfo.resolve(tableRoot, path)
}

object DataFileInfo {
  /** A path that must NOT be joined onto the table root: an absolute
    * filesystem path or a full URI (shallow-clone external references). */
  def isExternal(p: String): Boolean =
    p.startsWith("/") || p.contains("://")

  def resolve(tableRoot: String, p: String): String =
    if (isExternal(p)) p else s"$tableRoot/$p"

  def rangeKey(values: Map[String, String]): String =
    if (values.isEmpty) ""
    else values.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")

  /** A version's add entries with their merge-on-read writeVersion stamped:
    * fresh files arrive with the 0 sentinel and take the commit's version;
    * a re-add (RESTORE) keeps its original. THE one stamping rule — every
    * log reader (streaming source, CDF stream, batch change feed) must
    * apply it identically or merge ordering diverges between consumers. */
  def stampedAdds(entries: Seq[LogEntry], version: Long): Seq[DataFileInfo] =
    entries.flatMap(_.add).map(f =>
      if (f.writeVersion == 0L) f.copy(writeVersion = version) else f)
}

/** Row-level TOMBSTONES for primary-key tables: a delta file may carry the
  * reserved boolean column `__graft_deleted`; a row with it set to true is
  * a delete marker for its key. The k-way merge reader resolves markers in
  * (writeVersion, position) order — a marker RESETS the key's history, so
  * the key disappears unless a NEWER version re-inserts it (and then only
  * post-marker versions contribute column values / operator folds). This
  * makes PK DELETE and `MERGE ... WHEN MATCHED THEN DELETE` append-only:
  * cost proportional to the keys deleted, never to the buckets touched.
  * Compaction merges a partition's FULL file stack, so resolved markers
  * vanish from the rewritten base files.
  *
  * The marker is an engine-internal column: never part of the table
  * schema, never visible to scans' output, skipped by schema evolution and
  * write invariants. Per-file presence travels in `fileExistCols` — no new
  * manifest field, so old logs replay unchanged. */
object Tombstones {
  val COL = "__graft_deleted"

  def fileHas(f: DataFileInfo): Boolean =
    f.fileExistCols.exists(_.equalsIgnoreCase(COL))

  def anyHas(files: Seq[DataFileInfo]): Boolean = files.exists(fileHas)

  def isMarkerCol(name: String): Boolean = name.equalsIgnoreCase(COL)
}

/** Commit metadata (one per log entry). `commitType` follows the reference's
  * commit taxonomy (`meta/MetaCommit.scala`): append | overwrite | delta |
  * compaction | update | delete | streaming — plus `vacuum`/`vacuum_end`
  * marker pairs that serialize cleanup against restore.
  *
  * `leaseUntil` (vacuum markers only): wall-clock expiry of the vacuum's
  * delete-phase lease — restores fail cleanly while an unexpired lease is
  * open, so a vacuum can never delete a file a concurrent restore is about
  * to re-reference. Old log entries deserialize with the default (no lease).
  *
  * `clusterBy` (compaction commits): the clustering columns this rewrite
  * applied (empty = plain bin-pack/merge). Declared-clustering idempotence
  * compares these RECORDED columns against the table's current
  * `graft.zOrderBy` — commit-type inference could not distinguish a
  * z-ordered rewrite from a bin-pack, so partitions compacted before the
  * property was declared were wrongly treated as already clustered.
  */
case class CommitInfo(
    commitType: String,
    timestamp: Long,
    appId: String = "",
    comment: String = "",
    leaseUntil: Long = 0L,
    clusterBy: Seq[String] = Nil)

/** Exactly-once bookkeeping for the streaming sink: highest batch id
  * committed per streaming query (reference `meta/StreamingRecord.scala:41-57`).
  */
case class StreamingInfo(queryId: String, batchId: Long)

case class RemoveFileAction(path: String)

/** One JSON line in a commit file. Exactly one field is set per line except
  * `commit`, which heads every commit file.
  */
case class LogEntry(
    commit: Option[CommitInfo] = None,
    table: Option[TableInfo] = None,
    add: Option[DataFileInfo] = None,
    remove: Option[RemoveFileAction] = None,
    streaming: Option[StreamingInfo] = None)

/** Full replayed table state at one version — written every K commits so
  * `Snapshot.replay` starts from the newest checkpoint instead of walking
  * the log from version 0 (the reference's Cassandra gives O(1)
  * current-state reads; this restores that under the CAS-log design). */
case class CheckpointState(
    table: TableInfo,
    files: Seq[DataFileInfo] = Nil,
    streaming: Map[String, Long] = Map.empty)

/** Materialized view metadata: SQL text plus the pinned (path -> version)
  * of every relation table at build time (reference `MaterialViewInfo`,
  * `utils/MetaData.scala:208-222`). `viewTableVersion` pins the VIEW
  * table's own commit version as of the last (re)build: the table write
  * and this meta file cannot commit atomically, and incremental refresh
  * folds a delta into the stored state — folding it twice (a crash
  * between the two writes) would double-count, so the incremental path
  * requires the pin to match and falls back to the idempotent full
  * recompute otherwise. None on legacy meta files → same fallback. */
case class MaterialViewInfo(
    viewName: String,
    sqlText: String,
    relationVersions: Map[String, Long] = Map.empty,
    viewTableVersion: Option[Long] = None)

class GraftConcurrentModificationException(msg: String)
    extends RuntimeException(msg)

class GraftTableNotFoundException(path: String)
    extends RuntimeException(s"Graft table not found at $path")
