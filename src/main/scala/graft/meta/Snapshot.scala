package graft.meta

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** Immutable view of a table at one log version: replayed TableInfo + live
  * file set + streaming batch ids. Mirrors the reference `star/Snapshot.scala`
  * (TableInfo + PartitionInfo[]) with the per-partition delta bookkeeping
  * folded into the file list itself.
  */
case class Snapshot(
    tablePath: String,
    version: Long,
    tableInfo: TableInfo,
    files: Seq[DataFileInfo],
    streamingBatchIds: Map[String, Long]) {

  def isEmptyTable: Boolean = files.isEmpty

  /** range-partition key -> files */
  lazy val filesByRange: Map[String, Seq[DataFileInfo]] =
    files.groupBy(_.rangeKey)

  /** Delta (non-base) file count per range partition — drives compaction
    * triggering (reference `commands/CompactionCommand.scala:50-68`). */
  lazy val deltaFileCountByRange: Map[String, Int] =
    filesByRange.map { case (k, fs) => k -> fs.count(!_.isBase) }

  def hasDeltaFiles: Boolean = files.exists(!_.isBase)

  def sizeInBytes: Long = files.map(_.size).sum
}

object Snapshot {
  /** Replay log entries 0..version into a Snapshot. */
  def replay(store: MetaStore, tablePath: String, version: Long): Snapshot = {
    var tableInfo: TableInfo = null
    val files = mutable.LinkedHashMap.empty[String, DataFileInfo]
    val streaming = mutable.HashMap.empty[String, Long]
    var v = 0L
    while (v <= version) {
      store.read(tablePath, v).foreach { e =>
        e.table.foreach(t => tableInfo = t)
        e.add.foreach { f =>
          files.put(f.path, if (f.writeVersion == 0L) f.copy(writeVersion = v) else f)
        }
        e.remove.foreach(r => files.remove(r.path))
        e.streaming.foreach { s =>
          val cur = streaming.getOrElse(s.queryId, -1L)
          if (s.batchId > cur) streaming.put(s.queryId, s.batchId)
        }
      }
      v += 1
    }
    require(tableInfo != null, s"log for $tablePath has no TableInfo")
    Snapshot(tablePath, version, tableInfo, files.values.toSeq, streaming.toMap)
  }
}

/** Snapshot cache + transaction entry point (reference
  * `star/SnapshotManagement.scala:42-268`). Snapshots are cached per table
  * path and refreshed by checking the store's latest version — an O(1)
  * directory scan, never a data read.
  */
object SnapshotManagement {
  private val cache = new ConcurrentHashMap[String, Snapshot]()

  def store: MetaStore = MetaStore.fs

  def exists(tablePath: String): Boolean = store.exists(normalize(tablePath))

  def normalize(p: String): String =
    FsMetaStore.stripScheme(p).stripSuffix("/")

  /** Latest snapshot, replaying only if the cached one is stale. */
  def snapshot(tablePath: String): Snapshot = {
    val path = normalize(tablePath)
    val latest = store.latestVersion(path)
    if (latest < 0) throw new GraftTableNotFoundException(path)
    val cached = cache.get(path)
    if (cached != null && cached.version == latest) cached
    else {
      val snap = Snapshot.replay(store, path, latest)
      cache.put(path, snap)
      snap
    }
  }

  def snapshotOpt(tablePath: String): Option[Snapshot] =
    if (exists(tablePath)) Some(snapshot(tablePath)) else None

  /** Time travel: the table as of a past committed version. */
  def snapshotAt(tablePath: String, version: Long): Snapshot = {
    val path = normalize(tablePath)
    val latest = store.latestVersion(path)
    if (latest < 0) throw new GraftTableNotFoundException(path)
    require(version >= 0 && version <= latest,
      s"version $version out of range [0, $latest] for $path")
    Snapshot.replay(store, path, version)
  }

  def invalidate(tablePath: String): Unit = cache.remove(normalize(tablePath))

  /** Run `body` in a new transaction with commit-retry. */
  def withNewTransaction[T](tablePath: String)(body: Transaction => T): T = {
    val txn = new Transaction(normalize(tablePath), store)
    body(txn)
  }
}

/** One optimistic transaction: stage adds/removes, then CAS-commit at
  * latest+1 with conflict detection and bounded retry (reference
  * `star/TransactionCommit.scala:247-392` + `meta/MetaCommit.scala:285-431`,
  * re-expressed over the CAS log instead of Cassandra LWT locks).
  */
class Transaction(val tablePath: String, store: MetaStore) {
  private var committed = false
  val maxAttempts = 10

  def snapshotOpt: Option[Snapshot] =
    if (store.exists(tablePath)) Some(SnapshotManagement.snapshot(tablePath)) else None

  /** The version the commit will receive if it wins the race right now. */
  def nextVersion: Long = store.latestVersion(tablePath) + 1

  def commit(
      commitType: String,
      newTableInfo: Option[TableInfo],
      addFiles: Seq[DataFileInfo],
      removeFiles: Seq[DataFileInfo],
      streaming: Option[StreamingInfo] = None): Long = {
    require(!committed, "transaction already committed")
    var attempt = 0
    while (attempt < maxAttempts) {
      val version = store.latestVersion(tablePath) + 1
      // Conflict rules: removing a file that a concurrent commit already
      // removed (or that never existed) is a real conflict; pure appends
      // (delta/append/streaming) always re-apply cleanly on top.
      if (removeFiles.nonEmpty && version > 0) {
        val current = Snapshot.replay(store, tablePath, version - 1)
        val live = current.files.map(_.path).toSet
        val gone = removeFiles.filterNot(f => live.contains(f.path))
        if (gone.nonEmpty) {
          throw new GraftConcurrentModificationException(
            s"files removed concurrently: ${gone.map(_.path).mkString(", ")}")
        }
      }
      val entries =
        Seq(LogEntry(commit = Some(CommitInfo(commitType, System.currentTimeMillis())))) ++
        newTableInfo.map(t => LogEntry(table = Some(t))) ++
        addFiles.map(f => LogEntry(add = Some(f.copy(writeVersion = version)))) ++
        removeFiles.map(f => LogEntry(remove = Some(RemoveFileAction(f.path)))) ++
        streaming.map(s => LogEntry(streaming = Some(s)))
      if (store.commit(tablePath, version, entries)) {
        committed = true
        SnapshotManagement.invalidate(tablePath)
        return version
      }
      attempt += 1
    }
    throw new GraftConcurrentModificationException(
      s"lost commit race $maxAttempts times on $tablePath")
  }
}
