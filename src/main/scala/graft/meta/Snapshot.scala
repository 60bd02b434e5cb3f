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
  /** Checkpoint every K commits; replay then starts from the newest
    * checkpoint at or below the requested version. */
  val CHECKPOINT_INTERVAL = 10

  /** Replay log entries into a Snapshot, seeded from the newest checkpoint
    * <= version when one exists (bounds replay to < K log reads per call
    * regardless of table age). */
  def replay(store: MetaStore, tablePath: String, version: Long): Snapshot = {
    var tableInfo: TableInfo = null
    val files = mutable.LinkedHashMap.empty[String, DataFileInfo]
    val streaming = mutable.HashMap.empty[String, Long]
    var v = 0L
    store.readCheckpoint(tablePath, version).foreach { case (cpVersion, cp) =>
      tableInfo = cp.table
      cp.files.foreach(f => files.put(f.path, f))
      streaming ++= cp.streaming
      v = cpVersion + 1
    }
    while (v <= version) {
      store.read(tablePath, v).foreach { e =>
        e.table.foreach(t => tableInfo = t)
        // stored writeVersions are authoritative: the commit path stamps
        // fresh files, and RESTORE deliberately stores originals (possibly
        // the genuine version-0 stamp) — restamping here would promote a
        // restored BASE file above the deltas it must merge under
        e.add.foreach(f => files.put(f.path, f))
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

  /** Bumped whenever the snapshot cache changes (commit, invalidation,
    * store swap). Consumers may memoize derived verdicts (e.g. MV
    * staleness) keyed on this epoch: within one epoch this process has
    * observed no table-state change, so re-probing the store per rule
    * invocation is pure waste. Foreign-process commits surface on this
    * process's next snapshot resolution of the table, which bumps the
    * epoch. */
  private val epoch = new java.util.concurrent.atomic.AtomicLong(0L)

  def cacheEpoch: Long = epoch.get()

  // Process-wide store, swappable for object-store deployments (set once at
  // startup, before any table access). Default: the POSIX filesystem log.
  @volatile private var activeStore: MetaStore = MetaStore.fs

  def store: MetaStore = activeStore

  /** Install a different MetaStore implementation (e.g.
    * `new ObjectStoreMetaStore(client)` for S3/GCS/HDFS). Clears the
    * snapshot cache — cached snapshots from the previous store would
    * otherwise serve stale state for paths that differ between stores. */
  def setStore(s: MetaStore): Unit =
    { activeStore = s; cache.clear(); epoch.incrementAndGet() }

  /** Guard for features whose state lives in DRIVER-LOCAL files next to
    * the table (manifest exports, status sidecars): under a non-fs
    * MetaStore the table's data is not on this driver's disk, so such
    * state would silently land on the wrong medium. One spelling of the
    * invariant for every such feature. */
  def requireFsStore(feature: String, remedy: String = ""): Unit =
    require(store.isInstanceOf[FsMetaStore],
      s"$feature requires the filesystem MetaStore (found " +
      s"${store.getClass.getSimpleName})" +
      (if (remedy.nonEmpty) s"; $remedy" else ""))

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
      epoch.incrementAndGet()
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

  /** Time travel by wall clock: the newest version whose commit timestamp
    * is at or before `tsMillis` (the reference documents `timestampAsOf` in
    * its read options; commit times come from `CommitInfo`). Commit
    * timestamps are only approximately monotone (writer clocks), so no
    * binary search — but the MAX matching version is by definition the
    * first match scanning DOWN from latest, which makes recent-timestamp
    * queries (the common case) O(1) log reads instead of O(commits). */
  def versionAtTimestamp(tablePath: String, tsMillis: Long): Long = {
    val path = normalize(tablePath)
    val latest = store.latestVersion(path)
    if (latest < 0) throw new GraftTableNotFoundException(path)
    var v = latest
    while (v >= 0) {
      val ts = store.read(path, v).flatMap(_.commit).headOption.map(_.timestamp)
      if (ts.exists(_ <= tsMillis)) return v
      v -= 1
    }
    throw new IllegalArgumentException(
      s"no commit at or before timestamp $tsMillis for $path " +
        "(the table is younger than the requested time)")
  }

  def snapshotAtTimestamp(tablePath: String, tsMillis: Long): Snapshot =
    snapshotAt(tablePath, versionAtTimestamp(tablePath, tsMillis))

  def invalidate(tablePath: String): Unit = {
    cache.remove(normalize(tablePath))
    epoch.incrementAndGet()
  }

  /** Run `body` in a new transaction with commit-retry. */
  def withNewTransaction[T](tablePath: String)(body: Transaction => T): T = {
    val txn = new Transaction(normalize(tablePath), store)
    body(txn)
  }

  /** Run a rewrite-style command with whole-body restart on concurrent
    * conflict: when `Transaction.commit` detects that another writer touched
    * the partitions this transaction is rewriting (see the conflict rules in
    * `Transaction.commit`), the body re-runs against a fresh snapshot so the
    * rewrite re-reads the concurrently committed data instead of silently
    * shadowing it (Delta-style ConcurrentAppendException semantics; reference
    * `meta/MetaCommit.scala:285-431` serializes via partition locks).
    * Files staged by an abandoned attempt stay unreferenced and are removed
    * by cleanup.
    */
  def withRewriteTransaction[T](tablePath: String, maxRestarts: Int = 5)(
      body: Transaction => T): T = {
    var attempt = 0
    while (true) {
      val txn = new Transaction(normalize(tablePath), store)
      try {
        return body(txn)
      } catch {
        case e: GraftConcurrentModificationException if attempt < maxRestarts =>
          attempt += 1
          invalidate(tablePath)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** One optimistic transaction: stage adds/removes, then CAS-commit at
  * latest+1 with conflict detection and bounded retry (reference
  * `star/TransactionCommit.scala:247-392` + `meta/MetaCommit.scala:285-431`,
  * re-expressed over the CAS log instead of Cassandra LWT locks).
  */
class Transaction(val tablePath: String, store: MetaStore) {
  private var committed = false
  private var readSnapshot: Option[Snapshot] = None
  val maxAttempts = 10

  /** Pins the snapshot this transaction computes against. The first call
    * records the read version; `commit` uses it to detect commits that
    * landed in between (the conflict window). */
  def snapshotOpt: Option[Snapshot] = {
    if (readSnapshot.isEmpty && store.exists(tablePath)) {
      readSnapshot = Some(SnapshotManagement.snapshot(tablePath))
    }
    readSnapshot
  }

  /** Version of the pinned snapshot; -1 when the table didn't exist (or was
    * never read) — then every committed version is in the conflict window. */
  def readVersion: Long = readSnapshot.map(_.version).getOrElse(-1L)

  /** The version the commit will receive if it wins the race right now. */
  def nextVersion: Long = store.latestVersion(tablePath) + 1

  /** `rewriteGuard` forces the rewrite-class conflict rules even when
    * `removeFiles` is empty — an adds-only RESTORE that resurrects old
    * files shadows concurrent writes exactly like a rewrite does, and the
    * remove-set gate alone would wave it through.
    *
    * `strictWindow` conflicts on ANY commit since the pinned snapshot (not
    * just partition touches) and never CAS-retries — the vacuum marker uses
    * it: the live set a vacuum computed is invalidated by EVERY kind of
    * concurrent commit, so the whole vacuum must restart from a fresh
    * snapshot rather than re-CAS a stale marker.
    *
    * `leaseUntil` is stamped into the CommitInfo (vacuum lease expiry). */
  def commit(
      commitType: String,
      newTableInfo: Option[TableInfo],
      addFiles: Seq[DataFileInfo],
      removeFiles: Seq[DataFileInfo],
      streaming: Option[StreamingInfo] = None,
      rewriteGuard: Boolean = false,
      preserveWriteVersions: Boolean = false,
      strictWindow: Boolean = false,
      leaseUntil: Long = 0L,
      clusterBy: Seq[String] = Nil,
      expectVersion: Long = -1L): Long = {
    require(!committed, "transaction already committed")
    var attempt = 0
    while (attempt < maxAttempts) {
      val version = store.latestVersion(tablePath) + 1
      // expectVersion pins the commit to ONE slot (the table-creating
      // write uses 0): losing that CAS means another writer created the
      // table first, and silently re-CASing at version 1 would land a
      // SECOND TableInfo — both writers' layouts/files unioned, where
      // SaveMode semantics should have re-dispatched (error/append/
      // overwrite) against the winner's table. Conflict, don't retry.
      if (expectVersion >= 0 && version != expectVersion) {
        throw new GraftConcurrentModificationException(
          s"commit expected to land at v$expectVersion of $tablePath but " +
          s"latest is v${version - 1}: a concurrent writer got there first")
      }
      // one replay of the pre-commit state shared by every guard below
      // (valid only when version >= 1; each use site checks)
      lazy val priorState = Snapshot.replay(store, tablePath, version - 1)
      // Meta lost-update guard: a commit carrying a TableInfo change
      // computed it against the PINNED snapshot; if another commit changed
      // the table's info since the pin, re-committing ours would silently
      // revert theirs (replay is last-writer-wins on the table entry) —
      // two concurrent mergeSchema appends would drop each other's new
      // columns. Conflict instead; the caller's restart re-merges against
      // fresh state.
      if (newTableInfo.isDefined && version - 1 > readVersion) {
        val pinned = snapshotOpt.map(_.tableInfo)
        val current = priorState.tableInfo
        if (!pinned.contains(current)) {
          throw new GraftConcurrentModificationException(
            s"table metadata of $tablePath changed concurrently (snapshot " +
            s"v$readVersion -> v${version - 1}); restarting from a fresh " +
            "snapshot")
        }
      }
      // Layout guard: files in an add-carrying commit were bucketed /
      // range-assigned against the PINNED snapshot's layout. If a commit
      // since the pin changed that layout (rebucket above all), landing
      // ours would mix files whose bucket ids mean different things —
      // merge-on-read would pair wrong buckets silently. Conflict and let
      // the caller restart against the new layout. Only layout fields
      // matter here: concurrent SCHEMA evolution stays compatible (per-file
      // schemas are self-describing) and is already covered by the
      // newTableInfo guard when this commit carries its own info change.
      if (addFiles.nonEmpty && newTableInfo.isEmpty && version - 1 > readVersion) {
        snapshotOpt.map(_.tableInfo).foreach { p =>
          val cur = priorState.tableInfo
          if ((cur.bucketNum, cur.hashColumns, cur.rangeColumns) !=
              ((p.bucketNum, p.hashColumns, p.rangeColumns))) {
            throw new GraftConcurrentModificationException(
              s"table layout of $tablePath changed concurrently (snapshot " +
              s"v$readVersion -> v${version - 1}: bucketNum/hash/range " +
              "columns differ); restarting from a fresh snapshot")
          }
        }
      }
      if (strictWindow && version - 1 > readVersion) {
        throw new GraftConcurrentModificationException(
          s"commit(s) landed on $tablePath since snapshot v$readVersion " +
          s"(latest is v${version - 1}); restarting from a fresh snapshot")
      }
      // Conflict rule 1: removing a file that a concurrent commit already
      // removed (or that never existed) is a real conflict; pure appends
      // (delta/append/streaming) always re-apply cleanly on top.
      if ((removeFiles.nonEmpty || rewriteGuard) && version > 0) {
        val live = priorState.files.map(_.path).toSet
        val gone = removeFiles.filterNot(f => live.contains(f.path))
        if (gone.nonEmpty) {
          throw new GraftConcurrentModificationException(
            s"files removed concurrently: ${gone.map(_.path).mkString(", ")}")
        }
        // Conflict rule 2 (lost-update guard): a rewrite (compaction /
        // update / delete / merge-upsert) replaces whole range partitions
        // with base files stamped at THIS commit's version. Any file a
        // concurrent commit ADDED to (or removed from) those partitions
        // since our snapshot would be silently shadowed by newest-version-
        // wins merge-on-read — classic lost update. Detect it and restart
        // the whole rewrite from a fresh snapshot (reference serializes via
        // per-partition locks + commit-type rules, `meta/MetaCommit.scala:
        // 285-431`; this OCC port detects-and-retries instead).
        detectConcurrentPartitionTouch(version, addFiles ++ removeFiles)
      }
      // Streaming idempotence must hold across driver failover: a zombie
      // driver's commit for an already-committed batchId becomes a no-op
      // here (not just at the sink's pre-check, which raced).
      streaming.foreach { s =>
        val committedBatch =
          if (version == 0) -1L
          else priorState.streamingBatchIds.getOrElse(s.queryId, -1L)
        if (s.batchId <= committedBatch) {
          committed = true
          return version - 1 // already applied; staged files are vacuumable
        }
      }
      val entries =
        Seq(LogEntry(commit = Some(CommitInfo(commitType,
          System.currentTimeMillis(), leaseUntil = leaseUntil,
          clusterBy = clusterBy)))) ++
        newTableInfo.map(t => LogEntry(table = Some(t))) ++
        // RESTORE re-adds old files whose merge-on-read ordering must
        // replay as ORIGINALLY committed — including a legitimate
        // writeVersion 0 from the table's first commit, which is why a
        // plain nonzero check cannot express this; fresh files always
        // arrive with 0 and get stamped with this commit's version
        addFiles.map(f => LogEntry(add = Some(
          if (preserveWriteVersions || f.writeVersion != 0L) f
          else f.copy(writeVersion = version)))) ++
        removeFiles.map(f => LogEntry(remove = Some(RemoveFileAction(f.path)))) ++
        streaming.map(s => LogEntry(streaming = Some(s)))
      if (store.commit(tablePath, version, entries)) {
        committed = true
        SnapshotManagement.invalidate(tablePath)
        // Periodic checkpoint so replay stays O(K) instead of O(commits).
        // Best-effort: the replay below reads from the PREVIOUS checkpoint,
        // so writing one costs < K log reads.
        if (version > 0 && version % Snapshot.CHECKPOINT_INTERVAL == 0) {
          try {
            val state = Snapshot.replay(store, tablePath, version)
            store.writeCheckpoint(tablePath, version, CheckpointState(
              state.tableInfo, state.files, state.streamingBatchIds))
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        return version
      }
      attempt += 1
    }
    throw new GraftConcurrentModificationException(
      s"lost commit race $maxAttempts times on $tablePath")
  }

  /** Scan the conflict window (readVersion, commitVersion-1] for adds or
    * removes landing in the range partitions this transaction rewrites.
    * Removed paths are resolved to their partition via the pinned snapshot's
    * file map plus any adds seen inside the window, so every remove in the
    * window is attributable. */
  private def detectConcurrentPartitionTouch(
      commitVersion: Long, touchedFiles: Seq[DataFileInfo]): Unit = {
    val windowStart = readVersion + 1
    if (windowStart >= commitVersion) return // no commits since our snapshot
    val touchedRanges = touchedFiles.map(_.rangeKey).toSet
    val rangeByPath = mutable.HashMap.empty[String, String]
    readSnapshot.foreach(_.files.foreach(f => rangeByPath.put(f.path, f.rangeKey)))
    var v = windowStart
    while (v < commitVersion) {
      store.read(tablePath, v).foreach { e =>
        e.add.foreach { f =>
          rangeByPath.put(f.path, f.rangeKey)
          if (touchedRanges.contains(f.rangeKey)) {
            throw new GraftConcurrentModificationException(
              s"concurrent commit v$v added ${f.path} to partition " +
                s"'${f.rangeKey}' being rewritten (snapshot v$readVersion); " +
                "restarting from a fresh snapshot")
          }
        }
        e.remove.foreach { r =>
          if (rangeByPath.get(r.path).exists(touchedRanges.contains)) {
            throw new GraftConcurrentModificationException(
              s"concurrent commit v$v removed ${r.path} from a partition " +
                s"being rewritten (snapshot v$readVersion); " +
                "restarting from a fresh snapshot")
          }
        }
      }
      v += 1
    }
  }
}
