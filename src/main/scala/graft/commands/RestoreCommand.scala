package graft.commands

import org.apache.spark.sql.SparkSession

import graft.meta.{GraftTableNotFoundException, Snapshot, SnapshotManagement}

/** RESTORE: rewind the table to a past version with ONE metadata commit —
  * the old snapshot's file list is re-committed as the live set (the files
  * themselves still sit in the table directory until vacuumed), current
  * files not in it are removed. No data is read or written; restore cost
  * is O(file count), never O(bytes). The lineage is preserved: the restore
  * is a NEW commit on top of the log (time travel to the pre-restore
  * version still works), exactly Delta's RESTORE semantics.
  *
  * Fails loudly when a needed file has already been vacuumed — a restore
  * that silently dropped rows would be worse than no restore. Runs under
  * the rewrite-transaction conflict rules (restart on concurrent commit),
  * with the rewrite guard FORCED even for adds-only restores.
  *
  * Restore-vs-vacuum serializes THROUGH THE COMMIT LOG: vacuum commits a
  * leased `vacuum` marker before its delete phase (`CleanupCommand`), so
  *  - a restore that pins its snapshot BEFORE the marker loses the commit
  *    CAS to it, restarts, sees the open lease and fails cleanly;
  *  - a restore that pins AFTER the marker sees the lease directly;
  *  - a restore that COMMITS first invalidates the vacuum's strict-window
  *    marker, restarting the vacuum against the restored file set.
  * Either loser stops BEFORE deleting/committing — a vacuum can no longer
  * delete a file between this command's existence check and its commit.
  */
object RestoreCommand {

  def run(spark: SparkSession, tablePath: String, version: Long): Long = {
    val path = SnapshotManagement.normalize(tablePath)
    val store = SnapshotManagement.store
    var restored = -1L
    SnapshotManagement.withRewriteTransaction(path) { txn =>
      val current = txn.snapshotOpt.getOrElse(
        throw new GraftTableNotFoundException(path))
      require(version >= 0 && version <= current.version,
        s"restore version $version out of range [0, ${current.version}] for $path")
      // an open vacuum lease means a delete phase may be running — the
      // existence check below could pass for a file that dies moments
      // later; fail cleanly instead (a marker committing AFTER this check
      // is caught by the commit CAS + rewrite restart, which re-runs it)
      CleanupCommand.activeLease(store, path, current.version,
          System.currentTimeMillis()).foreach { case (v, until) =>
        throw new IllegalStateException(
          s"cannot restore $path: vacuum in progress (lease committed at " +
          s"v$v, expires ${java.time.Instant.ofEpochMilli(until)}); retry " +
          "after it completes")
      }
      if (version == current.version) {
        restored = version // no-op restore
      } else {
        val target = Snapshot.replay(store, path, version)
        // every restored file — data AND its deletion vector — must still
        // exist; vacuum may have reclaimed files that only old versions
        // referenced; the sweep runs through Hadoop FS (distributed for
        // large manifests)
        val needed = target.files.map(_.path) ++
          target.files.collect { case f if f.hasDv => f.dvPath }
        val missingPaths = graft.write.GraftFs.missing(spark, path, needed).toSet
        val missing = target.files.filter(f => missingPaths.contains(f.path) ||
          (f.hasDv && missingPaths.contains(f.dvPath)))
        if (missing.nonEmpty) {
          throw new IllegalStateException(
            s"cannot restore $path to version $version: ${missing.length} " +
            s"file(s) were vacuumed (first: ${missing.head.path}); " +
            "only versions within the vacuum retention window are restorable")
        }
        val targetPaths = target.files.map(_.path).toSet
        val removes = current.files.filterNot(f => targetPaths.contains(f.path))
        // adds carry their ORIGINAL writeVersions (commit preserves
        // non-zero stamps) so merge-on-read ordering replays exactly as it
        // did at the target version. Compare ENTRIES, not paths: a file
        // live in both versions under a DIFFERENT deletion vector (a DV
        // delete between them) must be re-added so replay restores the
        // target's mask — path identity alone would silently keep the
        // current one
        val adds = {
          val liveByPath = current.files.map(f => f.path -> f).toMap
          target.files.filterNot(f => liveByPath.get(f.path).contains(f))
        }
        val metaChange =
          if (target.tableInfo == current.tableInfo) None
          else Some(target.tableInfo)
        // rewriteGuard: even an adds-only restore (forward restore whose
        // target is a superset of the live set) shadows concurrent writes
        // like a rewrite. strictWindow: the commit must fail on ANY
        // intervening commit — a vacuum MARKER adds/removes nothing, so
        // the rewrite conflict rules alone would wave the restore through
        // on an in-loop CAS retry WITHOUT re-running the lease/existence
        // checks, and the vacuum (live set pinned pre-restore) would then
        // delete the files this restore just resurrected. A strict
        // conflict restarts the whole body instead, which re-checks the
        // lease against the fresh snapshot.
        restored = txn.commit("restore", metaChange, adds, removes,
          rewriteGuard = true, preserveWriteVersions = true,
          strictWindow = true)
      }
    }
    restored
  }
}
