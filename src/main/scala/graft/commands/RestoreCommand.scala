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
  * Known residual race: the vacuum-existence check runs immediately before
  * the commit, but `CleanupCommand` takes no transaction, so a cleanup
  * deleting a restore-target file in that window leaves the restored
  * snapshot referencing a missing file (reads then fail loudly with
  * FileNotFound — wrong availability, never wrong data). Closing it needs
  * vacuum to coordinate through the commit log; until then, do not run
  * vacuum concurrently with restore.
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
      if (version == current.version) {
        restored = version // no-op restore
      } else {
        val target = Snapshot.replay(store, path, version)
        // every restored file must still exist — vacuum may have reclaimed
        // files that only old versions referenced; the sweep runs through
        // Hadoop FS (distributed for large manifests)
        val missingPaths = graft.write.GraftFs
          .missing(spark, path, target.files.map(_.path)).toSet
        val missing = target.files.filter(f => missingPaths.contains(f.path))
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
        // did at the target version
        val adds = {
          val livePaths = current.files.map(_.path).toSet
          target.files.filterNot(f => livePaths.contains(f.path))
        }
        val metaChange =
          if (target.tableInfo == current.tableInfo) None
          else Some(target.tableInfo)
        // rewriteGuard: even an adds-only restore (forward restore whose
        // target is a superset of the live set) shadows concurrent writes
        // like a rewrite — the conflict window must be checked and the
        // whole restore restarted on a concurrent commit
        restored = txn.commit("restore", metaChange, adds, removes,
          rewriteGuard = true, preserveWriteVersions = true)
      }
    }
    restored
  }
}
