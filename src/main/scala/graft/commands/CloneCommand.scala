package graft.commands

import org.apache.spark.sql.SparkSession

import graft.meta.{DataFileInfo, SnapshotManagement, Snapshot}

/** SHALLOW CLONE: create a new graft table whose initial commit REFERENCES
  * the source snapshot's data files instead of copying them — a zero-copy,
  * O(metadata) fork of a table at a version, the lakehouse "dev/test copy
  * of a 100 TB table in milliseconds" primitive (Delta Lake ships the same
  * feature under CLONE ... SHALLOW; the reference has no analog).
  *
  * Mechanics: cloned entries carry ABSOLUTE paths into the source table
  * ([[DataFileInfo.resolve]] leaves external refs alone everywhere files
  * are opened), while everything the clone WRITES afterwards — upserts,
  * deletes, DVs, compactions — lands under the clone's own root with
  * table-relative paths. Copy-on-write falls out of the ordinary DML
  * paths: a rewrite reads through the external refs and commits local
  * replacements. Compaction therefore doubles as LOCALIZATION — after
  * `compaction(force = true)` no external references remain and the clone
  * is fully independent of the source's storage.
  *
  * Ordering contract: the clone's log starts at version 0, so every
  * post-clone commit stamps writeVersion >= 1. The source's per-file
  * writeVersions (which order delta-stacked upserts within a bucket for
  * merge-on-read) are preserved by an ORDER-PRESERVING remap of the
  * snapshot's distinct values onto `-k+1 .. 0`: the newest source
  * generation keeps the 0 sentinel (so a compacted source clones exactly
  * as before), older generations go negative — strictly below every
  * future commit's stamp, while their relative order (all the merge
  * reader consults) survives intact. Negative writeVersions are ordinary
  * longs to the k-way merge heap and pass `stampedAdds` untouched
  * (non-zero = authoritative), so a LIVE delta-stacked PK table — the
  * "fork the hot 100 TB table NOW" case — clones without a compaction
  * pass first.
  *
  * Safety at the source: vacuum builds its live set from resolved paths,
  * and external refs qualify OUTSIDE the clone root — the clone's vacuum
  * walks only its own directory and can never delete source files. The
  * inverse hazard is inherited from every shallow-clone design, Delta
  * included: a vacuum or DROP on the SOURCE removes files the clone still
  * references. `graft.clone.sourcePath/sourceVersion` in the clone's table
  * configuration records the dependency for operators to audit.
  */
object CloneCommand {

  /** Clone `sourcePath` (at `version`, default latest) into `destPath`.
    * Returns the source version the clone reflects.
    *
    * `deep = true` additionally LOCALIZES the clone before returning: a
    * forced compaction rewrites every partition still referencing source
    * files into files under the clone's own root (the same distributed
    * rewrite CoW uses — never a driver-side file copy loop), so the
    * result has zero dependency on the source's storage and survives a
    * source vacuum/DROP. The shallow commit lands first, so a crash
    * mid-localization leaves a valid shallow clone whose localization any
    * later `compaction(force = true)` completes. */
  def run(
      spark: SparkSession,
      sourcePath: String,
      destPath: String,
      version: Option[Long] = None,
      deep: Boolean = false): Long = {
    val src = SnapshotManagement.normalize(sourcePath)
    val dest = SnapshotManagement.normalize(destPath)
    require(src != dest, s"clone source and destination are the same: $src")
    // a relative source would commit file references that fail the
    // isExternal test and get re-resolved under the CLONE root — silently
    // reading missing (or wrong) files
    require(DataFileInfo.isExternal(src),
      s"clone source must be an absolute path or URI (got '$sourcePath'): " +
      "cloned entries reference source files by external absolute path")
    if (SnapshotManagement.exists(dest)) {
      throw new IllegalArgumentException(
        s"clone destination already exists: $dest")
    }
    val snap = version match {
      case Some(v) => SnapshotManagement.snapshotAt(src, v)
      case None => SnapshotManagement.snapshot(src)
    }
    // order-preserving writeVersion remap onto -k+1 .. 0 (newest -> the 0
    // sentinel): delta-stack merge order survives the clone, and every
    // post-clone commit (writeVersion >= 1) outranks all cloned state
    val distinctWv = snap.files.map(_.writeVersion).distinct.sorted
    val rank: Map[Long, Long] = distinctWv.zipWithIndex.map { case (v, i) =>
      v -> (i.toLong - (distinctWv.size - 1)) }.toMap
    val files = snap.files.map { f =>
      f.copy(
        path = DataFileInfo.resolve(src, f.path),
        dvPath = if (f.hasDv) DataFileInfo.resolve(src, f.dvPath) else "",
        writeVersion = rank(f.writeVersion))
    }
    val info = snap.tableInfo.copy(
      tableId = java.util.UUID.randomUUID().toString,
      // short names are catalog-global handles; the clone must not steal
      // the source's registration
      shortName = None,
      configuration = snap.tableInfo.configuration ++ Map(
        "graft.clone.sourcePath" -> src,
        "graft.clone.sourceVersion" -> snap.version.toString))
    SnapshotManagement.withNewTransaction(dest) { txn =>
      txn.commit("clone", Some(info), files, Nil,
        preserveWriteVersions = true, expectVersion = 0L)
    }
    if (deep) {
      CompactionCommand.run(spark, dest, force = true)
      val after = SnapshotManagement.snapshot(dest)
      require(!hasExternalRefs(after),
        s"deep clone of $src left external references in $dest — " +
        "forced compaction did not localize every partition (bug)")
    }
    snap.version
  }

  /** True while the snapshot still references files outside its own root —
    * i.e. the clone has not yet been fully localized by rewrites. */
  def hasExternalRefs(snapshot: Snapshot): Boolean =
    snapshot.files.exists(f => DataFileInfo.isExternal(f.path) ||
      (f.hasDv && DataFileInfo.isExternal(f.dvPath)))

}
