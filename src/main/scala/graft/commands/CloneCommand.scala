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
  * Ordering contract (why the compacted-source requirement exists): the
  * clone's log starts at version 0, so every cloned file is committed with
  * `writeVersion = 0` and every post-clone commit stamps a HIGHER version —
  * merge-on-read ordering between cloned state and new writes is always
  * correct. But collapsing the source's writeVersions to one value is only
  * faithful when no two source files in the same (range, bucket) carry
  * DIFFERENT writeVersions — i.e. no delta stacks whose relative order the
  * collapse would erase. A fully-compacted PK snapshot satisfies this
  * per construction (one base generation per bucket, disjoint keys within
  * it); non-PK tables satisfy it vacuously (append-only files with
  * disjoint rows + per-path DV replacement — the merge reader never orders
  * them by writeVersion). When the check fails the command refuses with
  * the remedy (compact first) rather than committing a clone whose merge
  * reader would resolve upserts in the wrong order.
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
    * Returns the source version the clone reflects. */
  def run(
      spark: SparkSession,
      sourcePath: String,
      destPath: String,
      version: Option[Long] = None): Long = {
    val src = SnapshotManagement.normalize(sourcePath)
    val dest = SnapshotManagement.normalize(destPath)
    require(src != dest, s"clone source and destination are the same: $src")
    if (SnapshotManagement.exists(dest)) {
      throw new IllegalArgumentException(
        s"clone destination already exists: $dest")
    }
    val snap = version match {
      case Some(v) => SnapshotManagement.snapshotAt(src, v)
      case None => SnapshotManagement.snapshot(src)
    }
    requireCollapsibleOrdering(src, snap)
    val files = snap.files.map { f =>
      f.copy(
        path = DataFileInfo.resolve(src, f.path),
        dvPath = if (f.hasDv) DataFileInfo.resolve(src, f.dvPath) else "",
        // one collapsed generation: every post-clone commit (v >= 1)
        // outranks the cloned state, exactly like a fresh initial write
        writeVersion = 0L)
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
    snap.version
  }

  /** True while the snapshot still references files outside its own root —
    * i.e. the clone has not yet been fully localized by rewrites. */
  def hasExternalRefs(snapshot: Snapshot): Boolean =
    snapshot.files.exists(f => DataFileInfo.isExternal(f.path) ||
      (f.hasDv && DataFileInfo.isExternal(f.dvPath)))

  /** Refuse snapshots whose merge-on-read semantics depend on writeVersion
    * ORDER between files of the same (range, bucket) — collapsing those to
    * one generation would erase which upsert wins. Only PK tables order by
    * writeVersion; one base generation per bucket (what compaction leaves
    * behind) collapses faithfully. */
  private def requireCollapsibleOrdering(src: String, snap: Snapshot): Unit = {
    if (!snap.tableInfo.hasPrimaryKey) return
    val offending = snap.files
      .groupBy(f => (f.rangeKey, f.bucket))
      .collect { case (k, fs)
          if fs.exists(!_.isBase) || fs.map(_.writeVersion).distinct.size > 1 =>
        k
      }
    if (offending.nonEmpty) {
      throw new IllegalStateException(
        s"cannot shallow-clone $src at v${snap.version}: " +
        s"${offending.size} bucket(s) hold delta files or multiple write " +
        "generations, whose merge order a clone cannot preserve. Run " +
        "compaction on the source (CALL graft.compact) and clone the " +
        "compacted version.")
    }
  }
}
