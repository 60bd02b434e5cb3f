package graft.commands

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.meta.{DataFileInfo, SnapshotManagement, Tombstones}

/** GENERATE symlink_format_manifest: export the CURRENT snapshot's live
  * file list as plain-text manifest files external engines (Hive, Presto,
  * Trino, DuckDB's read_parquet list form) can consume without
  * understanding the graft log — the lakehouse interop primitive Delta
  * ships under the same name.
  *
  * Layout: `_symlink_format_manifest/<partition dirs...>/manifest`, one
  * absolute file URI per line, one manifest per range partition (plus a
  * root manifest for unpartitioned tables). Regenerating replaces the
  * whole directory, so a manifest never mixes snapshots.
  *
  * REFUSALS are the correctness story: external readers see raw parquet,
  * so any state that needs the merge-on-read engine to interpret must not
  * silently export —
  *  - delta files / tombstones (PK last-wins merge order),
  *  - deletion vectors (masked rows would resurrect),
  *  - merge operators (values would read un-combined).
  * All three fail loudly with the remedy (`compaction(force = true)`
  * resolves deltas/tombstones/DVs into plain base files).
  */
object GenerateCommand {

  val MANIFEST_DIR = "_symlink_format_manifest"

  /** Write the manifests; returns the number of manifest files written. */
  def run(spark: SparkSession, tablePath: String): Long = {
    // Manifests are written with local-filesystem APIs (java.nio) — the
    // external-reader contract is "files next to the table". Under an
    // object-store MetaStore the table's data does NOT live on this
    // driver's disk, so writing manifests locally would silently export
    // nothing anyone can read. Fail loudly instead of landing manifests
    // on the wrong medium.
    SnapshotManagement.requireFsStore("GENERATE symlink_format_manifest",
      "for object-store deployments, export manifests through the " +
      "store's own filesystem layer")
    val path = SnapshotManagement.normalize(tablePath)
    val snapshot = SnapshotManagement.snapshot(path)
    val info = snapshot.tableInfo
    require(!snapshot.files.exists(!_.isBase),
      s"table at $path holds merge-on-read delta files; external engines " +
      "cannot replay last-wins merge order — run compaction(force = true) " +
      "first, then generate")
    require(!snapshot.files.exists(f => Tombstones.fileHas(f)),
      s"table at $path holds tombstone markers; run " +
      "compaction(force = true) first, then generate")
    require(!snapshot.files.exists(_.hasDv),
      s"table at $path carries deletion vectors; external engines would " +
      "resurrect masked rows — run compaction(force = true) first")
    val ops = graft.merge.GraftMergeOperator.declaredOperators(info)
    require(ops.isEmpty,
      s"table at $path declares merge operators for " +
      s"[${ops.keys.mkString(", ")}]; external engines would read " +
      "un-combined values — materialize via compaction with the operators " +
      "first")
    val root = Paths.get(path, MANIFEST_DIR)
    val byPartition = snapshot.files.groupBy(f =>
      info.rangeColumns.map(c =>
        s"${escape(c)}=${f.partitionValues.get(c).map(escape)
          .getOrElse("__HIVE_DEFAULT_PARTITION__")}"))
    // write the NEW manifests first (per-file temp + atomic move), THEN
    // drop stale partition directories: a concurrent external reader sees,
    // per partition, the old manifest or the new one — never a globally
    // empty manifest tree (a delete-everything-first regeneration would
    // read as an empty table mid-swap)
    var written = 0L
    val fresh = scala.collection.mutable.Set.empty[java.nio.file.Path]
    byPartition.toSeq.sortBy(_._1.mkString("/")).foreach {
      case (dirs, files) =>
        val dir = dirs.foldLeft(root)(_.resolve(_))
        Files.createDirectories(dir)
        val lines = files.map(f =>
            "file://" + DataFileInfo.resolve(path, f.path))
          .sorted.mkString("", "\n", "\n")
        val tmp = Files.createTempFile(dir, ".manifest", ".tmp")
        Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, dir.resolve("manifest"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        fresh += dir.toAbsolutePath.normalize
        written += 1
    }
    if (Files.isDirectory(root)) {
      // Files.walk holds directory handles until closed; maintainStream
      // regenerates every microbatch, so an unclosed stream leaks handles
      // without bound
      val walk = Files.walk(root)
      val toDrop = Seq.newBuilder[java.nio.file.Path]
      try {
        walk.iterator().forEachRemaining { p =>
          if (p.getFileName.toString == "manifest" &&
              !fresh.contains(p.getParent.toAbsolutePath.normalize))
            toDrop += p.getParent
        }
      } finally walk.close()
      toDrop.result().foreach(d =>
        graft.write.TransactionalWrite.deleteRecursively(d))
    }
    written
  }

  /** CONTINUOUS manifest maintenance: tail the table's change feed and
    * regenerate the manifests once per microbatch (the auto-manifest mode
    * Delta gates behind a table property, as an explicit stream here).
    * Works for base-file tables (appends, overwrites, DV-free deletes);
    * a table drifting into merge-on-read state fails the stream loudly
    * through [[run]]'s refusals rather than exporting wrong data. */
  def maintainStream(
      spark: SparkSession, tablePath: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.ContinuousSync.tail(spark, tablePath, tablePath,
      checkpointDir, trigger, "manifest") {
      run(spark, tablePath); ()
    }

  /** Hive-style partition-path escaping: percent-encode every character
    * Hive deems unsafe in a partition directory name (separators, quoting,
    * wildcards, control chars) so values like `a/b`, `..` or `x=y` cannot
    * corrupt the manifest layout or escape its root. */
  private[commands] def escape(v: String): String = {
    val unsafe = "\"#%'*/:=?\\{[]^"
    val sb = new StringBuilder
    v.foreach { c =>
      if (c < 0x20 || unsafe.indexOf(c.toInt) >= 0)
        sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    val s = sb.toString
    // a bare '.'/'..' path segment would resolve upward/in-place
    if (s == "." || s == "..") s.replace(".", "%2E") else s
  }
}
