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
    graft.write.TransactionalWrite.deleteRecursively(root)
    val byPartition = snapshot.files.groupBy(f =>
      info.rangeColumns.map(c =>
        s"$c=${f.partitionValues.getOrElse(c, "__HIVE_DEFAULT_PARTITION__")}"))
    var written = 0L
    byPartition.toSeq.sortBy(_._1.mkString("/")).foreach {
      case (dirs, files) =>
        val dir = dirs.foldLeft(root)(_.resolve(_))
        Files.createDirectories(dir)
        val lines = files.map(f =>
            "file://" + DataFileInfo.resolve(path, f.path))
          .sorted.mkString("", "\n", "\n")
        // temp + atomic move: a concurrent external reader sees the old
        // manifest or the new one, never a truncated line
        val tmp = Files.createTempFile(dir, ".manifest", ".tmp")
        Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, dir.resolve("manifest"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        written += 1
    }
    written
  }
}
