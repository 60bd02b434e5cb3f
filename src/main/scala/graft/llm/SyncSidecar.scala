package graft.llm

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Shared sidecar for change-feed-synced indexes ([[MinhashIndex]],
  * [[AnnIndex]]): records which SOURCE table, at which version, the index
  * currently reflects. Lives at the index root (non-parquet, so vacuum
  * never touches it, like the MV meta).
  *
  * Validation is the point: a sidecar naming a DIFFERENT source table, or
  * a source whose latest version went BACKWARDS (table dropped and
  * recreated, or restored past the synced point), means the stored index
  * rows and the feed window no longer describe the same history — applying
  * deltas would corrupt silently. Both fail loudly with a rebuild hint.
  */
private[graft] object SyncSidecar {
  implicit private val formats: org.json4s.Formats = org.json4s.DefaultFormats

  private case class Meta(sourcePath: String, version: Long,
      churn: Option[Long] = None, rebuildDue: Option[Boolean] = None)

  /** UNVALIDATED sidecar read: (sourcePath, version), None when absent or
    * unreadable. For STATUS probes (e.g. replication lag) that must not
    * throw — index writers go through [[readValidatedFull]]. */
  def readMeta(indexDir: String, fileName: String): Option[(String, Long)] =
    readMeta2(indexDir, fileName).map(m => (m.sourcePath, m.version))

  /** Last synced version, after validating the sidecar matches
    * `sourcePath` and `currentVersion` has not gone backwards. -1 when no
    * sidecar exists (first sync = full build). */
  def readValidated(
      indexDir: String, fileName: String, sourcePath: String,
      currentVersion: Long): Long =
    readValidatedFull(indexDir, fileName, sourcePath, currentVersion)._1

  /** (version, churn, rebuildDue) from ONE file read/parse — the three
    * fields always describe the SAME sidecar state, even under a
    * concurrent atomic-rename rewrite (churn 0 / due false for sidecars
    * predating those fields). */
  def readValidatedFull(
      indexDir: String, fileName: String, sourcePath: String,
      currentVersion: Long): (Long, Long, Boolean) = {
    val p = Paths.get(indexDir, fileName)
    if (!Files.exists(p)) return (-1L, 0L, false)
    val m = try {
      org.json4s.jackson.Serialization.read[Meta](
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    } catch {
      case e: Exception =>
        // unreadable sidecar (e.g. torn by a crash on a filesystem without
        // atomic rename): same remedy as every other mismatch — rebuild
        throw new IllegalStateException(
          s"sync sidecar at $p is unreadable (${e.getMessage}) — delete " +
          "the index and rebuild", e)
    }
    require(m.sourcePath == sourcePath,
      s"index at $indexDir is synced to '${m.sourcePath}', not " +
      s"'$sourcePath' — delete the index (or pick the right source) and " +
      "rebuild")
    require(currentVersion >= m.version,
      s"source table $sourcePath is at v$currentVersion but the index at " +
      s"$indexDir reflects v${m.version} — the table history was rewound " +
      "(restore/recreate); delete the index and rebuild")
    (m.version, m.churn.getOrElse(0L), m.rebuildDue.contains(true))
  }

  private def readMeta2(indexDir: String, fileName: String): Option[Meta] = {
    val p = Paths.get(indexDir, fileName)
    if (!Files.exists(p)) return None
    try Some(org.json4s.jackson.Serialization.read[Meta](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
    catch { case _: Exception => None }
  }

  /** UNVALIDATED rebuild-due probe (false when absent/unreadable). */
  def readRebuildDue(indexDir: String, fileName: String): Boolean =
    readMeta2(indexDir, fileName).exists(_.rebuildDue.contains(true))

  def write(
      indexDir: String, fileName: String, sourcePath: String,
      version: Long, churn: Long = 0L, rebuildDue: Boolean = false): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    // temp + atomic rename: a crash mid-write must leave either the old
    // sidecar or the new one, never truncated JSON
    val tmp = Files.createTempFile(Paths.get(indexDir), s".$fileName", ".tmp")
    Files.write(tmp,
      org.json4s.jackson.Serialization.write(
        Meta(sourcePath, version, Some(churn),
          if (rebuildDue) Some(true) else None))
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(indexDir, fileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
