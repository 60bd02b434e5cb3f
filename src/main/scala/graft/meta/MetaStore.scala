package graft.meta

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

import scala.util.control.NonFatal

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Pluggable metadata-store contract (replaces the reference's Cassandra
  * keyspace, `com/engineplus/star/meta/MetaTableManage.scala:37-287`).
  * Versions are dense, starting at 0; `commit` must be atomic
  * compare-and-swap on the version number.
  */
trait MetaStore {
  /** Latest committed version, or -1 if the table does not exist. */
  def latestVersion(tablePath: String): Long
  /** Read one commit's entries. */
  def read(tablePath: String, version: Long): Seq[LogEntry]
  /** Atomically commit `entries` as `version`; false = lost the race. */
  def commit(tablePath: String, version: Long, entries: Seq[LogEntry]): Boolean
  def exists(tablePath: String): Boolean = latestVersion(tablePath) >= 0
  /** Best-effort checkpoint of the replayed state at `version`; losing a
    * checkpoint only means a longer replay, never wrong state. */
  def writeCheckpoint(tablePath: String, version: Long, state: CheckpointState): Unit = ()
  /** Newest checkpoint at or below `maxVersion`, if any. */
  def readCheckpoint(tablePath: String, maxVersion: Long): Option[(Long, CheckpointState)] = None
}

object MetaJson {
  implicit val formats: Formats = DefaultFormats
  def writeEntry(e: LogEntry): String = Serialization.write(e)
  def readEntry(s: String): LogEntry = Serialization.read[LogEntry](s)
  def writeCheckpoint(c: CheckpointState): String = Serialization.write(c)
  def readCheckpoint(s: String): CheckpointState =
    Serialization.read[CheckpointState](s)
}

/** Filesystem MetaStore: `<table>/_graft_log/<%020d>.json`, one JSON line
  * per action. CAS via write-temp + hard-link (atomic create-fails-if-exists
  * on POSIX), per the reference's dormant LogStore design
  * (`star/storage/LocalLogStore.scala`, `HadoopFileSystemLogStore.scala`).
  * On an object store this trait would be re-implemented over a
  * conditional-put API; the contract stays the same.
  */
class FsMetaStore extends MetaStore {
  import FsMetaStore._

  override def latestVersion(tablePath: String): Long = {
    val dir = logDir(tablePath)
    if (!Files.isDirectory(dir)) return -1L
    var max = -1L
    val stream = Files.newDirectoryStream(dir, "*.json")
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString.stripSuffix(".json")
        try { val v = name.toLong; if (v > max) max = v }
        catch { case NonFatal(_) => }
      }
    } finally stream.close()
    max
  }

  override def read(tablePath: String, version: Long): Seq[LogEntry] = {
    val f = versionFile(tablePath, version)
    val lines = Files.readAllLines(f, StandardCharsets.UTF_8)
    val out = Seq.newBuilder[LogEntry]
    lines.forEach { l => if (l.nonEmpty) out += MetaJson.readEntry(l) }
    out.result()
  }

  override def commit(
      tablePath: String, version: Long, entries: Seq[LogEntry]): Boolean = {
    val dir = logDir(tablePath)
    Files.createDirectories(dir)
    val target = versionFile(tablePath, version)
    if (Files.exists(target)) return false
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID}-$version.json")
    val body = entries.map(MetaJson.writeEntry).mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(target, tmp) // atomic; fails if target exists
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  override def writeCheckpoint(
      tablePath: String, version: Long, state: CheckpointState): Unit = {
    val dir = logDir(tablePath)
    if (!Files.isDirectory(dir)) return
    val target = checkpointFile(tablePath, version)
    val tmp = dir.resolve(s".tmp-cp-${java.util.UUID.randomUUID}.json")
    Files.write(tmp, MetaJson.writeCheckpoint(state).getBytes(StandardCharsets.UTF_8))
    try {
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      pruneCheckpoints(tablePath, keep = 2)
    } catch { case NonFatal(_) => Files.deleteIfExists(tmp) } // best effort
  }

  /** Keep only the newest `keep` checkpoints — older ones are redundant
    * (any replay below them falls back to walking the retained log, which
    * is never deleted). Best effort. */
  private def pruneCheckpoints(tablePath: String, keep: Int): Unit = {
    val dir = logDir(tablePath)
    val versions = Seq.newBuilder[Long]
    val stream = Files.newDirectoryStream(dir, "*.checkpoint.json")
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString.stripSuffix(".checkpoint.json")
        try versions += name.toLong catch { case NonFatal(_) => }
      }
    } finally stream.close()
    versions.result().sorted.dropRight(keep).foreach { v =>
      try Files.deleteIfExists(checkpointFile(tablePath, v))
      catch { case NonFatal(_) => }
    }
  }

  override def readCheckpoint(
      tablePath: String, maxVersion: Long): Option[(Long, CheckpointState)] = {
    val dir = logDir(tablePath)
    if (!Files.isDirectory(dir)) return None
    val candidates = Seq.newBuilder[Long]
    val stream = Files.newDirectoryStream(dir, "*.checkpoint.json")
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString.stripSuffix(".checkpoint.json")
        try {
          val v = name.toLong
          if (v <= maxVersion) candidates += v
        } catch { case NonFatal(_) => }
      }
    } finally stream.close()
    // newest first, falling back to OLDER retained checkpoints when one is
    // unreadable (a crash mid-move can leave the newest truncated):
    // pruneCheckpoints keeps 2 exactly so a healthy older one bounds the
    // replay; only when every candidate is corrupt does replay go full-log.
    // Same ladder the object-store counterpart walks.
    candidates.result().sorted(Ordering[Long].reverse).iterator.flatMap { v =>
      try {
        val body = new String(
          Files.readAllBytes(checkpointFile(tablePath, v)), StandardCharsets.UTF_8)
        Some(v -> MetaJson.readCheckpoint(body))
      } catch { case NonFatal(_) => None }
    }.nextOption()
  }
}

object FsMetaStore {
  val LOG_DIR_NAME = "_graft_log"
  def logDir(tablePath: String): Path =
    Paths.get(stripScheme(tablePath), LOG_DIR_NAME)
  def versionFile(tablePath: String, version: Long): Path =
    logDir(tablePath).resolve(f"$version%020d.json")
  def checkpointFile(tablePath: String, version: Long): Path =
    logDir(tablePath).resolve(f"$version%020d.checkpoint.json")
  /** Local paths may arrive as file:/, file://, or file:///-prefixed. */
  def stripScheme(p: String): String =
    if (p.startsWith("file:")) "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    else p
}

object MetaStore {
  /** Process-wide default store. */
  val fs: MetaStore = new FsMetaStore
}
