package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path}
import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

/** Minimal object-store surface the metadata log needs. Maps 1:1 onto
  * real stores:
  *   - S3:   `putIfAbsent` = PutObject with `If-None-Match: *` (conditional
  *           write, GA since 2024), `list` = ListObjectsV2 (strongly
  *           consistent), `get`/`put`/`delete` = the obvious calls.
  *   - GCS:  `putIfAbsent` = insert with `ifGenerationMatch=0`.
  *   - HDFS/ABFS: `putIfAbsent` = create-no-overwrite of a temp file +
  *           atomic rename-without-replace.
  * Everything above this trait is store-agnostic, so a deployment only
  * writes this adapter (the reference reaches the same portability by
  * putting its meta in an external Cassandra service;
  * `com/engineplus/star/meta/MetaTableManage.scala:37-287`).
  */
trait ObjectStoreClient {
  /** Atomic create-if-absent; false when the key already exists. The data
    * must become visible all-or-nothing (no partial reads). */
  def putIfAbsent(key: String, data: Array[Byte]): Boolean
  /** Unconditional overwrite (checkpoints only — losing one is harmless). */
  def put(key: String, data: Array[Byte]): Unit
  def get(key: String): Option[Array[Byte]]
  /** Keys under `prefix` (non-recursive flat listing is fine — the log
    * namespace is flat). */
  def list(prefix: String): Seq[String]
  def delete(key: String): Unit
}

/** MetaStore over an [[ObjectStoreClient]] — the "second implementation"
  * the trait seam was built for: S3/GCS/HDFS deployments get a correct
  * commit log without POSIX hard-links. CAS on the version number is the
  * store's conditional write; everything else is plain get/list.
  *
  * Scale note: `latestVersion` is one LIST of a flat prefix (paginated on a
  * real store). Because version keys are zero-padded and therefore
  * lexicographically ordered, a real deployment lists with `startAfter`
  * seeded from the last seen version to make the call O(new commits);
  * correctness never depends on that optimization.
  */
class ObjectStoreMetaStore(client: ObjectStoreClient) extends MetaStore {
  /** CANONICAL key prefix: leading slash, empty segments collapsed. A
    * scheme'd path ("s3a://bucket/tbl") carries a double slash that the
    * Dir client's list() reconstruction would never reproduce — its keys
    * would then fail the caller's startsWith and latestVersion would stay
    * -1 forever (first commit lands, every read says table-not-found).
    * Canonicalizing ONCE here keeps every client's put/get/list in one
    * key space. */
  private def logPrefix(tablePath: String): String = {
    val p = FsMetaStore.stripScheme(tablePath)
    "/" + (p.split("/").filter(_.nonEmpty) :+ FsMetaStore.LOG_DIR_NAME)
      .mkString("/") + "/"
  }
  private def versionKey(tablePath: String, version: Long): String =
    f"${logPrefix(tablePath)}$version%020d.json"
  private def checkpointKey(tablePath: String, version: Long): String =
    f"${logPrefix(tablePath)}$version%020d.checkpoint.json"

  private def versionsOf(tablePath: String, suffix: String): Seq[Long] = {
    val prefix = logPrefix(tablePath)
    client.list(prefix).flatMap { k =>
      val name = k.stripPrefix(prefix)
      if (!name.endsWith(suffix) || name.contains("/")) None
      else {
        val stem = name.stripSuffix(suffix)
        try if (stem.forall(_.isDigit)) Some(stem.toLong) else None
        catch { case NonFatal(_) => None }
      }
    }
  }

  override def latestVersion(tablePath: String): Long = {
    // the all-digits stem guard in versionsOf already excludes
    // ".checkpoint.json" keys (their stem keeps the ".checkpoint" suffix)
    val vs = versionsOf(tablePath, ".json")
    if (vs.isEmpty) -1L else vs.max
  }

  override def read(tablePath: String, version: Long): Seq[LogEntry] = {
    val body = client.get(versionKey(tablePath, version)).getOrElse(
      throw new java.nio.file.NoSuchFileException(versionKey(tablePath, version)))
    new String(body, StandardCharsets.UTF_8).split("\n").toSeq
      .filter(_.nonEmpty).map(MetaJson.readEntry)
  }

  override def commit(
      tablePath: String, version: Long, entries: Seq[LogEntry]): Boolean = {
    val body = entries.map(MetaJson.writeEntry).mkString("", "\n", "\n")
    client.putIfAbsent(versionKey(tablePath, version),
      body.getBytes(StandardCharsets.UTF_8))
  }

  override def writeCheckpoint(
      tablePath: String, version: Long, state: CheckpointState): Unit = {
    try {
      client.put(checkpointKey(tablePath, version),
        MetaJson.writeCheckpoint(state).getBytes(StandardCharsets.UTF_8))
      versionsOf(tablePath, ".checkpoint.json").sorted.dropRight(2)
        .foreach(v => client.delete(checkpointKey(tablePath, v)))
    } catch { case NonFatal(_) => () } // best effort, like the FS store
  }

  override def readCheckpoint(
      tablePath: String, maxVersion: Long): Option[(Long, CheckpointState)] = {
    val cands = versionsOf(tablePath, ".checkpoint.json")
      .filter(_ <= maxVersion).sorted.reverse
    cands.iterator.flatMap { v =>
      try client.get(checkpointKey(tablePath, v)).map(b =>
        v -> MetaJson.readCheckpoint(new String(b, StandardCharsets.UTF_8)))
      catch { case NonFatal(_) => None } // corrupt: try the next-older one
    }.nextOption()
  }
}

/** Heap-backed client with exact conditional-write semantics — the unit-test
  * stand-in and the concurrency-model reference implementation. */
class InMemoryObjectStoreClient extends ObjectStoreClient {
  private val objects = new ConcurrentHashMap[String, Array[Byte]]()
  override def putIfAbsent(key: String, data: Array[Byte]): Boolean =
    objects.putIfAbsent(key, data) == null
  override def put(key: String, data: Array[Byte]): Unit = objects.put(key, data)
  override def get(key: String): Option[Array[Byte]] = Option(objects.get(key))
  override def list(prefix: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    objects.forEach((k, _) => if (k.startsWith(prefix)) out += k)
    out.result()
  }
  override def delete(key: String): Unit = objects.remove(key)
}

/** Directory-backed client: key path segments become directories under
  * `root` (each SEGMENT url-encoded — a whole-key encoding would blow the
  * 255-byte filename limit for realistic table paths); conditional write is
  * write-temp + hard-link. Gives object-store tests durability across
  * processes without needing a real bucket. */
class DirObjectStoreClient(root: Path) extends ObjectStoreClient {
  private def encSeg(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def decSeg(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  private def fileFor(key: String): Path =
    key.split("/").filter(_.nonEmpty).foldLeft(root)((p, s) => p.resolve(encSeg(s)))

  override def putIfAbsent(key: String, data: Array[Byte]): Boolean = {
    val target = fileFor(key)
    Files.createDirectories(target.getParent)
    if (Files.exists(target)) return false
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.write(tmp, data)
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def put(key: String, data: Array[Byte]): Unit = {
    val target = fileFor(key)
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.write(tmp, data)
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def get(key: String): Option[Array[Byte]] = {
    val f = fileFor(key)
    if (Files.isRegularFile(f)) Some(Files.readAllBytes(f)) else None
  }

  override def list(prefix: String): Seq[String] = {
    if (!Files.isDirectory(root)) return Nil
    val out = Seq.newBuilder[String]
    // visitor, not Files.walk: concurrent committers create and delete
    // .tmp- files in the tree, and walk throws on entries vanishing
    // between list and stat — vanished entries simply are not objects
    Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[Path] {
      override def visitFile(p: Path,
          attrs: java.nio.file.attribute.BasicFileAttributes)
          : java.nio.file.FileVisitResult = {
        if (attrs.isRegularFile && !p.getFileName.toString.startsWith(".tmp-")) {
          val rel = root.relativize(p)
          val key = "/" + (0 until rel.getNameCount)
            .map(i => decSeg(rel.getName(i).toString)).mkString("/")
          if (key.startsWith(prefix)) out += key
        }
        java.nio.file.FileVisitResult.CONTINUE
      }
      override def visitFileFailed(p: Path, e: java.io.IOException)
          : java.nio.file.FileVisitResult =
        java.nio.file.FileVisitResult.CONTINUE
    })
    out.result()
  }

  override def delete(key: String): Unit = Files.deleteIfExists(fileFor(key))
}
