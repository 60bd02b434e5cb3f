package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Deletion-vector file I/O. A DV is a `Roaring64Bitmap` of DELETED row
  * indices (parquet per-file row numbers, as produced by Spark's row-index
  * metadata machinery) serialized under `_dv/` in the table root. All reads
  * and writes go through `org.apache.hadoop.fs.FileSystem`, so DVs work on
  * any table root the data files do (see [[graft.write.GraftFs]]).
  *
  * The reference engine has no deletion vectors (deletes rewrite files,
  * `star/commands/DeleteCommand.scala:69-147`); the format here follows
  * Delta's published DV design (roaring bitmap of row indexes, immutable
  * files, copy-on-write of the VECTOR not the data) re-expressed for this
  * engine's commit log: a DV delete re-adds the same data file with a new
  * `dvPath`, and compaction/rewrites drop the vector by writing purged
  * files.
  *
  * Files are immutable once written (a new delete writes a NEW vector
  * holding the union); orphaned vectors are reclaimed by vacuum like any
  * other unreferenced file.
  */
object DeletionVectors {

  val DV_DIR = "_dv"
  private val MAGIC = 0x47445630 // "GDV0"

  /** Serialize a bitmap to bytes (magic + version + payload). */
  def toBytes(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(MAGIC)
    out.writeByte(1)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Roaring64Bitmap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = in.readInt()
    require(magic == MAGIC, f"not a graft deletion vector (magic 0x$magic%08x)")
    val ver = in.readByte()
    require(ver == 1, s"unsupported deletion-vector version $ver")
    val bm = new Roaring64Bitmap()
    bm.deserialize(in)
    bm
  }

  /** Write a new immutable DV file; returns its table-root-relative path.
    * Callable from executors (takes a bare Configuration). */
  def write(tableRoot: String, conf: Configuration, bm: Roaring64Bitmap): String = {
    val rel = s"$DV_DIR/dv-${UUID.randomUUID().toString}.bin"
    val p = new Path(tableRoot, rel)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try out.write(toBytes(bm)) finally out.close()
    rel
  }

  /** Read a DV by table-root-relative path. Callable from executors. */
  def read(tableRoot: String, conf: Configuration, relPath: String): Roaring64Bitmap = {
    val p = new Path(tableRoot, relPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      fromBytes(buf)
    } finally in.close()
  }
}
