package graft.write

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

import graft.meta.{DataFileInfo, TableInfo}

/** Physical file writer for Graft tables.
  *
  * Same single-shuffle shape as the reference
  * (`star/TransactionalWrite.scala:113-225`), re-expressed over the public
  * DataFrame API:
  *
  *  - PK (hash-partitioned) tables: `repartition(bucketNum, pk...)` (the ONE
  *    shuffle) puts the rows of bucket `k = pmod(hash(pk), bucketNum)` —
  *    exactly Spark's `HashPartitioning.partitionIdExpression` — into task
  *    partition `k`; `sortWithinPartitions(pk...)` sorts them; a plain
  *    parquet write (no dynamic partitions → Spark inserts no extra sort)
  *    then streams each task's rows into one file in order. The task index
  *    in the `part-NNNNN-` file name is therefore the bucket id, and every
  *    bucket file is PK-sorted — which is what later lets bucket scans
  *    declare `HashPartitioning`/`SortOrder` for shuffle-free joins/aggs.
  *    Range-partitioned PK tables run one such job per range partition
  *    (range partitions are metadata-scale; the reference also plans and
  *    commits per partition).
  *  - Non-PK tables: Hive-style `partitionBy(range...)` write with the
  *    input's own partitioning (no shuffle).
  *
  * Files land in a staging dir and are moved (same-filesystem metadata
  * rename) into the table layout; only the metadata commit makes them live.
  * The driver touches file names only, never data rows.
  */
object TransactionalWrite {
  val HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
  private val PartIdx = "part-(\\d+)-".r

  /** Write `df` into the table layout; returns uncommitted DataFileInfo. */
  def writeFiles(
      spark: SparkSession,
      tablePath: String,
      tableInfo: TableInfo,
      df: DataFrame,
      isBase: Boolean): Seq[DataFileInfo] = {
    val rangeCols = tableInfo.rangeColumns
    val hashCols = tableInfo.hashColumns
    val cols = df.columns.toSeq
    require(rangeCols.forall(cols.contains),
      s"missing range partition columns: ${rangeCols.filterNot(cols.contains)}")
    if (tableInfo.hasPrimaryKey) require(hashCols.forall(cols.contains),
      s"missing primary-key columns: ${hashCols.filterNot(cols.contains)}")

    // NOT NULL / CHECK invariants ride inside the write plan (codegen'd;
    // reference wires InvariantCheckerExec the same way at
    // star/TransactionalWrite.scala:161-172).
    val checked = graft.schema.Invariants.enforce(df, tableInfo)
    if (tableInfo.hasPrimaryKey) writePk(spark, tablePath, tableInfo, checked, isBase)
    else writePlain(tablePath, tableInfo, checked, isBase)
  }

  /** Non-PK: one parquet job, Hive-style dirs for range partitions. */
  private def writePlain(
      tablePath: String, tableInfo: TableInfo, df: DataFrame,
      isBase: Boolean): Seq[DataFileInfo] = {
    val rangeCols = tableInfo.rangeColumns
    val stagingId = newStagingId()
    val stagingDir = Paths.get(tablePath, "_graft_staging", stagingId)
    val writer = df.write.mode("overwrite").option("compression", "snappy")
    (if (rangeCols.nonEmpty) writer.partitionBy(rangeCols: _*) else writer)
      .parquet(stagingDir.toString)

    val dataCols = df.columns.toSeq.filterNot(rangeCols.contains)
    val out = mutable.ArrayBuffer.empty[DataFileInfo]
    var i = 0
    heartbeat(stagingDir)
    walkParquet(stagingDir).foreach { file =>
      heartbeat(stagingDir)
      val rel = stagingDir.relativize(file)
      val dirs = (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
      val values = dirs.map { d =>
        val eq = d.indexOf('=')
        require(eq > 0, s"unexpected staging dir $d")
        d.substring(0, eq) -> ExternalCatalogUtils.unescapePathName(d.substring(eq + 1))
      }.toMap
      out += moveIntoTable(tablePath, tableInfo, file, values, bucket = -1,
        stagingId, i, isBase, dataCols)
      i += 1
    }
    cleanupStaging(tablePath, stagingId)
    out.toSeq
  }

  /** PK: per range partition, repartition into buckets + PK-sort + plain
    * write; task index == bucket id. */
  private def writePk(
      spark: SparkSession, tablePath: String, tableInfo: TableInfo,
      df: DataFrame, isBase: Boolean): Seq[DataFileInfo] = {
    val rangeCols = tableInfo.rangeColumns
    val hashCols = tableInfo.hashColumns
    val ranges: Seq[Row] =
      if (rangeCols.isEmpty) Seq(Row.empty)
      else df.select(rangeCols.map(c => col(quote(c))): _*).distinct().collect().toSeq

    val dataCols = df.columns.toSeq.filterNot(rangeCols.contains)
    val out = mutable.ArrayBuffer.empty[DataFileInfo]
    ranges.foreach { rangeRow =>
      val predicate: Option[Column] = rangeCols.zipWithIndex.map { case (c, idx) =>
        val v = rangeRow.get(idx)
        if (v == null) col(quote(c)).isNull else col(quote(c)) === lit(v)
      }.reduceOption(_ && _)
      val values: Map[String, String] = rangeCols.zipWithIndex.map { case (c, idx) =>
        val v = rangeRow.get(idx)
        c -> (if (v == null) HIVE_NULL else v.toString)
      }.toMap

      val sub = predicate.fold(df)(df.filter).drop(rangeCols: _*)
        .repartition(tableInfo.bucketNum, hashCols.map(c => col(quote(c))): _*)
        .sortWithinPartitions(hashCols.map(c => col(quote(c))): _*)

      val stagingId = newStagingId()
      val stagingDir = Paths.get(tablePath, "_graft_staging", stagingId)
      sub.write.mode("overwrite").option("compression", "snappy")
        .parquet(stagingDir.toString)

      var i = 0
      heartbeat(stagingDir)
      walkParquet(stagingDir).foreach { file =>
        heartbeat(stagingDir)
        val bucket = PartIdx.findFirstMatchIn(file.getFileName.toString)
          .map(_.group(1).toInt)
          .getOrElse(sys.error(s"cannot parse bucket id from ${file.getFileName}"))
        out += moveIntoTable(tablePath, tableInfo, file, values, bucket,
          stagingId, i, isBase, dataCols)
        i += 1
      }
      cleanupStaging(tablePath, stagingId)
    }
    out.toSeq
  }

  private def moveIntoTable(
      tablePath: String, tableInfo: TableInfo, file: Path,
      values: Map[String, String], bucket: Int, stagingId: String, seq: Int,
      isBase: Boolean, dataCols: Seq[String]): DataFileInfo = {
    val root = Paths.get(tablePath)
    val destDirRel = tableInfo.rangeColumns
      .map(c => s"$c=${ExternalCatalogUtils.escapePathName(values(c))}")
      .mkString("/")
    val destDir = if (destDirRel.isEmpty) root else root.resolve(destDirRel)
    Files.createDirectories(destDir)
    val name = f"part-$stagingId-$seq%05d" +
      (if (bucket >= 0) f"-b$bucket%05d" else "") + ".snappy.parquet"
    val dest = destDir.resolve(name)
    Files.move(file, dest)
    // Data-skipping stats: one footer read per written file, riding the
    // commit path next to the move it describes (metadata-only; the
    // footer was just written and is page-cache-warm). Conf-gated.
    val (numRecords, mins, maxs, nulls) = statsFor(tableInfo, dest)
    DataFileInfo(
      path = root.relativize(dest).toString,
      partitionValues = values,
      bucket = bucket,
      size = Files.size(dest),
      modificationTime = System.currentTimeMillis(),
      writeVersion = 0L, // stamped at commit
      isBase = isBase,
      fileExistCols = dataCols,
      numRecords = numRecords,
      minValues = mins,
      maxValues = maxs,
      nullCounts = nulls)
  }

  private def statsFor(tableInfo: TableInfo, dest: Path):
      (Long, Map[String, String], Map[String, String], Map[String, Long]) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val enabled = spark.conf.getOption("spark.graft.stats.enabled")
      .forall(_.toBoolean)
    if (!enabled) return (-1L, Map.empty, Map.empty, Map.empty)
    val maxCols = spark.conf.getOption("spark.graft.stats.maxCols")
      .map(_.toInt).getOrElse(graft.sources.FileStats.DEFAULT_MAX_COLS)
    graft.sources.FileStats.collect(
      new org.apache.hadoop.fs.Path(dest.toString),
      spark.sessionState.newHadoopConf(),
      tableInfo.dataSchema, maxCols)
  }

  private def newStagingId(): String = UUID.randomUUID().toString.take(12)

  /** Keep the staging dir "live" for `CleanupCommand.vacuumStaging`'s
    * newest-mtime liveness check while the move phase runs: the parquet job
    * stamped all file mtimes at write time, so a move phase stalled past the
    * retention window (FS hang, long GC) would otherwise look dead and get
    * its not-yet-moved files vacuumed pre-commit. Best-effort — a missed
    * touch only narrows the protection, never breaks the write. */
  private def heartbeat(stagingDir: Path): Unit =
    try Files.setLastModifiedTime(stagingDir,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => }

  private def cleanupStaging(tablePath: String, stagingId: String): Unit = {
    deleteRecursively(Paths.get(tablePath, "_graft_staging", stagingId))
    // best-effort removal of the (now possibly empty) staging root
    val stagingRoot = Paths.get(tablePath, "_graft_staging")
    try Files.deleteIfExists(stagingRoot) catch { case _: Exception => }
  }

  private def quote(c: String): String = s"`$c`"

  private def walkParquet(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val out = mutable.ArrayBuffer.empty[Path]
    val stream = Files.walk(dir)
    try {
      stream.forEach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
          out += p
      }
    } finally stream.close()
    out.sortBy(_.toString).toSeq
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } finally stream.close()
    }
  }
}
