package graft.sources

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.meta.{DataFileInfo, Snapshot, SnapshotManagement, TableInfo}

/** Structured Streaming SOURCE over the commit log — an extra beyond the
  * reference (which ships only a sink, `sources/StarLakeDataSource.scala:45`):
  * the versioned log is exactly a change stream, so `readStream` follows it.
  *
  * Semantics (Delta-source-style):
  *   - offsets are log VERSIONS (dense longs; `json` = the number);
  *   - the first batch is the table's LIVE file set at stream start (initial
  *     snapshot — no double counting of files later rewritten);
  *   - each later batch is the files ADDED by append-like commits
  *     (`create/append/delta/streaming`) in `(start, end]`. PK delta files
  *     stream as the upsert records they are (rows-as-written);
  *   - pure rewrites (`compaction`, `alter`) add no new rows and are always
  *     skipped;
  *   - data-changing rewrites (`overwrite/upsert/update/delete`) FAIL the
  *     stream unless `.option("ignoreChanges", "true")`, which skips them
  *     (downstream then misses those modifications — the caller opted in).
  *
  * Scale: planning reads only the log window's metadata (file names), never
  * data; each batch's files read with the stock vectorized parquet reader.
  */
class GraftMicroBatchStream(
    spark: SparkSession,
    tablePath: String,
    tableInfo: TableInfo,
    requestedSchema: StructType,
    ignoreChanges: Boolean)
  extends MicroBatchStream {

  import GraftMicroBatchStream._

  private def store = SnapshotManagement.store

  override def initialOffset(): Offset = GraftStreamOffset(-1L)

  override def latestOffset(): Offset =
    GraftStreamOffset(store.latestVersion(tablePath))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  /** Files for the batch `(start, end]`. */
  private def batchFiles(start: Long, end: Long): Seq[DataFileInfo] = {
    if (end < 0) return Nil
    if (start < 0) {
      // initial snapshot: the LIVE set at `end` (files added then rewritten
      // away before the stream started must not appear twice)
      return Snapshot.replay(store, tablePath, end).files
    }
    val out = Seq.newBuilder[DataFileInfo]
    var v = start + 1
    while (v <= end) {
      val entries = store.read(tablePath, v)
      val commitType = entries.flatMap(_.commit).headOption
        .map(_.commitType).getOrElse("append")
      if (APPEND_TYPES.contains(commitType)) {
        entries.flatMap(_.add).foreach(f =>
          out += (if (f.writeVersion == 0L) f.copy(writeVersion = v) else f))
      } else if (REWRITE_TYPES.contains(commitType)) {
        () // no new rows
      } else if (!ignoreChanges) {
        throw new UnsupportedOperationException(
          s"streaming read of $tablePath hit a '$commitType' commit at " +
          s"version $v, which modifies existing rows; restart from a fresh " +
          "checkpoint or set .option(\"ignoreChanges\", \"true\") to skip " +
          "such commits (downstream will miss those modifications)")
      }
      v += 1
    }
    out.result()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].version
    val e = end.asInstanceOf[GraftStreamOffset].version
    val partSchema = StructType(requestedSchema.fields.filter(f =>
      tableInfo.rangeColumns.contains(f.name)))
    val tz = castToImpl(spark).sessionState.conf.sessionLocalTimeZone
    val proj = UnsafeProjection.create(partSchema)
    val files = batchFiles(s, e).map { f =>
      val values = InternalRow.fromSeq(partSchema.fields.toSeq.map { sf =>
        GraftFileIndex.castPartitionValue(
          f.partitionValues.getOrElse(sf.name, null), sf, tz)
      })
      (s"$tablePath/${f.path}", f.size, proj.apply(values).copy())
    }
    // bin-pack by size: the INITIAL-snapshot batch can hold the whole
    // table, and one task per file would mean millions of tasks at scale —
    // pack into ~maxPartitionBytes bins (first-fit over the listing order,
    // which groups same-partition files together). Each file is charged
    // openCostInBytes like Spark's own FilePartition packing: without it a
    // small-file table packs thousands of footer-opens into one task.
    val conf = castToImpl(spark).sessionState.conf
    val maxBytes = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val bins = Seq.newBuilder[GraftStreamFilesPartition]
    var cur = List.empty[(String, Long, InternalRow)]
    var curBytes = 0L
    files.foreach { f =>
      val charged = f._2 + openCost
      if (cur.nonEmpty && curBytes + charged > maxBytes) {
        bins += GraftStreamFilesPartition(cur.reverse.toArray)
        cur = Nil; curBytes = 0L
      }
      cur = f :: cur; curBytes += charged
    }
    if (cur.nonEmpty) bins += GraftStreamFilesPartition(cur.reverse.toArray)
    bins.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val partSchema = StructType(requestedSchema.fields.filter(f =>
      tableInfo.rangeColumns.contains(f.name)))
    val dataCols = StructType(requestedSchema.fields.filterNot(f =>
      tableInfo.rangeColumns.contains(f.name)))
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark,
      dataSchema = GraftPkScan.asNullable(tableInfo.dataSchema),
      partitionSchema = partSchema,
      requiredSchema = GraftPkScan.asNullable(dataCols),
      filters = Nil,
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = castToImpl(spark).sessionState.newHadoopConfWithOptions(Map.empty))
    GraftStreamReaderFactory(readFunc)
  }
}

object GraftMicroBatchStream {
  /** Commits whose adds are NEW rows. */
  val APPEND_TYPES: Set[String] = Set("create", "append", "delta", "streaming")
  /** Commits that only rewrite existing rows into new files. */
  val REWRITE_TYPES: Set[String] = Set("compaction", "alter")
}

case class GraftStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One bin of (absPath, length, partitionValues) triples. */
case class GraftStreamFilesPartition(files: Array[(String, Long, InternalRow)])
  extends InputPartition

case class GraftStreamReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bin = p.asInstanceOf[GraftStreamFilesPartition]
    val iter: Iterator[InternalRow] = bin.files.iterator.flatMap {
      case (absPath, length, partValues) =>
        val pf = PartitionedFile(partValues,
          SparkPath.fromPathString(absPath), 0, length, Array.empty, 0L,
          length, Map.empty)
        readFunc(pf).asInstanceOf[Iterator[Any]].flatMap {
          case b: ColumnarBatch => scala.jdk.CollectionConverters
            .IteratorHasAsScala(b.rowIterator()).asScala
          case r: InternalRow => Iterator.single(r)
        }
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (iter.hasNext) { current = iter.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Adds `toMicroBatchStream` to any batch scan the builders produce — the
  * batch path is untouched (pure delegation). */
class GraftStreamableScan(
    delegate: Scan,
    spark: SparkSession,
    tablePath: String,
    tableInfo: TableInfo,
    ignoreChanges: Boolean)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  // stats drive join-side broadcast decisions — losing them through the
  // wrapper would silently degrade batch plans
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    delegate match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }
    }

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    delegate.toBatch
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(spark, tablePath, tableInfo,
      delegate.readSchema(), ignoreChanges)
}
