package graft.sources

import java.util.OptionalLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.{PartitionedFile, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.merge.GraftMergeOperator
import graft.meta.{DataFileInfo, Snapshot, TableInfo}

/** Scan builder for hash-partitioned (primary-key) tables. Reuses
  * `FileScanBuilder`'s catalyst pushdown machinery: partition filters prune
  * the manifest, column pruning shapes the parquet read, and data filters
  * referencing ONLY primary-key columns are pushed into the parquet readers
  * (safe under merge-on-read: all versions of a key share its PK values, so
  * key-level skipping can never resurrect an older version; the reference's
  * per-file pushdown is `MergeParquetPartitionReaderFactory.scala:~76-86`).
  * All data filters remain in the post-scan Filter node, so pushdown is
  * purely an IO optimization.
  */
class GraftBucketScanBuilder(
    spark: SparkSession,
    tablePath: String,
    snapshot: Snapshot,
    index: GraftFileIndex,
    options: CaseInsensitiveStringMap)
  extends FileScanBuilder(spark, index, snapshot.tableInfo.dataSchema) {

  private val pkSet = snapshot.tableInfo.hashColumns.toSet

  override def pushDataFilters(dataFilters: Array[Filter]): Array[Filter] =
    dataFilters.filter(_.references.forall(pkSet.contains))

  override def build(): Scan = {
    val ti = snapshot.tableInfo
    // Partition pruning against the manifest (metadata only, driver-side).
    val byPath = index.fileInfoByStatusPath
    val pruned: Seq[DataFileInfo] =
      index.listFiles(partitionFilters, Seq.empty)
        .flatMap(_.files.map(fs => byPath(fs.getPath.toString)))
    // explicit scan option wins; otherwise the table's DECLARED operators
    // (graft.mergeOperators table property) apply, so plain reads honor
    // the table's own merge semantics
    val mergeOps = Option(options.get(GraftMergeOperator.SCAN_OPTION))
      .map(GraftMergeOperator.parseAssignments)
      .getOrElse(GraftMergeOperator.declaredOperators(ti))
    GraftPkScan(spark, tablePath, ti, pruned, readDataSchema(),
      readPartitionSchema(), pushedDataFilters.toSeq, mergeOps,
      streamIgnoreChanges =
        Option(options.get("ignoreChanges")).exists(_.toBoolean))
  }
}

/** File group of one (range partition, bucket): all versions of the bucket's
  * data, oldest first. */
case class GraftFileGroup(files: Array[GraftFileDesc], partitionValues: UnsafeRow)

case class GraftFileDesc(
    absPath: String,
    length: Long,
    writeVersion: Long,
    isBase: Boolean,
    hasCols: Array[Boolean]) // per merged-layout field

/** One Spark partition == one bucket (files unsplittable, reference
  * `BucketParquetScan.scala:157-170` / `MergeParquetScan.scala:382-431`).
  * `groups` holds the bucket's file groups, one per surviving range
  * partition; rows within a group merge-read PK-sorted.
  */
case class GraftPkInputPartition(bucket: Int, groups: Array[GraftFileGroup])
  extends InputPartition

/** Physical scan of a PK table.
  *
  * Always plans exactly `bucketNum` partitions, partition k holding bucket
  * k's files — the row set of partition k is exactly
  * `pmod(hash(pk), bucketNum) == k` (guaranteed by the write path), which is
  * Spark's own `HashPartitioning.partitionIdExpression`. The post-planner
  * rule uses that to declare `HashPartitioning`/`SortOrder` and elide
  * exchanges/sorts on PK joins and aggregations
  * (reference `SetPartitionAndOrdering.scala:52-140`).
  *
  * Fully compacted buckets stream parquet batches through unchanged
  * (columnar, whole-stage-codegen friendly); buckets with delta files run a
  * k-way heap merge ordered by (pk, writeVersion) with per-column merge
  * operators (reference `MergeMultiFileWithOperator.scala:135-192`).
  */
case class GraftPkScan(
    @transient sparkSession: SparkSession,
    tablePath: String,
    tableInfo: TableInfo,
    files: Seq[DataFileInfo],
    readDataSchema: StructType,
    readPartitionSchema: StructType,
    pushedPkFilters: Seq[Filter],
    mergeOperatorNames: Map[String, String],
    streamIgnoreChanges: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics {

  /** Streaming read: PK delta files stream as the upsert records they are
    * (rows-as-written); see [[GraftMicroBatchStream]] for the semantics. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(sparkSession, tablePath, tableInfo,
      readSchema(), streamIgnoreChanges)

  private def groupKey(f: DataFileInfo): (String, Int) = (f.rangeKey, f.bucket)

  /** A group needs merging unless it is a single deduplicated base file. */
  private def groupNeedsMerge(g: Seq[DataFileInfo]): Boolean =
    g.size > 1 || g.exists(!_.isBase)

  lazy val scanNeedsMerge: Boolean =
    files.groupBy(groupKey).values.exists(groupNeedsMerge)

  /** Columns physically read from files: projected columns plus (when
    * merging) the PK columns the heap compares on. */
  lazy val mergeReadSchema: StructType =
    if (!scanNeedsMerge) readDataSchema
    else {
      val present = readDataSchema.fieldNames.toSet
      val ds = tableInfo.dataSchema
      StructType(readDataSchema.fields ++
        tableInfo.hashColumns.filterNot(present.contains)
          .map(c => ds.fields(ds.fieldIndex(c))))
    }

  override def readSchema(): StructType = GraftPkScan.asNullable(
    StructType(readDataSchema.fields ++ readPartitionSchema.fields))

  override def toBatch: Batch = this

  override def description(): String = {
    val mode = if (scanNeedsMerge) "merge-on-read" else "compacted"
    s"GraftPkScan $tablePath [$mode, buckets=${tableInfo.bucketNum}, " +
      s"files=${files.size}, pushedPkFilters=${pushedPkFilters.mkString(",")}]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val mergedLayoutLen = mergeReadSchema.length + readPartitionSchema.length
    val mergeIdx = mergeReadSchema.fieldNames.zipWithIndex.toMap
    val tz = castToImpl(sparkSession).sessionState.conf.sessionLocalTimeZone
    val proj = UnsafeProjection.create(readPartitionSchema)
    val byBucket = files.groupBy(_.bucket)
    (0 until tableInfo.bucketNum).map { b =>
      val groups = byBucket.getOrElse(b, Nil).groupBy(_.rangeKey).toSeq
        .sortBy(_._1).map { case (_, gfiles) =>
          val head = gfiles.head
          val values = InternalRow.fromSeq(readPartitionSchema.fields.toSeq.map { f =>
            GraftFileIndex.castPartitionValue(
              head.partitionValues.getOrElse(f.name, null), f, tz)
          })
          val sorted = gfiles.sortBy(_.writeVersion)
          GraftFileGroup(
            sorted.map { f =>
              val has = new Array[Boolean](mergedLayoutLen)
              val exist = f.fileExistCols.toSet
              mergeIdx.foreach { case (name, i) =>
                has(i) = exist.contains(name) || f.fileExistCols.isEmpty
              }
              // partition columns are appended by the reader for every file
              var i = mergeReadSchema.length
              while (i < mergedLayoutLen) { has(i) = true; i += 1 }
              GraftFileDesc(s"$tablePath/${f.path}", f.size, f.writeVersion,
                f.isBase, has)
            }.toArray,
            proj.apply(values).copy())
        }
      GraftPkInputPartition(b, groups.toArray)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val session = castToImpl(sparkSession)
    val fmt = new ParquetFileFormat()
    val hadoopConf = session.sessionState.newHadoopConfWithOptions(Map.empty)
    val supportsBatch = fmt.supportBatch(sparkSession,
      StructType(mergeReadSchema.fields ++ readPartitionSchema.fields))
    // Merging consumes rows; only the compacted fast path streams batches.
    val returningBatch = supportsBatch && !scanNeedsMerge
    // all-nullable request: a partial-column delta file legitimately lacks
    // columns (fileExistCols); the vectorized reader null-fills OPTIONAL
    // missing columns but throws for REQUIRED ones, and table schemas can
    // carry NOT NULL (e.g. from a Dataset write). Nullability is a write-
    // time invariant (Invariants.enforce), not a scan-time contract; the
    // k-way merge resolves the nulls via fileExistCols.
    val readFunc = fmt.buildReaderWithPartitionValues(
      sparkSession,
      dataSchema = GraftPkScan.asNullable(tableInfo.dataSchema),
      partitionSchema = readPartitionSchema,
      requiredSchema = GraftPkScan.asNullable(mergeReadSchema),
      filters = pushedPkFilters,
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> returningBatch.toString),
      hadoopConf = hadoopConf)
    // Only the merge path compares PKs; on the compacted fast path the
    // projection may not contain them at all (e.g. count() prunes every
    // column and mergeReadSchema stays empty).
    val pkOrdinals =
      if (scanNeedsMerge) tableInfo.hashColumns.map(mergeReadSchema.fieldIndex).toArray
      else Array.empty[Int]
    val mergedLayout = StructType(mergeReadSchema.fields ++ readPartitionSchema.fields)
    val mergeOps: Map[Int, GraftMergeOperator] = mergeOperatorNames.flatMap {
      case (col, op) => mergeReadSchema.fieldNames.zipWithIndex
        .find(_._1 == col).map(_._2 -> GraftMergeOperator.byName(op))
    }
    val outputOrdinals = readSchema().fieldNames
      .map(n => mergedLayout.fieldIndex(n)).toArray
    GraftPkReaderFactory(readFunc, mergedLayout,
      mergedLayout.fields.map(_.dataType), pkOrdinals, mergeOps,
      outputOrdinals, scanNeedsMerge, returningBatch)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(
      math.max(files.map(_.size).sum, 1L))
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

case class GraftPkReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    mergedLayout: StructType,
    mergedTypes: Array[DataType],
    pkOrdinals: Array[Int],
    mergeOps: Map[Int, GraftMergeOperator],
    outputOrdinals: Array[Int],
    scanNeedsMerge: Boolean,
    supportsBatch: Boolean)
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    !scanNeedsMerge && supportsBatch

  private def partitionedFile(g: GraftFileGroup, f: GraftFileDesc) =
    PartitionedFile(g.partitionValues, SparkPath.fromPathString(f.absPath),
      0, f.length, Array.empty, 0L, f.length, Map.empty)

  private def rawIter(g: GraftFileGroup, f: GraftFileDesc): Iterator[Any] =
    readFunc(partitionedFile(g, f)).asInstanceOf[Iterator[Any]]

  private def rowIter(g: GraftFileGroup, f: GraftFileDesc): Iterator[InternalRow] =
    rawIter(g, f).flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftPkInputPartition]
    val iter: Iterator[InternalRow] =
      if (!scanNeedsMerge) {
        part.groups.iterator.flatMap(g => g.files.iterator.flatMap(f => rowIter(g, f)))
      } else {
        val out = UnsafeProjection.create(
          outputOrdinals.map(i => org.apache.spark.sql.catalyst.expressions
            .BoundReference(i, mergedTypes(i), nullable = true)).toSeq)
        part.groups.iterator.flatMap { g =>
          val merged: Iterator[InternalRow] =
            if (g.files.length == 1 && g.files(0).isBase) {
              g.files.iterator.flatMap(f => rowIter(g, f))
            } else {
              new KWayMergeIterator(
                g.files.map(f => rowIter(g, f).map(_.copy())),
                g.files.map(_.writeVersion),
                g.files.map(_.hasCols),
                pkOrdinals, mergedTypes, mergeOps)
            }
          merged.map(out)
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

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[GraftPkInputPartition]
    val iter: Iterator[ColumnarBatch] = part.groups.iterator.flatMap(g =>
      g.files.iterator.flatMap(f => rawIter(g, f))).map(_.asInstanceOf[ColumnarBatch])
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      override def next(): Boolean =
        if (iter.hasNext) { current = iter.next(); true } else false
      override def get(): ColumnarBatch = current
      override def close(): Unit = ()
    }
  }
}

/** K-way sorted merge over one bucket's versioned files (reference
  * `MergeHeapCommon.scala:28-125` + `MergeMultiFileWithOperator.scala:35-299`).
  *
  * Inputs are PK-sorted; the heap orders by (pk, writeVersion, in-file
  * position). For each distinct key: within one file only the LAST row
  * counts (reference `:216-223`); across files, each column folds the values
  * of every version whose file physically contains the column — default
  * operator keeps the newest, so a partial-column upsert leaves other
  * columns at their previous value.
  */
class KWayMergeIterator(
    iters: Array[Iterator[InternalRow]],
    writeVersions: Array[Long],
    hasCols: Array[Array[Boolean]],
    pkOrdinals: Array[Int],
    types: Array[DataType],
    mergeOps: Map[Int, GraftMergeOperator])
  extends Iterator[InternalRow] {

  private val numFields = types.length
  private val orderings: Array[Ordering[Any]] =
    pkOrdinals.map(i => TypeUtils.getInterpretedOrdering(types(i)))

  private case class Entry(row: InternalRow, fileIdx: Int, seq: Long)

  private def comparePk(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < pkOrdinals.length) {
      val o = pkOrdinals(i)
      val va = if (a.isNullAt(o)) null else a.get(o, types(o))
      val vb = if (b.isNullAt(o)) null else b.get(o, types(o))
      val c =
        if (va == null && vb == null) 0
        else if (va == null) -1
        else if (vb == null) 1
        else orderings(i).compare(va, vb)
      if (c != 0) return c
      i += 1
    }
    0
  }

  // min-heap on (pk, writeVersion, seq)
  private implicit val entryOrd: Ordering[Entry] = new Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int = {
      val c = comparePk(x.row, y.row)
      if (c != 0) return -c // PriorityQueue is a max-heap; reverse
      val v = java.lang.Long.compare(writeVersions(x.fileIdx), writeVersions(y.fileIdx))
      if (v != 0) return -v
      -java.lang.Long.compare(x.seq, y.seq)
    }
  }

  private val heap = mutable.PriorityQueue.empty[Entry]
  private var seqCounter = 0L
  iters.indices.foreach(advance)

  private def advance(fileIdx: Int): Unit = {
    if (iters(fileIdx).hasNext) {
      heap.enqueue(Entry(iters(fileIdx).next(), fileIdx, seqCounter))
      seqCounter += 1
    }
  }

  override def hasNext: Boolean = heap.nonEmpty

  override def next(): InternalRow = {
    val first = heap.dequeue(); advance(first.fileIdx)
    var versions = List(first) // newest-last after reverse below
    while (heap.nonEmpty && comparePk(heap.head.row, first.row) == 0) {
      val e = heap.dequeue(); advance(e.fileIdx)
      versions = e :: versions
    }
    val ordered = versions.reverse // (writeVersion, seq) ascending
    // within one file keep only the last row of this key
    val lastPerFile: Seq[Entry] = ordered.groupBy(_.fileIdx).toSeq
      .map { case (_, es) => es.last }
      .sortBy(e => (writeVersions(e.fileIdx), e.seq))
    val out = new GenericInternalRow(numFields)
    var c = 0
    while (c < numFields) {
      val present = lastPerFile.filter(e => hasCols(e.fileIdx)(c))
      val value = mergeOps.get(c) match {
        case Some(op) if present.nonEmpty =>
          op.merge(present.map(e =>
            if (e.row.isNullAt(c)) null else e.row.get(c, types(c))))
        case _ =>
          if (present.isEmpty) null
          else {
            val e = present.last
            if (e.row.isNullAt(c)) null else e.row.get(c, types(c))
          }
      }
      out.update(c, value)
      c += 1
    }
    out
  }
}

object GraftPkScan {
  /** Deep nullable view of a schema for the read path: scan-time
    * missing-column fill must be allowed even for NOT NULL table columns. */
  private[graft] def asNullable(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))

  private def nullableType(dt: DataType): DataType = dt match {
    case st: StructType => asNullable(st)
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(nullableType(et), containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(nullableType(k), nullableType(v),
        valueContainsNull = true)
    case other => other
  }
}
