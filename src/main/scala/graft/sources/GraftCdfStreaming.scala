package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{DataFileInfo, Snapshot, TableInfo}
import graft.tables.ChangeFeed

/** STREAMING Change Data Feed:
  * `readStream.format("graft").option("readChangeFeed", "true")` emits every
  * row-level change as it commits, with the Delta-CDF column convention
  * (`_change_type` / `_commit_version` / `_commit_timestamp`) appended —
  * the batch `ChangeFeed` semantics, version by version, through the same
  * admission-controlled micro-batch machinery as the plain source
  * (maxFilesPerTrigger / maxBytesPerTrigger / Trigger.AvailableNow /
  * checkpoint restart all work unchanged).
  *
  * Per-commit mapping:
  *   - initial snapshot (or from `startingVersion`): merged current state,
  *     `insert`;
  *   - `append`/`create`/`streaming`: added rows, `insert`;
  *   - `delta` (merge-on-read upsert): rows as written, `upsert`;
  *   - `overwrite`: removed files' merged pre-state `delete` + added files
  *     `insert`;
  *   - `update`/`delete`/merge-upsert/`restore` (PK tables): a ZERO-SHUFFLE
  *     row diff — the write path keeps pre- and post-files bucket-aligned,
  *     so each task opens the touched (range, bucket) group's pre-state and
  *     post-state with two merge readers (both PK-sorted) and emits
  *     `insert`/`delete`/`update_preimage`/`update_postimage` from a single
  *     sort-merge pass. Untouched groups are skipped by file-set equality,
  *     so a restore streams O(changed partitions), not O(table);
  *   - `compaction`/`alter`/`vacuum` markers: no logical change, skipped;
  *   - non-PK data-changing rewrites have no per-key identity to diff
  *     inside a task: the stream fails loudly (or skips them under
  *     `ignoreChanges`) and points at the batch TVF.
  *
  * Scale: planning touches only each version's log metadata; the diff work
  * is proportional to the data the commit rewrote and runs one task per
  * touched bucket group with no exchange.
  */
class GraftCdfMicroBatchStream(
    spark: SparkSession,
    tablePath: String,
    tableInfo: TableInfo,
    baseSchema: StructType, // data + range columns, WITHOUT the change cols
    ignoreChanges: Boolean,
    options: Map[String, String])
  extends GraftMicroBatchStream(
    spark, tablePath, tableInfo, baseSchema, ignoreChanges, options) {

  import GraftMicroBatchStream.REWRITE_TYPES

  /** `startingVersion` skips the initial snapshot and begins the feed at
    * the given commit (Delta option parity). */
  private val startingVersion: Option[Long] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("startingVersion") =>
      v.toLong }

  override def initialOffset(): Offset = startingVersion match {
    case Some(v) => GraftStreamOffset(math.max(v, 0L) - 1L, -1L)
    case None => GraftStreamOffset(-1L, -1L)
  }

  override protected def initialSnapshotEnabled: Boolean =
    startingVersion.isEmpty

  // ------------------------------------------------------------------
  // per-version change summaries
  // ------------------------------------------------------------------

  private case class VersionChanges(
      commitType: String, tsMillis: Long,
      adds: Seq[DataFileInfo], removed: Seq[DataFileInfo])

  private val changeCache = mutable.LongMap.empty[VersionChanges]

  private def commitChanges(v: Long): VersionChanges =
    changeCache.getOrElseUpdate(v, {
      val entries = store.read(tablePath, v)
      val info = entries.flatMap(_.commit).headOption
      val tpe = info.map(_.commitType).getOrElse("append")
      val ts = info.map(_.timestamp).getOrElse(0L)
      val adds = graft.meta.DataFileInfo.stampedAdds(entries, v)
      val removePaths = entries.flatMap(_.remove).map(_.path).toSet
      val removed =
        if (removePaths.isEmpty) Nil
        else Snapshot.replay(store, tablePath, v - 1).files
          .filter(f => removePaths(f.path))
      VersionChanges(tpe, ts, adds, removed)
    })

  /** Admission accounting: a CDF batch's cost covers both sides of the
    * diff. Never throws — rewrites are this source's whole point. */
  override protected def admissionFiles(v: Long): Seq[DataFileInfo] = {
    val c = commitChanges(v)
    if (REWRITE_TYPES.contains(c.commitType)) Nil else c.adds ++ c.removed
  }

  override def commit(end: Offset): Unit = {
    super.commit(end)
    val e = end.asInstanceOf[GraftStreamOffset]
    if (e.index < 0) changeCache.keys.filter(_ <= e.version)
      .foreach(changeCache.remove)
  }

  // ------------------------------------------------------------------
  // planning
  // ------------------------------------------------------------------

  private def tagAll(parts: Array[InputPartition], tpe: String, v: Long,
      ts: Long): Array[InputPartition] =
    parts.map(p => CdfTaggedPartition(p, tpe, v, ts): InputPartition)

  /** Merged read of `files` (PK: one partition per bucket; non-PK: bins). */
  private def mergedPartitions(files: Seq[DataFileInfo]): Array[InputPartition] =
    if (files.isEmpty) Array.empty
    else if (tableInfo.hasPrimaryKey) {
      pkScanFor(files).planInputPartitions().collect {
        case p: GraftPkInputPartition if p.groups.nonEmpty => p: InputPartition
      }
    } else {
      checkNullFill(files)
      binPack(files)
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (e.version < 0) return Array.empty
    if (inSnapshotPhase(s)) {
      // initial snapshot slice, tagged insert at the pinned version
      val sv = if (s.version < 0) e.version else s.version
      require(e.version == sv,
        s"corrupt offsets: initial snapshot pinned at $sv but batch end is ${e.version}")
      val units = snapshotUnits(sv)
      val from = math.max(s.index, 0L).toInt
      val until = if (e.index >= 0) e.index.toInt else units.length
      val slice = units.slice(from, until)
      if (slice.isEmpty) return Array.empty
      val ts = commitChanges(sv).tsMillis
      tagAll(mergedPartitions(slice.flatten), "insert", sv, ts)
    } else {
      ((s.version + 1) to e.version).iterator
        .flatMap(planVersion).toArray
    }
  }

  private def planVersion(v: Long): Seq[InputPartition] = {
    val c = commitChanges(v)
    c.commitType match {
      case t if REWRITE_TYPES.contains(t) => Nil
      case "create" | "clone" | "append" | "streaming" =>
        // self-contained new rows: raw file reads
        checkNullFill(c.adds)
        tagAll(binPack(c.adds), "insert", v, c.tsMillis).toSeq
      case "delta" if !graft.meta.Tombstones.anyHas(c.adds) =>
        checkNullFill(c.adds)
        tagAll(binPack(c.adds), "upsert", v, c.tsMillis).toSeq
      case "delta" =>
        // tombstone-bearing delta (MERGE with a DELETE clause / tombstone
        // DELETE): rows-as-written would misreport deleted keys as upserts;
        // the exact pre/post diff emits insert/delete/update pairs instead
        diffPartitions(v, c)
      case "overwrite" =>
        // a replacement is a statement about every changed file
        tagAll(mergedPartitions(c.removed), "delete", v, c.tsMillis).toSeq ++
          tagAll(mergedPartitions(c.adds), "insert", v, c.tsMillis).toSeq
      case "delete" if !tableInfo.hasPrimaryKey &&
          c.adds.isEmpty && c.removed.nonEmpty =>
        // partition-scoped metadata-only DELETE (files removed whole,
        // nothing rewritten): the removed files' surviving rows ARE the
        // exact deletions — no pre/post pairing needed, same shape as the
        // overwrite case's removed side (and exactly what the batch feed
        // emits for this commit). DV-masked rows were already dead and do
        // not re-report.
        tagAll(mergedPartitions(c.removed), "delete", v, c.tsMillis).toSeq
      case _ => // update | delete | merge-upsert | restore | unknown rewrite
        if (tableInfo.hasPrimaryKey) diffPartitions(v, c)
        else dvOnlyPartitions(v, c).getOrElse {
          if (ignoreChanges) Nil
          else throw new UnsupportedOperationException(
            s"streaming change feed of $tablePath hit a '${c.commitType}' " +
            s"commit at version $v on a non-primary-key table; row-level " +
            "diffs need a key to pair pre/post images inside a task. Use the " +
            "batch feed (graft_table_changes) for this window, or set " +
            ".option(\"ignoreChanges\", \"true\") to skip such commits")
        }
    }
  }

  /** A non-PK update/delete whose row-level changes are fully expressible
    * as deletion-vector growth IS streamable without keys: each re-added
    * file's newly-masked rows (dvNew \ dvOld — row indices against the
    * immutable file) are the exact pre-images/deletions, and an update's
    * appended image files are self-contained post-images. Commits that
    * also REWROTE files (threshold fallback, fully-dead removal) still
    * need the whole-row diff and stay unstreamable. */
  private def dvOnlyPartitions(
      v: Long, c: VersionChanges): Option[Seq[InputPartition]] = {
    if (c.commitType != "update" && c.commitType != "delete") return None
    if (c.removed.nonEmpty || c.adds.isEmpty) return None
    val prevByPath = Snapshot.replay(store, tablePath, v - 1)
      .files.map(f => f.path -> f).toMap
    val (reAdds, freshAdds) = c.adds.partition(f => prevByPath.contains(f.path))
    if (reAdds.isEmpty ||
        !reAdds.forall(f => f.hasDv && prevByPath(f.path).dvPath != f.dvPath))
      return None
    val preLabel =
      if (c.commitType == "delete") "delete" else "update_preimage"
    val tz = org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.conf.sessionLocalTimeZone
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(partSchema)
    val dvParts: Seq[InputPartition] = reAdds.map { f =>
      val values = InternalRow.fromSeq(partSchema.fields.toSeq.map { sf =>
        GraftFileIndex.castPartitionValue(
          f.partitionValues.getOrElse(sf.name, null), sf, tz)
      })
      CdfDvPartition(f.resolvedPath(tablePath), f.size,
        proj.apply(values).copy(),
        prevByPath(f.path).dvPath, f.dvPath, preLabel, v, c.tsMillis)
    }
    val postParts =
      if (freshAdds.isEmpty) Nil
      else {
        checkNullFill(freshAdds)
        tagAll(binPack(freshAdds), "update_postimage", v, c.tsMillis).toSeq
      }
    Some(dvParts ++ postParts)
  }

  /** Pair each touched (range, bucket) group's pre-state (version v-1) with
    * its post-state (version v); groups with identical file sets diff to
    * nothing and are skipped. */
  private def diffPartitions(v: Long, c: VersionChanges): Seq[InputPartition] = {
    val touched = (c.adds ++ c.removed).map(f => (f.rangeKey, f.bucket)).toSet
    if (touched.isEmpty) return Nil
    val prevSnap = Snapshot.replay(store, tablePath, v - 1)
    val snap = Snapshot.replay(store, tablePath, v)
    def filesOf(s: Snapshot) =
      s.files.filter(f => touched((f.rangeKey, f.bucket)))
    val preParts = pkScanFor(filesOf(prevSnap)).planInputPartitions()
      .collect { case p: GraftPkInputPartition => p }
    val postParts = pkScanFor(filesOf(snap)).planInputPartitions()
      .collect { case p: GraftPkInputPartition => p }
    def keyed(parts: Array[GraftPkInputPartition]) = parts.map(p =>
      p.bucket -> p.groups.map(g => g.partitionValues -> g).toMap).toMap
    val pre = keyed(preParts)
    val post = keyed(postParts)
    def fileSet(g: Option[GraftFileGroup]): Set[(String, Long)] =
      g.map(_.files.map(f => (f.absPath, f.writeVersion)).toSet)
        .getOrElse(Set.empty)
    val out = Seq.newBuilder[InputPartition]
    (pre.keySet ++ post.keySet).toSeq.sorted.foreach { b =>
      val pg = pre.getOrElse(b, Map.empty)
      val qg = post.getOrElse(b, Map.empty)
      (pg.keySet ++ qg.keySet).foreach { pv =>
        val l = pg.get(pv)
        val r = qg.get(pv)
        if (fileSet(l) != fileSet(r)) {
          out += CdfDiffPartition(b, l, r, v, c.tsMillis)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // reading
  // ------------------------------------------------------------------

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = super.createReaderFactory().asInstanceOf[GraftStreamReaderFactory]
    // output layout of every inner reader: dataCols ++ partSchema
    val layout = StructType(dataCols.fields ++ partSchema.fields)
    val keyOrdinals = tableInfo.hashColumns.map(c =>
      layout.fieldNames.indexWhere(_.equalsIgnoreCase(c))).toArray
    val compareOrdinals = layout.fields.indices
      .filterNot(keyOrdinals.contains).toArray
    GraftCdfReaderFactory(inner, layout, keyOrdinals, compareOrdinals)
  }
}

/** Appends the three CDF columns to whatever `inner` emits. */
case class CdfTaggedPartition(
    inner: InputPartition, changeType: String, version: Long, tsMillis: Long)
  extends InputPartition

/** One deletion-vector re-add: the file's rows at indices in
  * (dvNew \ dvOld) are this commit's pre-images/deletions. */
case class CdfDvPartition(
    absPath: String,
    length: Long,
    partValues: InternalRow,
    dvOld: String,
    dvNew: String,
    changeType: String,
    version: Long,
    tsMillis: Long)
  extends InputPartition

/** One touched (range, bucket) group's pre/post pair for a rewrite diff. */
case class CdfDiffPartition(
    bucket: Int,
    pre: Option[GraftFileGroup],
    post: Option[GraftFileGroup],
    version: Long,
    tsMillis: Long)
  extends InputPartition

case class GraftCdfReaderFactory(
    inner: GraftStreamReaderFactory,
    layout: StructType,
    keyOrdinals: Array[Int],
    compareOrdinals: Array[Int])
  extends PartitionReaderFactory {

  private def changeRow(tpe: String, v: Long, tsMillis: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(tpe), v, tsMillis * 1000L))

  private def tagged(
      it: PartitionReader[InternalRow], tpe: String, v: Long,
      ts: Long): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      private val tag = changeRow(tpe, v, ts)
      override def next(): Boolean = it.next()
      override def get(): InternalRow = joined(it.get(), tag)
      override def close(): Unit = it.close()
    }

  /** Row ordering over the PK columns (both sides emit PK-sorted rows). */
  private def keyOrdering: Ordering[InternalRow] =
    new LazilyGeneratedOrdering(keyOrdinals.toIndexedSeq.map(i =>
      SortOrder(BoundReference(i, layout(i).dataType, nullable = true),
        org.apache.spark.sql.catalyst.expressions.Ascending)))

  /** Pre/post value EQUALITY (the diff never needs an order): codegen'd
    * ordering over the orderable columns, plus interpreted semantic
    * equality for unorderable ones — a MAP column would make
    * GenerateOrdering throw at reader creation, failing the stream for a
    * table the write path happily accepts. Map equality is unordered
    * (entry multisets; SQL map keys are always orderable scalars). Any
    * other unorderable type conservatively compares unequal — a spurious
    * update pre/post pair beats a crashed stream or a missed change. */
  private def valuesEqualFn: (InternalRow, InternalRow) => Boolean = {
    import org.apache.spark.sql.catalyst.util.TypeUtils
    val (orderable, unorderable) = compareOrdinals.partition(i =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(layout(i).dataType))
    val ord: Ordering[InternalRow] =
      if (orderable.isEmpty) null
      else new LazilyGeneratedOrdering(orderable.toIndexedSeq.map(i =>
        SortOrder(BoundReference(i, layout(i).dataType, nullable = true),
          org.apache.spark.sql.catalyst.expressions.Ascending)))
    def valueEq(dt: org.apache.spark.sql.types.DataType,
        a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case _ => dt match {
        case mt: org.apache.spark.sql.types.MapType =>
          val (ma, mb) =
            (a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
             b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])
          if (ma.numElements() != mb.numElements()) false
          else {
            val ko = TypeUtils.getInterpretedOrdering(mt.keyType)
              .asInstanceOf[Ordering[Any]]
            def entries(m: org.apache.spark.sql.catalyst.util.MapData) =
              (0 until m.numElements()).map(i =>
                (m.keyArray().get(i, mt.keyType),
                 m.valueArray().get(i, mt.valueType))).sortBy(_._1)(ko)
            entries(ma).zip(entries(mb)).forall { case ((k1, v1), (k2, v2)) =>
              ko.compare(k1, k2) == 0 && valueEq(mt.valueType, v1, v2)
            }
          }
        case other
            if org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(other) =>
          TypeUtils.getInterpretedOrdering(other)
            .asInstanceOf[Ordering[Any]].compare(a, b) == 0
        case _ => false
      }
    }
    (pre, post) =>
      (ord == null || ord.compare(pre, post) == 0) &&
      unorderable.forall { i =>
        val dt = layout(i).dataType
        valueEq(dt, pre.get(i, dt), post.get(i, dt))
      }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case CdfTaggedPartition(ip, tpe, v, ts) =>
        tagged(inner.createReader(ip), tpe, v, ts)
      case d: CdfDiffPartition => diffReader(d)
      case d: CdfDvPartition => tagged(dvSelectionReader(d),
        d.changeType, d.version, d.tsMillis)
      case other => inner.createReader(other)
    }

  /** Reads ONLY the rows of a file whose index the new vector masks beyond
    * the old — the inverse of the scan-side mask (selection, not
    * exclusion) — and strips the row-index column back out. */
  private def dvSelectionReader(d: CdfDvPartition): PartitionReader[InternalRow] = {
    val s = inner.dvSupport
    val dvNew = DeletionVectors.read(s.tableRoot, s.conf.value, d.dvNew)
    val delta =
      if (d.dvOld.isEmpty) dvNew
      else org.roaringbitmap.longlong.Roaring64Bitmap.andNot(dvNew,
        DeletionVectors.read(s.tableRoot, s.conf.value, d.dvOld))
    val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
      d.partValues, org.apache.spark.paths.SparkPath.fromPathString(d.absPath),
      0, d.length, Array.empty, 0L, d.length, Map.empty)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(s.rowTypes.indices.filterNot(_ == s.idxOrd).map(i =>
        BoundReference(i, s.rowTypes(i), nullable = true)))
    val it = inner.rawRows(inner.dvReadFunc, pf)
      .filter(r => delta.contains(r.getLong(s.idxOrd)))
      .map(proj)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  /** Single-pass sort-merge diff of a group's pre/post states. */
  private def diffReader(d: CdfDiffPartition): PartitionReader[InternalRow] = {
    def side(g: Option[GraftFileGroup]): PartitionReader[InternalRow] =
      inner.createReader(GraftPkInputPartition(d.bucket, g.toArray))
    val preR = side(d.pre)
    val postR = side(d.post)
    val keyOrd = keyOrdering
    val valuesEqual = valuesEqualFn
    val joined = new JoinedRow
    val insertTag = changeRow("insert", d.version, d.tsMillis)
    val deleteTag = changeRow("delete", d.version, d.tsMillis)
    val updPreTag = changeRow("update_preimage", d.version, d.tsMillis)
    val updPostTag = changeRow("update_postimage", d.version, d.tsMillis)

    new PartitionReader[InternalRow] {
      // one-row lookahead per side; rows COPIED (readers reuse buffers)
      private var pre: InternalRow = advance(preR)
      private var post: InternalRow = advance(postR)
      private val pending = mutable.Queue.empty[InternalRow]
      private var current: InternalRow = _

      private def advance(r: PartitionReader[InternalRow]): InternalRow =
        if (r.next()) r.get().copy() else null

      override def next(): Boolean = {
        while (pending.isEmpty && (pre != null || post != null)) {
          if (pre == null) {
            pending.enqueue(joined(post, insertTag).copy())
            post = advance(postR)
          } else if (post == null) {
            pending.enqueue(joined(pre, deleteTag).copy())
            pre = advance(preR)
          } else {
            val c = keyOrd.compare(pre, post)
            if (c < 0) {
              pending.enqueue(joined(pre, deleteTag).copy())
              pre = advance(preR)
            } else if (c > 0) {
              pending.enqueue(joined(post, insertTag).copy())
              post = advance(postR)
            } else {
              if (!valuesEqual(pre, post)) {
                pending.enqueue(joined(pre, updPreTag).copy())
                pending.enqueue(joined(post, updPostTag).copy())
              } // identical rows carried over by the rewrite: suppressed
              pre = advance(preR)
              post = advance(postR)
            }
          }
        }
        if (pending.isEmpty) false
        else { current = pending.dequeue(); true }
      }

      override def get(): InternalRow = current
      override def close(): Unit = { preR.close(); postR.close() }
    }
  }
}

/** Scan + builder for `readChangeFeed` reads. Batch consumers use the
  * `graft_table_changes` TVF / `ChangeFeed.changes`; this scan exists for
  * the STREAMING entry point. */
class GraftCdfScan(
    spark: SparkSession,
    path: String,
    tableInfo: TableInfo,
    baseSchema: StructType,
    options: Map[String, String])
  extends Scan {

  override def readSchema(): StructType =
    StructType(baseSchema.fields ++ GraftCdfScan.CHANGE_FIELDS)

  override def description(): String = s"GraftCdfScan $path"

  override def toBatch: Batch = throw new UnsupportedOperationException(
    "batch change-feed reads go through the graft_table_changes table " +
    "function (or ChangeFeed.changes); readChangeFeed is a streaming option")

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdfMicroBatchStream(spark, path, tableInfo, baseSchema,
      options.exists { case (k, v) =>
        k.equalsIgnoreCase("ignoreChanges") && v.toBoolean },
      options)
}

object GraftCdfScan {
  val CHANGE_FIELDS: Array[StructField] = Array(
    StructField(ChangeFeed.CHANGE_TYPE, StringType, nullable = false),
    StructField(ChangeFeed.COMMIT_VERSION, LongType, nullable = false),
    StructField(ChangeFeed.COMMIT_TIMESTAMP, TimestampType, nullable = false))

  def wantsCdf(options: Map[String, String]): Boolean =
    options.exists { case (k, v) =>
      k.equalsIgnoreCase("readChangeFeed") && v.toBoolean }
}

class GraftCdfScanBuilder(
    spark: SparkSession,
    path: String,
    tableInfo: TableInfo,
    baseSchema: StructType,
    options: Map[String, String])
  extends ScanBuilder {
  override def build(): Scan =
    new GraftCdfScan(spark, path, tableInfo, baseSchema, options)
}
