package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.commands.WriteIntoTable
import graft.meta.{Snapshot, SnapshotManagement}

/** DataSource V2 `Table` for Graft (reference
  * `star/catalog/StarLakeTableV2.scala:38-188`). Reads resolve a snapshot at
  * scan-build time (snapshot isolation); writes route through the
  * transactional command via the V1 write bridge.
  */
class GraftTableV2(
    spark: SparkSession,
    val path: String,
    userSchema: Option[StructType] = None,
    extraOptions: Map[String, String] = Map.empty,
    pinned: Option[Snapshot] = None)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** Time travel: `.option("versionAsOf", n)` or
    * `.option("timestampAsOf", millis | "yyyy-MM-dd HH:mm:ss" | ISO-8601)`
    * pins a historical snapshot. */
  private val pinnedSnapshot: Option[Snapshot] = pinned
    .orElse(extraOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("versionAsOf") =>
        SnapshotManagement.snapshotAt(path, v.toLong)
    })
    .orElse(extraOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("timestampAsOf") =>
        SnapshotManagement.snapshotAtTimestamp(path, GraftTableV2.parseTs(spark, v))
    })

  lazy val snapshotOpt: Option[Snapshot] =
    pinnedSnapshot.orElse(SnapshotManagement.snapshotOpt(path))

  /** True for time-travel reads and DML-internal pinned-file reads — such
    * relations must never be redirected by the MV rewrite. */
  def isPinned: Boolean = pinnedSnapshot.isDefined

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(FilterSql.translatable)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val sql = if (filters.isEmpty) "true"
      else filters.map(FilterSql.toSql).mkString(" AND ")
    graft.commands.DeleteCommand.run(spark, path,
      org.apache.spark.sql.functions.expr(sql))
  }

  override def name(): String = s"graft.`$path`"

  /** File-source column convention: data columns first, then range
    * partition columns. Nullability is PRECISE (`preciseScanSchema`): a
    * column widens to nullable only when some live file physically omits it
    * (partial-column upsert, pre-evolution file) and scan-time null-fill is
    * therefore possible; everything else keeps its declared schema so
    * codegen retains null-check elimination. NOT NULL remains a WRITE-time
    * invariant (`Invariants.enforce` over `tableInfo.schema`). */
  private lazy val computedSchema: StructType = snapshotOpt match {
    case Some(s) =>
      val ti = s.tableInfo
      val base = GraftPkScan.preciseScanSchema(
        StructType(ti.dataSchema.fields ++ ti.rangePartitionSchema.fields),
        s.files,
        neverNull = (ti.hashColumns ++ ti.rangeColumns).toSet)
      if (GraftCdfScan.wantsCdf(extraOptions))
        StructType(base.fields ++ GraftCdfScan.CHANGE_FIELDS)
      else base
    case None => userSchema.getOrElse(new StructType())
  }

  override def schema(): StructType = computedSchema

  override def partitioning(): Array[Transform] = snapshotOpt match {
    case Some(s) =>
      val ti = s.tableInfo
      val range = ti.rangeColumns.map(Expressions.identity)
      val hash =
        if (ti.hasPrimaryKey) Seq(Expressions.bucket(ti.bucketNum, ti.hashColumns: _*))
        else Nil
      (range ++ hash).toArray
    case None => Array.empty
  }

  // Note: V1_BATCH_WRITE (not BATCH_WRITE) — all four SaveModes then route
  // through the V1 CreatableRelationProvider/InsertableRelation bridge into
  // the same transactional command (DataFrameWriter falls back to V1 for
  // ErrorIfExists/Ignore only when BATCH_WRITE is absent).
  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(
    TableCapability.BATCH_READ,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.V1_BATCH_WRITE,
    TableCapability.OVERWRITE_BY_FILTER,
    TableCapability.TRUNCATE,
    TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Resolve the LATEST snapshot at scan-build time (unless pinned): a
    // temp view or cached relation holds this Table instance across
    // commits, and each new query must see the current table state.
    val snapshot0 = pinnedSnapshot.orElse(SnapshotManagement.snapshotOpt(path))
      .getOrElse(throw new graft.meta.GraftTableNotFoundException(path))
    // Scan-time part-merge (reference `star/StarLakePartFileMerge.scala:
    // 33-158`): a table that ARRIVES with a delta stack deeper than the
    // k-way reader should open at once (e.g. compaction was disabled) is
    // compacted before planning — merged files are committed, so the heal
    // pays once. Auto-compaction bounds fan-in going forward; this guard
    // covers pre-existing stacks. Never triggers on pinned reads (time
    // travel, DML-internal).
    val healEnabled = spark.conf
      .getOption("spark.graft.scan.heal.enabled").forall(_.toBoolean)
    val snapshot =
      if (pinnedSnapshot.isDefined || !healEnabled ||
          !snapshot0.tableInfo.hasPrimaryKey) snapshot0
      else {
        val limit = spark.conf.getOption("spark.graft.scan.mergeFanInLimit")
          .map(_.toInt).getOrElse(64)
        // heal ONLY the offending range partitions: compacting the whole
        // table from a read path would turn one deep partition into a
        // full-table rewrite racing every concurrent writer. With the heal
        // disabled (read-only contexts), the wide fan-in merge still runs —
        // slower, but commit-free.
        val deepKeys = snapshot0.files.groupBy(f => (f.rangeKey, f.bucket))
          .filter(_._2.length > limit).keySet.map(_._1)
        if (deepKeys.isEmpty) snapshot0
        else {
          graft.commands.CompactionCommand.run(spark, path, force = true,
            rangeKeys = Some(deepKeys))
          SnapshotManagement.snapshotOpt(path).getOrElse(snapshot0)
        }
      }
    // Precise nullability over the RESOLVED snapshot's files (may be newer
    // than the one `schema()` reported): the non-PK path hands this to the
    // stock parquet builder, whose readers then null-fill optional missing
    // columns instead of throwing on required ones.
    val ti2 = snapshot.tableInfo
    val fullSchema = GraftPkScan.preciseScanSchema(
      StructType(ti2.dataSchema.fields ++ ti2.rangePartitionSchema.fields),
      snapshot.files,
      neverNull = (ti2.hashColumns ++ ti2.rangeColumns).toSet)
    GraftScanBuilder.create(spark, path, snapshot, fullSchema, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(spark, path,
      extraOptions ++ info.options.asCaseSensitiveMap().asScala)
}

/** V2 write bridge: append / truncate / overwrite-by-filter all funnel into
  * the transactional `WriteIntoTable` command (V1 fallback write, as the
  * reference did via `V1WriteBuilder`; Spark 4 kept the `V1Write` trait).
  */
class GraftWriteBuilder(
    spark: SparkSession,
    path: String,
    options: Map[String, String])
  extends WriteBuilder with SupportsOverwrite {

  private var mode: SaveMode = SaveMode.Append
  private var extra: Map[String, String] = Map.empty

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    mode = SaveMode.Overwrite
    val nonTrivial = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (nonTrivial.nonEmpty) {
      val sql = nonTrivial.map(FilterSql.toSql).mkString(" AND ")
      extra += (WriteIntoTable.REPLACE_WHERE -> sql)
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val m = if (overwrite || mode == SaveMode.Overwrite) SaveMode.Overwrite
                  else SaveMode.Append
          WriteIntoTable.run(spark, path, data, m, options ++ extra)
        }
      }
  }
}

object GraftTableV2 {
  /** `timestampAsOf` accepts any timestamp string Spark's own parser takes
    * (`yyyy-MM-dd[ HH:mm:ss[.f]]`, ISO-8601, date-only), a compact
    * `yyyyMMdd` date, or epoch millis — tried in THAT order: digit-only
    * dates like "20250101" must not silently read as epoch millis
    * (1970-01-01), which would pin a wrong snapshot. Real epoch millis
    * (13 digits) never parse as a timestamp string (Spark caps years at 6
    * digits), so they fall through to the numeric branch unharmed.
    * Wall-clock strings resolve in the SESSION timezone
    * (`spark.sql.session.timeZone`), not the JVM default. */
  private[graft] def parseTs(spark: SparkSession, s: String): Long = {
    val t = s.trim
    lazy val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .getZoneId(org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(spark).sessionState.conf.sessionLocalTimeZone)
    def asTimestampString: Option[Long] =
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestamp(
          org.apache.spark.unsafe.types.UTF8String.fromString(t), zone)
        .map(micros => Math.floorDiv(micros, 1000L))
    def asCompactDate: Option[Long] =
      if (!t.matches("[0-9]{8}")) None
      else try {
        Some(java.time.LocalDate
          .parse(t, java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
          .atStartOfDay(zone).toInstant.toEpochMilli)
      } catch { case _: java.time.DateTimeException => None }
    def asEpochMillis: Option[Long] =
      try Some(t.toLong) catch { case _: NumberFormatException => None }
    asTimestampString.orElse(asCompactDate).orElse(asEpochMillis)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse timestampAsOf value '$s' as a timestamp, a yyyyMMdd " +
        "date, or epoch millis"))
  }
}
