package graft.catalog

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.SnapshotManagement

/** SQL `CALL` surface for table maintenance (Spark 4 `ProcedureCatalog`):
  *
  * {{{
  *   CALL spark_catalog.system.compact(table => '/path')
  *   CALL spark_catalog.system.compact('/path', 'dt = ''2024-01-01''')
  *   CALL spark_catalog.system.zorder('/path', 'a,b')
  *   CALL spark_catalog.system.vacuum('/path', retain_hours => 0, dry_run => true)
  * }}}
  *
  * Each procedure returns a one-row (or per-file, for vacuum) result set
  * via `LocalScan` so `CALL` output is queryable. The reference exposes
  * maintenance only through its Scala/Livy API; SQL-first operations are
  * table stakes for a lakehouse SQL surface (Iceberg's procedure UX).
  */
object GraftProcedures {
  val NAMESPACE: Array[String] = Array("system")

  val all: Seq[String] = Seq("compact", "zorder", "vacuum", "restore",
    "rebucket", "clone", "create_mv", "refresh_mv", "drop_mv",
    "apply_changes", "generate", "ann_rebuild_if_due", "replication_status")

  def load(name: String): Option[UnboundProcedure] = name.toLowerCase match {
    case "compact" => Some(CompactProcedure)
    case "zorder" => Some(ZOrderProcedure)
    case "vacuum" => Some(VacuumProcedure)
    case "restore" => Some(RestoreProcedure)
    case "rebucket" => Some(RebucketProcedure)
    case "clone" => Some(CloneProcedure)
    case "apply_changes" => Some(ApplyChangesProcedure)
    case "generate" => Some(GenerateProcedure)
    case "create_mv" => Some(CreateMvProcedure)
    case "refresh_mv" => Some(RefreshMvProcedure)
    case "drop_mv" => Some(DropMvProcedure)
    case "ann_rebuild_if_due" => Some(AnnRebuildIfDueProcedure)
    case "replication_status" => Some(ReplicationStatusProcedure)
    case _ => None
  }

  private def str(row: InternalRow, i: Int): Option[String] =
    if (row.isNullAt(i)) None else Some(row.getUTF8String(i).toString)

  private def resultScan(schema: StructType, data: Seq[InternalRow]): Scan =
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = data.toArray
    }

  private def one(scan: Scan): java.util.Iterator[Scan] =
    Collections.singletonList(scan).iterator()

  private[catalog] abstract class MaintenanceProcedure(
      procName: String, procDescription: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  /** Resolve a CALL table argument: a path, or a catalog short name. */
  private def resolvePath(spark: SparkSession, table: String): String = {
    val norm = SnapshotManagement.normalize(table)
    if (SnapshotManagement.exists(norm)) norm
    else graft.tables.GraftTable.forName(spark, table).path
  }

  private val versionSchema = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  private def versionRow(path: String): Seq[InternalRow] = Seq(
    InternalRow(UTF8String.fromString(path),
      SnapshotManagement.store.latestVersion(path)))

  object CompactProcedure extends MaintenanceProcedure("compact",
      "Merge delta stacks / bin-pack small files; optional partition predicate") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table path or catalog name").build(),
      ProcedureParameter.in("predicate", StringType).defaultValue("NULL")
        .comment("range-partition predicate scoping the rewrite").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = resolvePath(spark, str(input, 0).get)
      graft.commands.CompactionCommand.run(spark, path, force = true,
        partitionPredicate = str(input, 1))
      one(resultScan(versionSchema, versionRow(path)))
    }
  }

  object ZOrderProcedure extends MaintenanceProcedure("zorder",
      "Rewrite clustered on the Morton curve of the given columns") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("columns", StringType)
        .comment("comma-separated column list").build(),
      ProcedureParameter.in("predicate", StringType).defaultValue("NULL").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = resolvePath(spark, str(input, 0).get)
      val cols = str(input, 1).get.split(",").map(_.trim).filter(_.nonEmpty)
      graft.commands.CompactionCommand.run(spark, path, force = true,
        partitionPredicate = str(input, 2), zOrderBy = cols.toSeq)
      one(resultScan(versionSchema, versionRow(path)))
    }
  }

  object RestoreProcedure extends MaintenanceProcedure("restore",
      "Rewind the table to a past version (metadata-only; lineage kept)") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("version", LongType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = resolvePath(spark, str(input, 0).get)
      // a null version slot reads as 0L through getLong — which would
      // silently rewind to the very first version
      require(!input.isNullAt(1), "restore: version must not be NULL")
      val v = graft.commands.RestoreCommand.run(spark, path, input.getLong(1))
      // report the RESTORE commit's own version (re-reading latestVersion
      // would race with concurrent writers)
      one(resultScan(versionSchema,
        Seq(InternalRow(UTF8String.fromString(path), v))))
    }
  }

  object RebucketProcedure extends MaintenanceProcedure("rebucket",
      "Change a primary-key table's hash-bucket count in one rewrite") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("bucket_num", IntegerType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = resolvePath(spark, str(input, 0).get)
      require(!input.isNullAt(1), "rebucket: bucket_num must not be NULL")
      val v = graft.commands.RebucketCommand.run(spark, path, input.getInt(1))
      one(resultScan(versionSchema,
        Seq(InternalRow(UTF8String.fromString(path), v))))
    }
  }

  object CloneProcedure extends MaintenanceProcedure("clone",
      "Zero-copy SHALLOW CLONE of a table (optionally at a past version " +
        "or timestamp)") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType)
        .comment("source table path or catalog name").build(),
      ProcedureParameter.in("dest", StringType)
        .comment("destination table path (must not exist)").build(),
      ProcedureParameter.in("version", LongType).defaultValue("NULL")
        .comment("source version to clone; default latest").build(),
      ProcedureParameter.in("timestamp", StringType).defaultValue("NULL")
        .comment("clone the newest version at or before this wall-clock " +
          "cut (same forms as timestampAsOf); exclusive with version")
        .build(),
      ProcedureParameter.in("deep", BooleanType).defaultValue("false")
        .comment("localize the clone before returning (forced compaction " +
          "rewrites source refs into the clone's root)").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val src = resolvePath(spark, str(input, 0).get)
      val dest = str(input, 1).get
      val version = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val ts = str(input, 3)
      val deep = !input.isNullAt(4) && input.getBoolean(4)
      require(version.isEmpty || ts.isEmpty,
        "clone: pass version OR timestamp, not both")
      val at = ts.map(t => SnapshotManagement.versionAtTimestamp(src,
        graft.sources.GraftTableV2.parseTs(spark, t))).orElse(version)
      val v = graft.commands.CloneCommand.run(spark, src, dest, at, deep)
      one(resultScan(versionSchema,
        Seq(InternalRow(UTF8String.fromString(
          SnapshotManagement.normalize(dest)), v))))
    }
  }

  object GenerateProcedure extends MaintenanceProcedure("generate",
      "Export the current snapshot as symlink-format manifests for " +
        "external engines (refuses merge-on-read state)") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("mode", StringType)
        .defaultValue("'symlink_format_manifest'").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = resolvePath(spark, str(input, 0).get)
      val mode = str(input, 1).getOrElse("symlink_format_manifest")
      require(mode == "symlink_format_manifest",
        s"generate: unsupported mode '$mode'")
      val n = graft.commands.GenerateCommand.run(spark, table)
      // dedicated schema: the count of manifests written is NOT a table
      // version, and every other procedure's `version` column is one
      val schema = StructType(Seq(
        StructField("table", StringType, nullable = false),
        StructField("manifests_written", LongType, nullable = false)))
      one(resultScan(schema,
        Seq(InternalRow(UTF8String.fromString(
          SnapshotManagement.normalize(table)), n))))
    }
  }

  object ApplyChangesProcedure extends MaintenanceProcedure("apply_changes",
      "CDC APPLY: land a change batch (op column marking deletes, " +
        "optional sequence columns) as ONE atomic delta commit") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("target PK table path or catalog name").build(),
      ProcedureParameter.in("source", StringType)
        .comment("table/view name (or SQL in parentheses) yielding the " +
          "change batch").build(),
      ProcedureParameter.in("op", StringType)
        .comment("column whose value marks the change kind").build(),
      ProcedureParameter.in("sequence", StringType).defaultValue("NULL")
        .comment("comma-separated columns ordering multiple changes per " +
          "key; omit only for single-change-per-key batches").build(),
      ProcedureParameter.in("delete_ops", StringType)
        .defaultValue("'delete,d'")
        .comment("comma-separated op values treated as deletes").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = resolvePath(spark, str(input, 0).get)
      val source = str(input, 1).get.trim
      // a '('-leading source is SQL — hand it to the parser WHOLE
      // (parenthesized queries are valid query primaries; stripping one
      // paren pair would mangle compound forms like '(...) UNION ALL (...)')
      val batch =
        if (source.startsWith("(")) spark.sql(source)
        else spark.table(source)
      val seqs = str(input, 3).map(_.split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
      val dels = str(input, 4).map(_.split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)).getOrElse(Seq("delete", "d"))
      graft.commands.ApplyChangesCommand.run(
        spark, table, batch, str(input, 2).get, seqs, dels)
      one(resultScan(versionSchema, versionRow(table)))
    }
  }

  object CreateMvProcedure extends MaintenanceProcedure("create_mv",
      "Create + register a materialized view over graft tables") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType)
        .comment("storage path for the view's graft table").build(),
      ProcedureParameter.in("query", StringType)
        .comment("view-defining SQL over graft.`path` tables").build(),
      ProcedureParameter.in("hash_partitions", StringType).defaultValue("NULL")
        .comment("optional PK layout for changed-groups-only refresh")
        .build(),
      ProcedureParameter.in("hash_bucket_num", IntegerType)
        .defaultValue("NULL").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = str(input, 0).get
      val opts = (str(input, 2).map("hashPartitions" -> _) ++
        (if (input.isNullAt(3)) None
         else Some("hashBucketNum" -> input.getInt(3).toString))).toMap
      graft.mv.MaterializedViews.create(spark, path, str(input, 1).get, opts)
      one(resultScan(versionSchema,
        versionRow(SnapshotManagement.normalize(path))))
    }
  }

  object RefreshMvProcedure extends MaintenanceProcedure("refresh_mv",
      "Refresh a stale materialized view (incremental fold when eligible)") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = str(input, 0).get
      graft.mv.MaterializedViews.refresh(spark, path)
      one(resultScan(versionSchema,
        versionRow(SnapshotManagement.normalize(path))))
    }
  }

  object DropMvProcedure extends MaintenanceProcedure("drop_mv",
      "Unregister a materialized view and delete its storage") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("path", StringType).build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = SnapshotManagement.normalize(str(input, 0).get)
      graft.mv.MaterializedViews.drop(spark, path)
      one(resultScan(versionSchema,
        Seq(InternalRow(UTF8String.fromString(path), -1L))))
    }
  }

  object AnnRebuildIfDueProcedure extends MaintenanceProcedure(
      "ann_rebuild_if_due",
      "Pay a deferred churn-triggered ANN index rebuild: build a fresh " +
        "generation off the sync path and atomically swap") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("index", StringType)
        .comment("ANN index root path").build(),
      ProcedureParameter.in("corpus", StringType)
        .comment("corpus table path the index syncs from").build(),
      ProcedureParameter.in("id_col", StringType).build(),
      ProcedureParameter.in("vec_col", StringType).build(),
      ProcedureParameter.in("n_centroids", IntegerType).defaultValue("16")
        .build(),
      ProcedureParameter.in("hash_bucket_num", IntegerType).defaultValue("4")
        .build(),
      ProcedureParameter.in("force", BooleanType).defaultValue("false")
        .comment("rebuild even when no churn debt is marked").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val idx = str(input, 0).get
      val corpus = resolvePath(spark, str(input, 1).get)
      val ran = graft.llm.AnnIndex.rebuildIfDue(spark, idx, corpus,
        str(input, 2).get, str(input, 3).get,
        if (input.isNullAt(4)) 16 else input.getInt(4),
        if (input.isNullAt(5)) 4 else input.getInt(5),
        force = !input.isNullAt(6) && input.getBoolean(6))
      val schema = StructType(Seq(
        StructField("index", StringType, nullable = false),
        StructField("rebuilt", BooleanType, nullable = false),
        StructField("generation", StringType, nullable = false)))
      one(resultScan(schema, Seq(InternalRow(
        UTF8String.fromString(SnapshotManagement.normalize(idx)), ran,
        UTF8String.fromString(graft.llm.AnnIndex.tableRoot(idx))))))
    }
  }

  object ReplicationStatusProcedure extends MaintenanceProcedure(
      "replication_status",
      "Replication lag of a replica: newest applied source version vs " +
        "the source's current version (pure rewrites never count)") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("replica", StringType)
        .comment("replica table path").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val st = graft.tables.GraftTable.replicationStatus(
        spark, resolvePath(spark, str(input, 0).get))
      val schema = StructType(Seq(
        StructField("source_path", StringType, nullable = false),
        StructField("source_version", LongType, nullable = false),
        StructField("applied_version", LongType, nullable = false),
        StructField("pending_versions", LongType, nullable = false),
        StructField("in_sync", BooleanType, nullable = false)))
      one(resultScan(schema, Seq(InternalRow(
        UTF8String.fromString(st.sourcePath), st.sourceVersion,
        st.appliedVersion, st.pendingVersions, st.inSync))))
    }
  }

  object VacuumProcedure extends MaintenanceProcedure("vacuum",
      "Delete files no longer referenced by the latest snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("retain_hours", DoubleType).defaultValue("5.0")
        .comment("retention floor in hours").build(),
      ProcedureParameter.in("dry_run", BooleanType).defaultValue("false").build())

    private val schema = StructType(Seq(
      StructField("removed_path", StringType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val path = resolvePath(spark, str(input, 0).get)
      val hours = if (input.isNullAt(1)) 5.0 else input.getDouble(1)
      val dryRun = !input.isNullAt(2) && input.getBoolean(2)
      val removed = graft.commands.CleanupCommand.run(spark, path,
        (hours * 3600 * 1000).toLong, dryRun)
      one(resultScan(schema,
        removed.map(p => InternalRow(UTF8String.fromString(p)))))
    }
  }
}
