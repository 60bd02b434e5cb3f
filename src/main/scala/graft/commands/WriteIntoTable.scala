package graft.commands

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta._
import graft.schema.SchemaUtils
import graft.write.TransactionalWrite

class GraftWriteException(msg: String) extends RuntimeException(msg)

/** Batch write command: append / overwrite / errorIfExists / ignore plus
  * `replaceWhere` partition overwrite. Mirrors the reference
  * `commands/WriteIntoTable.scala:44-146`: the first write defines schema and
  * partitioning; plain Append is forbidden on PK tables (use upsert).
  */
object WriteIntoTable {

  /** Option keys understood by `df.write.format("graft")`. */
  val RANGE_PARTITIONS = "rangePartitions"
  val HASH_PARTITIONS = "hashPartitions"
  val HASH_BUCKET_NUM = "hashBucketNum"
  val REPLACE_WHERE = "replaceWhere"
  val OVERWRITE_SCHEMA = "overwriteSchema"
  val MERGE_SCHEMA = "mergeSchema"
  // idempotent batch writes: a (txnAppId, txnVersion) pair makes the write
  // a silent no-op when a commit with the same appId and >= version already
  // landed — so a retried ETL job (Spark task retry storms, orchestrator
  // re-runs) cannot double-append. Rides the SAME per-app high-water-mark
  // the streaming sink's batch-id idempotence uses, including its
  // commit-time CAS guard: two racing retries of one job serialize at the
  // log and the loser's staged files stay uncommitted (vacuumable).
  val TXN_APP_ID = "txnAppId"
  val TXN_VERSION = "txnVersion"
  /** DataFrameWriter V1 passes .partitionBy(...) through this option. */
  val V1_PARTITION_COLUMNS = "__partition_columns"
  /** Injected by `TagWriteAlignment`: "true" for by-name writes
    * (`df.write.save`, INSERT with a column list), "false" for by-position
    * SQL INSERT. Absent when the write did not pass through a V2 plan. */
  val BY_NAME = "__graft.byName"

  def run(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      mode: SaveMode,
      options: Map[String, String]): Unit = {
    val path = SnapshotManagement.normalize(tablePath)
    val txnInfo = parseTxnOptions(options)
    // restart-on-conflict: a lost create race (expectVersion gate in
    // firstWrite) or a replaceWhere/overwrite conflict re-runs the whole
    // dispatch against a fresh snapshot — the second attempt sees the
    // winner's table and applies the caller's SaveMode semantics to it
    SnapshotManagement.withRewriteTransaction(path) { txn =>
      txn.snapshotOpt match {
        case None =>
          firstWrite(spark, path, dropNullTypeColumns(df, options, None),
            options, txn, txnInfo)
        // already-applied (appId, version): the whole write is a no-op for
        // EVERY SaveMode — replaying an applied logical write must neither
        // duplicate data nor re-raise mode errors. The pre-check skips the
        // write job; the commit-layer guard covers the race where another
        // retry lands between this probe and commit.
        case Some(snapshot) if txnInfo.exists(t =>
            snapshot.streamingBatchIds.getOrElse(t.queryId, -1L)
              >= t.batchId) => ()
        case Some(snapshot) =>
          checkPartitionOptionConflicts(snapshot.tableInfo, options)
          // INSERT-by-ordinal (e.g. SQL `INSERT INTO t VALUES ...`) arrives
          // with synthetic column names; align positionally to the table's
          // read-order schema (reference `StarLakeAnalysis.scala:43-147`).
          // Alignment runs BEFORE NullType pruning: a positional INSERT
          // with an all-NULL column must land that null in its ordinal
          // position (cast to the table's type), not have the column
          // dropped and every later value shifted left.
          val aligned = alignByPosition(df, snapshot, options)
          val pruned = dropNullTypeColumns(aligned, options,
            Some(snapshot.tableInfo))
          mode match {
            case SaveMode.ErrorIfExists =>
              throw new GraftWriteException(s"graft table already exists at $path")
            case SaveMode.Ignore => ()
            case SaveMode.Append =>
              append(spark, path, pruned, options, snapshot, txn, txnInfo)
            case SaveMode.Overwrite =>
              overwrite(spark, path, pruned, options, snapshot, txn, txnInfo)
          }
      }
    }
  }

  /** Parse the (txnAppId, txnVersion) writer options (case-insensitively —
    * DataFrameWriter lowercases option keys) into the streaming-info shape
    * the commit layer's idempotence guard consumes. `private[commands]`:
    * the delta-upsert path honors the same options, so a CDC apply can ride
    * its applied-source-version watermark on the apply commit itself. */
  private[commands] def parseTxnOptions(
      options: Map[String, String]): Option[StreamingInfo] = {
    val o = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options)
    (o.get(TXN_APP_ID), o.get(TXN_VERSION)) match {
      case (Some(app), Some(v)) =>
        require(app.nonEmpty, s"$TXN_APP_ID must be non-empty")
        val ver = try v.toLong catch {
          case _: NumberFormatException => throw new GraftWriteException(
            s"$TXN_VERSION must be a long, got '$v'")
        }
        Some(StreamingInfo(app, ver))
      case (None, None) => None
      case _ => throw new GraftWriteException(
        s"$TXN_APP_ID and $TXN_VERSION must be set together " +
        "(idempotent writes need both the app identity and its version)")
    }
  }

  /** Drop NullType columns from the incoming data (all-null JSON inference;
    * reference `ImplicitMetadataOperation.scala:48-64`): absent from this
    * write, they null-fill on read. Errors when a partition column is
    * NullType or when the pruning leaves no data columns to write. */
  private def dropNullTypeColumns(
      df: DataFrame, options: Map[String, String],
      tableInfo: Option[TableInfo]): DataFrame = {
    graft.schema.SchemaUtils.pruneNullTypes(df.schema) match {
      case None => df
      case Some(pruned) =>
        val partCols: Seq[String] = tableInfo match {
          case Some(info) => info.rangeColumns ++ info.hashColumns
          case None =>
            val o = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options)
            (o.get(RANGE_PARTITIONS).orElse(o.get(V1_PARTITION_COLUMNS))
              .map(parseList).getOrElse(Nil)) ++
              o.get(HASH_PARTITIONS).map(parseList).getOrElse(Nil)
        }
        val keptLower = pruned.fieldNames.map(_.toLowerCase).toSet
        val hadLower = df.schema.fieldNames.map(_.toLowerCase).toSet
        val badPart = partCols.filter(c =>
          hadLower.contains(c.toLowerCase) && !keptLower.contains(c.toLowerCase))
        if (badPart.nonEmpty) {
          throw new GraftWriteException(
            s"partition column(s) ${badPart.mkString(", ")} are NullType " +
            "(or were dropped as NullType); partition columns must have a " +
            "storable type")
        }
        val partLower = partCols.map(_.toLowerCase).toSet
        if (!pruned.fields.exists(f => !partLower.contains(f.name.toLowerCase))) {
          throw new GraftWriteException(
            "all data columns of NullType have been dropped from this write; " +
            "nothing storable remains")
        }
        val dfTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
        df.select(pruned.fields.toSeq.map { f =>
          graft.schema.SchemaUtils
            .alignColumn(col(s"`${f.name}`"), dfTypes(f.name), f.dataType)
            .as(f.name)
        }: _*)
    }
  }

  /** Partitioning is fixed at table creation (reference
    * `StarLakeUtils.scala` + CaseSensitivitySuite "can't change partition
    * columns"): writer options naming DIFFERENT partition columns or bucket
    * count than the table's are rejected; re-stating the same ones is a
    * no-op. */
  private def checkPartitionOptionConflicts(
      info: TableInfo, options0: Map[String, String]): Unit = {
    val options = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options0)
    def sameCols(a: Seq[String], b: Seq[String]): Boolean =
      a.map(_.toLowerCase) == b.map(_.toLowerCase)
    options.get(RANGE_PARTITIONS).orElse(options.get(V1_PARTITION_COLUMNS))
      .map(parseList).filter(_.nonEmpty).foreach { declared =>
      if (!sameCols(declared, info.rangeColumns)) {
        throw new GraftWriteException(
          s"range partition columns [${info.rangeColumns.mkString(", ")}] were " +
          "already set when creating table, it conflicts with your partition " +
          s"columns [${declared.mkString(", ")}]")
      }
    }
    options.get(HASH_PARTITIONS).map(parseList).filter(_.nonEmpty).foreach { declared =>
      if (!sameCols(declared, info.hashColumns)) {
        throw new GraftWriteException(
          s"Hash partition column [${info.hashColumns.mkString(", ")}] was " +
          "already set when creating table, it conflicts with your partition " +
          s"columns [${declared.mkString(", ")}]")
      }
    }
    options.get(HASH_BUCKET_NUM).map(_.toInt).foreach { n =>
      if (info.bucketNum > 0 && n != info.bucketNum) {
        throw new GraftWriteException(
          s"$HASH_BUCKET_NUM ${info.bucketNum} was already set when creating " +
          s"table, it conflicts with your value $n")
      }
    }
  }

  /** Align a by-position write (SQL `INSERT INTO` without a column list) to
    * the table's read-order column names. When `TagWriteAlignment` marked
    * the write by-NAME, incoming names are authoritative — a full-arity
    * rename here would silently remap mismatched columns that should be a
    * schema-mismatch error (or a merge). Untagged writes (V1 fallback and
    * internal callers) keep the old heuristic: rename only generic
    * by-ordinal shapes (full arity, no incoming name resolving against the
    * table). */
  private def alignByPosition(
      df: DataFrame, snapshot: Snapshot,
      options: Map[String, String]): DataFrame = {
    val ti = snapshot.tableInfo
    val readOrder = ti.dataSchema.fieldNames ++ ti.rangePartitionSchema.fieldNames
    val incoming = df.columns
    val byNameOpt = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options)
      .get(BY_NAME).map(_.toBoolean)
    byNameOpt match {
      case Some(true) => df
      case Some(false) =>
        if (incoming.length < readOrder.length) {
          throw new GraftWriteException(
            s"INSERT by position: not enough data columns; table has " +
            s"${readOrder.length} column(s) [${readOrder.mkString(", ")}] but " +
            s"the query produces ${incoming.length} [${incoming.mkString(", ")}]")
        }
        // First N columns map positionally onto the table; extra TRAILING
        // columns keep their own names, so evolveSchema can either reject
        // them (no mergeSchema) or append them to the schema. An extra
        // whose name collides with a table column would make the renamed
        // frame ambiguous (two columns named `a`) and crash the select
        // below with an unhelpful error — reject it cleanly here.
        val extras = incoming.drop(readOrder.length)
        val collide = extras.filter(e =>
          readOrder.exists(_.equalsIgnoreCase(e)))
        if (collide.nonEmpty) {
          throw new GraftWriteException(
            s"INSERT by position: extra trailing column(s) " +
            s"[${collide.mkString(", ")}] collide with table column names; " +
            "rename them or use an INSERT with an explicit column list")
        }
        val renamed = df.toDF(
          (readOrder ++ extras).toIndexedSeq: _*)
        // Struct fields ALSO map by position for positional inserts
        // ((col1, col2) tuples land in (x, y)): rename nested field names
        // to the table's via a pure-rename cast so the downstream by-name
        // alignment sees matching fields.
        val tableTypes = (ti.dataSchema.fields ++ ti.rangePartitionSchema.fields)
          .map(f => f.name -> f.dataType).toMap
        renamed.select(renamed.schema.fields.toSeq.map { f =>
          tableTypes.get(f.name) match {
            // an all-NULL positional value (VALUES (1, NULL)) must become a
            // typed null IN ITS POSITION — left as NullType it would be
            // pruned afterward and every later value would shift left
            case Some(tdt) if f.dataType == org.apache.spark.sql.types.NullType =>
              col(s"`${f.name}`").cast(tdt).as(f.name)
            case Some(tdt) =>
              val target = SchemaUtils.renamePositionally(f.dataType, tdt)
              if (target == f.dataType) col(s"`${f.name}`")
              else col(s"`${f.name}`").cast(target).as(f.name)
            case None => col(s"`${f.name}`")
          }
        }: _*)
      case None =>
        val tableLower = readOrder.map(_.toLowerCase).toSet
        val anyMatch = incoming.exists(c => tableLower.contains(c.toLowerCase))
        if (!anyMatch && incoming.length == readOrder.length) df.toDF(readOrder: _*)
        else df
    }
  }

  private def parseList(s: String): Seq[String] = {
    val t = s.trim
    // __partition_columns arrives JSON-encoded: ["a","b"]
    if (t.startsWith("[")) {
      t.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    } else t.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private[graft] def tableInfoFromOptions(
      df: DataFrame, options0: Map[String, String]): TableInfo = {
    val options = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options0)
    val range = options.get(RANGE_PARTITIONS).orElse(options.get(V1_PARTITION_COLUMNS))
      .map(parseList).getOrElse(Nil).map(normalizePartitionCol(_, df, RANGE_PARTITIONS))
    val hash = options.get(HASH_PARTITIONS).map(parseList).getOrElse(Nil)
      .map(normalizePartitionCol(_, df, HASH_PARTITIONS))
    val bucketNum = options.get(HASH_BUCKET_NUM).map(_.toInt).getOrElse(-1)
    if (hash.nonEmpty && bucketNum <= 0) throw new GraftWriteException(
      s"You must set the bucket num: $HASH_BUCKET_NUM (>0) when $HASH_PARTITIONS is set")
    val dupes = (range ++ hash).groupBy(_.toLowerCase)
      .collect { case (n, g) if g.length > 1 => n }
    if (dupes.nonEmpty) throw new GraftWriteException(
      s"duplicate partition column(s): ${dupes.mkString(", ")} " +
      "(a column may appear once, as either a range or a hash partition)")
    TableInfo(
      tableId = java.util.UUID.randomUUID().toString,
      schemaJson = df.schema.json,
      rangeColumns = range,
      hashColumns = hash,
      bucketNum = bucketNum,
      configuration = options.filter { case (k, _) => k.startsWith("graft.") })
  }

  /** Resolve a declared partition column against the data schema
    * case-insensitively and return the SCHEMA's spelling (reference
    * CaseSensitivitySuite: `option("rangePartitions", "key")` on a
    * DataFrame column `Key` partitions by `Key`). */
  private def normalizePartitionCol(
      name: String, df: DataFrame, optionKey: String): String =
    df.schema.fieldNames.find(_.equalsIgnoreCase(name)).getOrElse(
      throw new GraftWriteException(
        s"$optionKey column $name not found in data columns " +
        s"[${df.columns.mkString(", ")}]"))

  private def firstWrite(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], txn: Transaction,
      txnInfo: Option[StreamingInfo]): Unit = {
    val info = tableInfoFromOptions(df, options)
    SchemaUtils.validateSchema(df.schema)
    val files = TransactionalWrite.writeFiles(spark, path, info, df, isBase = true)
    // expectVersion = 0: the table-creating commit must land FIRST. Losing
    // that race throws a conflict, and run()'s restart re-dispatches the
    // whole write against the winner's table under the caller's SaveMode
    // (ErrorIfExists fails, Append appends, ...) instead of silently
    // committing a second TableInfo at version 1.
    txn.commit("append", Some(info), files, Nil, streaming = txnInfo,
      expectVersion = 0L)
  }

  private def append(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], snapshot: Snapshot, txn: Transaction,
      txnInfo: Option[StreamingInfo] = None): Unit = {
    val info = snapshot.tableInfo
    // A PK table with NO data yet (CREATE TABLE / CTAS registration commits
    // metadata before the first load) takes the append as its initial base
    // load — no keys exist, so upsert-vs-append is indistinguishable. Once
    // data exists, plain append would silently duplicate keys.
    if (info.hasPrimaryKey && snapshot.files.nonEmpty) {
      throw new UnsupportedOperationException(
        "Append is not supported on a hash-partitioned (primary-key) Graft " +
        "table; use upsert instead (reference WriteIntoTable.scala:91-103)")
    }
    val (newInfo, aligned) = evolveSchema(spark, df, info, options)
    val files = TransactionalWrite.writeFiles(spark, path, newInfo, aligned, isBase = true)
    txn.commit("append", if (newInfo == info) None else Some(newInfo), files,
      Nil, streaming = txnInfo)
  }

  private def overwrite(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], snapshot: Snapshot, txn: Transaction,
      txnInfo: Option[StreamingInfo] = None): Unit = {
    val info0 = snapshot.tableInfo
    val overwriteSchema = options.get(OVERWRITE_SCHEMA).exists(_.toBoolean)
    options.get(REPLACE_WHERE) match {
      case Some(predicate) =>
        // replaceWhere keeps the table's layout: files are written under the
        // existing partitioning. overwriteSchema would write files under a
        // new hash/bucket layout the committed metadata never learns about
        // (buckets beyond the old bucketNum would be unplannable) — reject;
        // additive evolution via mergeSchema IS allowed (reference
        // SchemaEnforcementSuite "schema merging with replaceWhere").
        if (overwriteSchema) {
          throw new GraftWriteException(
            s"$OVERWRITE_SCHEMA cannot be combined with $REPLACE_WHERE; " +
            s"use $MERGE_SCHEMA=true to add columns, or overwrite the whole " +
            "table to change its schema or layout")
        }
        val (newInfo, aligned) = evolveSchema(spark, df, info0, options)
        replaceWhere(spark, path, aligned, newInfo,
          if (newInfo == info0) None else Some(newInfo), snapshot, predicate,
          txn, txnInfo)
      case None if overwriteSchema =>
        // Partitioning is immutable (checkPartitionOptionConflicts already
        // rejected options naming different columns); the REPLACED schema
        // must still carry the partition columns, spelled the table's way.
        val renamed = df.select(df.schema.fieldNames.toSeq.map { n =>
          val tableCase = (info0.rangeColumns ++ info0.hashColumns)
            .find(_.equalsIgnoreCase(n))
          tableCase.fold(col(s"`$n`"))(tc => col(s"`$n`").as(tc))
        }: _*)
        graft.schema.SchemaUtils.validateSchema(renamed.schema)
        val have = renamed.schema.fieldNames.toSet
        val missing = (info0.rangeColumns ++ info0.hashColumns).filterNot(have)
        if (missing.nonEmpty) {
          throw new GraftWriteException(
            s"$OVERWRITE_SCHEMA=true cannot drop partition columns " +
            s"[${missing.mkString(", ")}]; partition columns are fixed at " +
            "table creation")
        }
        val info = info0.copy(schemaJson = renamed.schema.json)
        val files = TransactionalWrite.writeFiles(spark, path, info, renamed, isBase = true)
        // rewriteGuard: with an EMPTY snapshot (registered-but-unloaded
        // table) the remove-set gate alone would skip conflict detection
        // and a concurrent append would silently survive the replacement
        txn.commit("overwrite", Some(info), files, snapshot.files,
          streaming = txnInfo, rewriteGuard = true)
      case None =>
        val (newInfo, aligned) = evolveSchema(spark, df, info0, options, isOverwrite = true)
        val files = TransactionalWrite.writeFiles(spark, path, newInfo, aligned, isBase = true)
        txn.commit("overwrite", Some(newInfo), files, snapshot.files,
          streaming = txnInfo, rewriteGuard = true)
    }
  }

  /** Overwrite only the range partitions matching `predicate`; the incoming
    * data must fall entirely inside them (reference
    * `WriteIntoTable.scala:107-142`). */
  private def replaceWhere(
      spark: SparkSession, path: String, df: DataFrame, info: TableInfo,
      metaChange: Option[TableInfo], snapshot: Snapshot, predicate: String,
      txn: Transaction, txnInfo: Option[StreamingInfo] = None): Unit = {
    require(info.rangeColumns.nonEmpty, "replaceWhere requires a range-partitioned table")
    val cond = expr(predicate)
    val condExpr = org.apache.spark.sql.graft.SparkShims.expression(cond)
    // Predicate column references follow the session's case-sensitivity
    // (reference CaseSensitivitySuite "replaceWhere predicate should be
    // case insensitive"): `key = 2` matches range column `Key` unless
    // spark.sql.caseSensitive=true.
    val resolver = spark.sessionState.conf.resolver
    val refs = condExpr.references.map(_.name).toSeq
    val bad = refs.filterNot(r => info.rangeColumns.exists(c => resolver(c, r)))
    if (bad.nonEmpty) throw new GraftWriteException(
      s"replaceWhere may reference only range partition columns " +
      s"[${info.rangeColumns.mkString(", ")}]; got [${bad.mkString(", ")}]")
    // Containment rides the WRITE itself (same single-pass pattern as the
    // conditional upsert, DmlCommands): a separate validation collect()
    // would re-execute the DataFrame, and a non-deterministic source could
    // pass the probe yet write different rows into partitions the commit
    // does not replace. `coalesce(cond, false)`: a NULL predicate row does
    // not satisfy the clause and must fail too.
    val guarded = df.filter(coalesce(
      assert_true(coalesce(cond, lit(false)),
        lit(s"[graft replaceWhere] written data does not satisfy " +
          s"'$predicate'")),
      lit(true)))
    // Determine which existing partitions match the predicate.
    val removed = PartitionFilter.filterFiles(spark, snapshot, Seq(condExpr))
    val files = TransactionalWrite.writeFiles(spark, path, info, guarded,
      isBase = true)
    // rewriteGuard: detect concurrent appends into the replaced partitions
    // even when they currently hold no files (removed == Nil)
    txn.commit("overwrite", metaChange, files, removed, streaming = txnInfo,
      rewriteGuard = true)
  }

  /** Schema check + optional auto-merge (reference
    * `schema/ImplicitMetadataOperation.scala:66-118`). Returns the possibly
    * widened TableInfo and the dataframe to write. */
  private[graft] def evolveSchema(
      spark: SparkSession, df: DataFrame, info: TableInfo,
      options: Map[String, String],
      allowMissingColumns: Boolean = false,
      isOverwrite: Boolean = false): (TableInfo, DataFrame) = {
    val tableSchema = info.schema
    val dfSchema = df.schema
    val options1 = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(options)
    val mergeEnabled = options1.get(MERGE_SCHEMA).map(_.toBoolean).getOrElse(
      spark.conf.getOption("spark.graft.schema.autoMerge.enabled").exists(_.toBoolean))
    val tableByLower = tableSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    // the tombstone marker is engine-internal (PK key deletes riding a
    // delta upsert — MERGE DELETE clauses, CDC apply): it never joins the
    // table schema and never triggers mergeSchema
    dfSchema.fields.find(f => graft.meta.Tombstones.isMarkerCol(f.name))
      .foreach { f =>
        require(f.dataType == org.apache.spark.sql.types.BooleanType,
          s"${graft.meta.Tombstones.COL} must be BOOLEAN, got " +
            f.dataType.simpleString)
        require(info.hasPrimaryKey,
          s"${graft.meta.Tombstones.COL} (key-delete marker) requires a " +
          "primary-key table — non-PK tables have no key to delete by")
      }
    val newCols = dfSchema.fields.filter(f =>
      !tableByLower.contains(f.name.toLowerCase) &&
      !graft.meta.Tombstones.isMarkerCol(f.name))
    // A shared struct column whose incoming value carries EXTRA nested
    // fields also widens the schema (nested evolution).
    val newNested = dfSchema.fields.exists { f =>
      tableByLower.get(f.name.toLowerCase).exists { tf =>
        (tf.dataType, f.dataType) match {
          case (ts: org.apache.spark.sql.types.StructType,
                ds: org.apache.spark.sql.types.StructType) =>
            SchemaUtils.mergeSchemas(ts, ds) != ts
          case _ => false
        }
      }
    }
    // a name dropped metadata-only may still exist physically in old files;
    // re-introducing it via implicit merge would resurrect those values
    val resurrected = newCols.filter(f =>
      info.droppedColumns.contains(f.name.toLowerCase))
    if (resurrected.nonEmpty) {
      throw new GraftWriteException(
        s"column(s) ${resurrected.map(_.name).mkString(", ")} were previously " +
        "dropped and old data files may still hold their values; re-add them " +
        "with ALTER TABLE ... ADD COLUMN (which rewrites the stale data)")
    }
    if ((newCols.nonEmpty || newNested) && !mergeEnabled) {
      val which = if (newCols.nonEmpty) s"columns ${newCols.map(_.name).mkString(", ")}"
        else "nested struct fields"
      throw new GraftWriteException(
        s"schema mismatch detected: $which not present in table schema; set " +
        s"$MERGE_SCHEMA=true or spark.graft.schema.autoMerge.enabled" +
        (if (isOverwrite) s", or replace the schema with $OVERWRITE_SCHEMA=true" else ""))
    }
    // A column-subset write null-fills the omitted columns on read, which a
    // NOT NULL column must reject (reference SchemaEnforcementSuite).
    // Partial-column PK upserts are exempt: merge-on-read keeps the prior
    // (non-null) values instead of null-filling.
    val dfLower = dfSchema.fieldNames.map(_.toLowerCase).toSet
    val missingNotNull =
      if (allowMissingColumns) Array.empty[org.apache.spark.sql.types.StructField]
      else tableSchema.fields.filter(f =>
        !f.nullable && !info.rangeColumns.contains(f.name) &&
        !dfLower.contains(f.name.toLowerCase))
    if (missingNotNull.nonEmpty) {
      throw new GraftWriteException(
        s"NOT NULL column(s) ${missingNotNull.map(_.name).mkString(", ")} " +
        "missing from the written data")
    }
    // Safe implicit up-casts (int->bigint, ...) per store-assignment rules;
    // ACCEPT_ANY_SCHEMA disables Spark's own output casting, so the engine
    // performs it (reference `StarLakeAnalysis.scala:105-155`).
    val byLower = tableSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    val casted = df.select(dfSchema.fields.toSeq.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(tf) => (tf.dataType, f.dataType) match {
          // Shared struct column: reshape the incoming value to the union
          // layout (table fields first, new nested fields appended), so
          // written files carry ONE struct shape per table version and old
          // files null-fill via standard parquet schema clipping. This case
          // MUST precede the scalar upcast: `Cast.canUpCast` matches structs
          // field-by-POSITION (names ignored), so a positional struct cast
          // here would silently remap a mismatched nested field onto the
          // table's same-position field — nested values landing in the
          // wrong column.
          case (ts: org.apache.spark.sql.types.StructType,
                ds: org.apache.spark.sql.types.StructType) if ts != ds =>
            val target = SchemaUtils.mergeSchemas(ts, ds)
            SchemaUtils.alignColumn(col(s"`${f.name}`"), ds, target).as(tf.name)
          // Safe implicit up-casts (int->bigint, ...).
          case (tdt, ddt) if tdt != ddt &&
              org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(ddt, tdt) =>
            col(s"`${f.name}`").cast(tdt).as(tf.name)
          // Decimal literals into float/double columns: `INSERT ... VALUES
          // (0.5)` parses 0.5 as DECIMAL(1,1); every SQL engine stores it
          // into a double column (ANSI store assignment). canUpCast says no
          // (wide decimals exceed double's 15-16 significant digits), so
          // allow it explicitly — fractional-literal inserts must work.
          case (tdt @ (org.apache.spark.sql.types.DoubleType |
                       org.apache.spark.sql.types.FloatType),
                _: org.apache.spark.sql.types.DecimalType) =>
            col(s"`${f.name}`").cast(tdt).as(tf.name)
          // Shared columns are written under the TABLE's spelling so files
          // stay readable under spark.sql.caseSensitive=true (reference
          // CaseSensitivitySuite "schema merging preserves original case").
          case _ => col(s"`${f.name}`").as(tf.name)
        }
        case _ => col(s"`${f.name}`")
      }
    }: _*)
    // the marker column stays out of the persisted table schema (it rides
    // per-file in fileExistCols only)
    val castedForSchema = org.apache.spark.sql.types.StructType(
      casted.schema.fields.filterNot(f =>
        graft.meta.Tombstones.isMarkerCol(f.name)))
    SchemaUtils.checkCompatible(tableSchema, castedForSchema)
    val merged = SchemaUtils.mergeSchemas(tableSchema, castedForSchema)
    val newInfo = if (merged == tableSchema) info
      else info.copy(schemaJson = merged.json)
    (newInfo, casted)
  }
}
