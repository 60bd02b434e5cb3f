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
  /** DataFrameWriter V1 passes .partitionBy(...) through this option. */
  val V1_PARTITION_COLUMNS = "__partition_columns"

  def run(
      spark: SparkSession,
      tablePath: String,
      df: DataFrame,
      mode: SaveMode,
      options: Map[String, String]): Unit = {
    val path = SnapshotManagement.normalize(tablePath)
    SnapshotManagement.withNewTransaction(path) { txn =>
      txn.snapshotOpt match {
        case None => firstWrite(spark, path, df, options, txn)
        case Some(snapshot) =>
          // INSERT-by-ordinal (e.g. SQL `INSERT INTO t VALUES ...`) arrives
          // with synthetic column names; align positionally to the table's
          // read-order schema (reference `StarLakeAnalysis.scala:43-147`).
          val aligned = alignByPosition(df, snapshot)
          mode match {
            case SaveMode.ErrorIfExists =>
              throw new GraftWriteException(s"graft table already exists at $path")
            case SaveMode.Ignore => ()
            case SaveMode.Append => append(spark, path, aligned, options, snapshot, txn)
            case SaveMode.Overwrite => overwrite(spark, path, aligned, options, snapshot, txn)
          }
      }
    }
  }

  /** Rename generic by-ordinal columns (col1.., or any full-arity mismatch
    * where no incoming name resolves against the table) to the table's
    * read-order column names. */
  private def alignByPosition(
      df: DataFrame, snapshot: Snapshot): DataFrame = {
    val ti = snapshot.tableInfo
    val readOrder = ti.dataSchema.fieldNames ++ ti.rangePartitionSchema.fieldNames
    val incoming = df.columns
    val tableLower = readOrder.map(_.toLowerCase).toSet
    val anyMatch = incoming.exists(c => tableLower.contains(c.toLowerCase))
    if (!anyMatch && incoming.length == readOrder.length) df.toDF(readOrder: _*)
    else df
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
      .map(parseList).getOrElse(Nil)
    val hash = options.get(HASH_PARTITIONS).map(parseList).getOrElse(Nil)
    val bucketNum = options.get(HASH_BUCKET_NUM).map(_.toInt).getOrElse(-1)
    if (hash.nonEmpty) require(bucketNum > 0,
      s"$HASH_BUCKET_NUM must be set (>0) when $HASH_PARTITIONS is set")
    require(range.intersect(hash).isEmpty,
      s"columns cannot be both range and hash partitions: ${range.intersect(hash)}")
    TableInfo(
      tableId = java.util.UUID.randomUUID().toString,
      schemaJson = df.schema.json,
      rangeColumns = range,
      hashColumns = hash,
      bucketNum = bucketNum,
      configuration = options.filter { case (k, _) => k.startsWith("graft.") })
  }

  private def firstWrite(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], txn: Transaction): Unit = {
    val info = tableInfoFromOptions(df, options)
    SchemaUtils.validateSchema(df.schema)
    val files = TransactionalWrite.writeFiles(spark, path, info, df, isBase = true)
    txn.commit("append", Some(info), files, Nil)
  }

  private def append(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], snapshot: Snapshot, txn: Transaction): Unit = {
    val info = snapshot.tableInfo
    if (info.hasPrimaryKey) {
      throw new UnsupportedOperationException(
        "Append is not supported on a hash-partitioned (primary-key) Graft " +
        "table; use upsert instead (reference WriteIntoTable.scala:91-103)")
    }
    val (newInfo, aligned) = evolveSchema(spark, df, info, options)
    val files = TransactionalWrite.writeFiles(spark, path, newInfo, aligned, isBase = true)
    txn.commit("append", if (newInfo == info) None else Some(newInfo), files, Nil)
  }

  private def overwrite(
      spark: SparkSession, path: String, df: DataFrame,
      options: Map[String, String], snapshot: Snapshot, txn: Transaction): Unit = {
    val info0 = snapshot.tableInfo
    val overwriteSchema = options.get(OVERWRITE_SCHEMA).exists(_.toBoolean)
    val info = if (overwriteSchema) {
      tableInfoFromOptions(df, options).copy(tableId = info0.tableId)
    } else info0
    options.get(REPLACE_WHERE) match {
      case Some(predicate) =>
        // replaceWhere keeps the table's layout/schema: files are written
        // with the EXISTING TableInfo and no metadata change is committed.
        // Combining it with overwriteSchema would write files under a new
        // hash/bucket layout the committed metadata never learns about
        // (buckets beyond the old bucketNum would be unplannable) — reject.
        if (overwriteSchema) {
          throw new GraftWriteException(
            s"$OVERWRITE_SCHEMA cannot be combined with $REPLACE_WHERE; " +
            "overwrite the whole table to change its schema or layout")
        }
        replaceWhere(spark, path, df, info0, snapshot, predicate, txn)
      case None =>
        val (newInfo, aligned) =
          if (overwriteSchema) (info, df) else evolveSchema(spark, df, info, options)
        val files = TransactionalWrite.writeFiles(spark, path, newInfo, aligned, isBase = true)
        txn.commit("overwrite", Some(newInfo), files, snapshot.files)
    }
  }

  /** Overwrite only the range partitions matching `predicate`; the incoming
    * data must fall entirely inside them (reference
    * `WriteIntoTable.scala:107-142`). */
  private def replaceWhere(
      spark: SparkSession, path: String, df: DataFrame, info: TableInfo,
      snapshot: Snapshot, predicate: String, txn: Transaction): Unit = {
    require(info.rangeColumns.nonEmpty, "replaceWhere requires a range-partitioned table")
    val cond = expr(predicate)
    val condExpr = org.apache.spark.sql.graft.SparkShims.expression(cond)
    val refs = condExpr.references.map(_.name).toSeq
    val bad = refs.filterNot(info.rangeColumns.contains)
    require(bad.isEmpty,
      s"replaceWhere may reference only range partition columns; got $bad")
    val offending = df.filter(!cond).limit(1).collect()
    if (offending.nonEmpty) {
      throw new GraftWriteException(
        s"written data does not satisfy replaceWhere '$predicate'")
    }
    // Determine which existing partitions match the predicate.
    val removed = PartitionFilter.filterFiles(spark, snapshot, Seq(condExpr))
    val files = TransactionalWrite.writeFiles(spark, path, info, df, isBase = true)
    txn.commit("overwrite", None, files, removed)
  }

  /** Schema check + optional auto-merge (reference
    * `schema/ImplicitMetadataOperation.scala:66-118`). Returns the possibly
    * widened TableInfo and the dataframe to write. */
  private[graft] def evolveSchema(
      spark: SparkSession, df: DataFrame, info: TableInfo,
      options: Map[String, String],
      allowMissingColumns: Boolean = false): (TableInfo, DataFrame) = {
    val tableSchema = info.schema
    val dfSchema = df.schema
    val mergeEnabled = options.get(MERGE_SCHEMA).map(_.toBoolean).getOrElse(
      spark.conf.getOption("spark.graft.schema.autoMerge.enabled").exists(_.toBoolean))
    val newCols = dfSchema.fields.filter(f =>
      !tableSchema.fieldNames.map(_.toLowerCase).contains(f.name.toLowerCase))
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
    if (newCols.nonEmpty && !mergeEnabled) {
      throw new GraftWriteException(
        s"columns ${newCols.map(_.name).mkString(", ")} not present in table " +
        s"schema; set mergeSchema=true or spark.graft.schema.autoMerge.enabled")
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
        case Some(tf) if tf.dataType != f.dataType &&
            org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(f.dataType, tf.dataType) =>
          col(s"`${f.name}`").cast(tf.dataType).as(tf.name)
        case _ => col(s"`${f.name}`")
      }
    }: _*)
    SchemaUtils.checkCompatible(tableSchema, casted.schema)
    val merged = SchemaUtils.mergeSchemas(tableSchema, casted.schema)
    val newInfo = if (merged == tableSchema) info
      else info.copy(schemaJson = merged.json)
    (newInfo, casted)
  }
}
