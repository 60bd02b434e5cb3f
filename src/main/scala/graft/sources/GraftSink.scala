package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.streaming.OutputMode

import graft.commands.{GraftWriteException, WriteIntoTable}
import graft.meta._
import graft.schema.SchemaUtils
import graft.write.TransactionalWrite

/** Structured-streaming sink with exactly-once batch idempotence (reference
  * `sources/StarLakeSink.scala:49-93` + `meta/StreamingRecord.scala:41-57`).
  *
  *  - A replayed micro-batch (id <= highest committed id for this query) is
  *    skipped; the batch id commits atomically with the files.
  *  - Complete mode expires all current files first.
  *  - Update mode requires a PK table and routes through upsert semantics
  *    (delta write + merge-on-read).
  */
class GraftSink(
    spark: SparkSession,
    path: String,
    options: Map[String, String],
    partitionColumns: Seq[String],
    outputMode: OutputMode) extends Sink {

  /** Stable identity of the streaming query across restarts. */
  private val queryId: String =
    options.get("queryId").orElse(options.get("checkpointLocation"))
      .getOrElse("graft-default-query")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The micro-batch DataFrame cannot be written directly; re-wrap its
    // already-planned RDD (same technique as the reference sink).
    val batchDf = SparkShims.internalCreateDataFrame(
      spark, SparkShims.toRdd(data), data.schema)
    SchemaUtils.validateSchema(data.schema)

    SnapshotManagement.withNewTransaction(path) { txn =>
      txn.snapshotOpt match {
        case None =>
          val opts = options ++ (if (partitionColumns.nonEmpty)
            Map(WriteIntoTable.RANGE_PARTITIONS -> partitionColumns.mkString(","))
          else Map.empty)
          val info = WriteIntoTable.tableInfoFromOptions(batchDf, opts)
          if (outputMode == OutputMode.Update() && !info.hasPrimaryKey) {
            throw new GraftWriteException(
              "Update output mode requires hashPartitions/hashBucketNum on a graft sink")
          }
          val files = TransactionalWrite.writeFiles(
            spark, path, info, batchDf, isBase = !info.hasPrimaryKey)
          txn.commit("streaming", Some(info), files, Nil,
            Some(StreamingInfo(queryId, batchId)))
        case Some(snapshot) =>
          val last = snapshot.streamingBatchIds.getOrElse(queryId, -1L)
          if (batchId <= last) return // replayed batch: exactly-once skip
          val info = snapshot.tableInfo
          if (outputMode == OutputMode.Update() && !info.hasPrimaryKey) {
            throw new GraftWriteException(
              "Update output mode requires a primary-key (hash-partitioned) graft table")
          }
          // Schema enforcement mirrors the batch writer (reference
          // SchemaEnforcementSuite streaming cases): new columns need
          // mergeSchema / the autoMerge conf; Complete mode may instead
          // REPLACE the schema with overwriteSchema=true (it rewrites all
          // data anyway, so dropped columns leave no stale files behind).
          val overwriteSchema = outputMode == OutputMode.Complete() &&
            options.get(WriteIntoTable.OVERWRITE_SCHEMA).exists(_.toBoolean)
          val (newInfo, aligned) =
            if (overwriteSchema) {
              // same guards as the batch overwriteSchema path: partition
              // columns keep the table's spelling and may not be dropped,
              // and the replaced schema must be valid (no duplicate names)
              val renamed = batchDf.select(batchDf.schema.fieldNames.toSeq.map { n =>
                val tableCase = (info.rangeColumns ++ info.hashColumns)
                  .find(_.equalsIgnoreCase(n))
                tableCase.fold(org.apache.spark.sql.functions.col(s"`$n`"))(tc =>
                  org.apache.spark.sql.functions.col(s"`$n`").as(tc))
              }: _*)
              SchemaUtils.validateSchema(renamed.schema)
              val have = renamed.schema.fieldNames.toSet
              val missing = (info.rangeColumns ++ info.hashColumns).filterNot(have)
              if (missing.nonEmpty) {
                throw new GraftWriteException(
                  s"overwriteSchema=true cannot drop partition columns " +
                  s"[${missing.mkString(", ")}]; partition columns are fixed " +
                  "at table creation")
              }
              (info.copy(schemaJson = renamed.schema.json), renamed)
            }
            else WriteIntoTable.evolveSchema(spark, batchDf, info, options,
              // Update mode is an upsert: a column subset keeps prior values
              // via merge-on-read instead of null-filling, so missing NOT
              // NULL columns are legal there.
              allowMissingColumns = outputMode == OutputMode.Update(),
              isOverwrite = outputMode == OutputMode.Complete())
          val expired =
            if (outputMode == OutputMode.Complete()) snapshot.files else Nil
          val files = TransactionalWrite.writeFiles(
            spark, path, newInfo, aligned,
            isBase = !newInfo.hasPrimaryKey || outputMode == OutputMode.Complete())
          // Complete mode is a full-table REPLACEMENT and must commit as
          // "overwrite" (the batch writer's type for the same operation):
          // "streaming" is an APPEND type, so a downstream stream would
          // re-emit the whole table every batch as fresh rows and the
          // change feeds would tag replaced state as inserts with no
          // deletes. Batch-id idempotence rides the StreamingInfo entry,
          // not the commit type.
          val commitType =
            if (outputMode == OutputMode.Complete()) "overwrite"
            else if (newInfo.hasPrimaryKey) "delta"
            else "streaming"
          txn.commit(commitType,
            if (newInfo == info) None else Some(newInfo), files, expired,
            Some(StreamingInfo(queryId, batchId)))
      }
    }
  }
}
