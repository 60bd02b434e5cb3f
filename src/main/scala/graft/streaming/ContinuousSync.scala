package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS index maintenance: tail the base table's change-data-feed
  * stream and run the index's incremental sync once per microbatch — the
  * same liveness-only pattern as materialized-view maintenance
  * ([[graft.mv.MaterializedViews.maintainStream]]). The CDF rows
  * themselves are DISCARDED: each sync re-reads its exact version window
  * under the sidecar's own pins (a transactional boundary a streamed
  * frame cannot provide); the stream only signals THAT the base
  * committed data changes, so steady-state cost per firing is the sync's
  * own O(touched) work, and an idle base costs nothing but the trigger
  * poll. Syncs for one maintained artifact (index table, materialized
  * view) are serialized by an in-process lock keyed on its path (two
  * stream threads folding the same window concurrently would double-apply
  * it); cross-process safety stays with each sync's own validation
  * (sidecars for indexes, version pins for views). */
private[graft] object ContinuousSync {

  private val locks = new ConcurrentHashMap[String, Object]()

  def tail(
      spark: SparkSession, basePath: String, maintainedPath: String,
      checkpointDir: String, trigger: Trigger, kind: String)(
      sync: => Unit): StreamingQuery = {
    val norm = graft.meta.SnapshotManagement.normalize(maintainedPath)
    spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(basePath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        val lock = locks.computeIfAbsent(norm, _ => new Object)
        lock.synchronized { sync }; ()
      }
      .trigger(trigger)
      .queryName(s"graft-$kind-maintain-$norm")
      .start()
  }
}
