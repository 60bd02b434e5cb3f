package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured-Streaming operators. Built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the idiomatic Spark
  * surface for custom per-key state — so state lives in the streaming state
  * store (checkpointed, recoverable, scaled per key-partition), never in
  * driver memory.
  */
object StreamingOps {

  /** One contiguous activity interval of a key (micros since epoch). A key
    * usually has ONE open interval; late-but-within-watermark events can
    * briefly split activity into several not-yet-mergeable intervals, so
    * the state is a small sorted list, merged as events bridge the gaps. */
  case class SessionIntervals(intervals: Seq[(Long, Long, Long)])

  /** A finished session, emitted once the event-time watermark passes its
    * end + gap (nothing can extend it anymore). */
  case class ClosedSession(
      key: String, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Streaming sessionization: groups each key's events into sessions
    * separated by silences longer than `gapMicros`, emitting a session
    * exactly once — when the watermark guarantees it closed. The streaming
    * twin of [[graft.ops.Relational.sessionize]]: a session here is the
    * same maximal run of events with inter-event gaps <= gap.
    *
    * Mechanics: `flatMapGroupsWithState` in Append mode with event-time
    * timeout. Per key the state is a merged list of activity intervals;
    * each micro-batch folds its events in (extending, bridging or opening
    * intervals), emits every interval whose `end + gap` the watermark has
    * passed, and arms the timeout at the earliest possible close of what
    * remains — so a key with NO new events still closes its session when
    * the watermark advances (the timeout invocation, `hasTimedOut`).
    *
    * Correctness under disorder: the watermark bounds lateness; any event
    * at or after the watermark is still mergeable, which is exactly why
    * intervals are only emitted once `end + gap < watermark` — a
    * later-arriving in-watermark event can never belong to an emitted
    * session. Events at or below the watermark are dropped by Spark's
    * stateful-operator late-row filter before reaching the state function
    * (standard watermark semantics: size `watermarkDelay` to the
    * pipeline's real disorder). Scale: state per key is O(open intervals) (≈1), the operator
    * shuffles once on the key like any stateful agg, and emission is
    * append-only (no output rewrites downstream).
    *
    * `df` must carry `keyCol` (castable to string) and `timeCol`
    * (castable to timestamp). Returns (key, session_start, session_end,
    * n_events) with exactly-once session emission under checkpoint
    * recovery. */
  def sessionize(
      df: DataFrame, keyCol: String, timeCol: String,
      gapMicros: Long,
      watermarkDelay: String = "10 seconds"): Dataset[ClosedSession] = {
    require(gapMicros > 0, "gapMicros must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val gapMillis = math.max(1L, gapMicros / 1000L)

    val events = df
      .select(col(keyCol).cast("string").as("key"),
        col(timeCol).cast("timestamp").as("event_time"))
      .where(col("key").isNotNull && col("event_time").isNotNull)
      .withWatermark("event_time", watermarkDelay)
      .as[(String, java.sql.Timestamp)]

    events.groupByKey(_._1).flatMapGroupsWithState[SessionIntervals, ClosedSession](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key, rows, state: GroupState[SessionIntervals]) =>
        // fold the batch's events into the interval list, merging any
        // intervals an event bridges (list stays sorted by start)
        var intervals = state.getOption.map(_.intervals).getOrElse(Nil).toList
        rows.foreach { case (_, ts) =>
          // full microsecond precision: getTime carries only millis, the
          // sub-millisecond digits live in getNanos — `getTime * 1000`
          // would truncate and diverge from the micros-exact batch
          // sessionizer on sub-ms gaps
          val t = Math.floorDiv(ts.getTime, 1000L) * 1000000L +
            ts.getNanos / 1000L
          val (touching, rest) = intervals.partition { case (s, e, _) =>
            t >= s - gapMicros && t <= e + gapMicros }
          val merged = touching.foldLeft((t, t, 1L)) {
            case ((ms, me, mc), (s, e, c)) =>
              (math.min(ms, s), math.max(me, e), mc + c)
          }
          intervals = (merged :: rest).sortBy(_._1)
        }
        // watermark in micros; -inf before the first trigger computes one
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (closed, open) = intervals.partition { case (_, e, _) =>
          state.getCurrentWatermarkMs() > 0 && e + gapMicros < wmMicros }
        if (open.nonEmpty) {
          state.update(SessionIntervals(open))
          // earliest moment the oldest open interval could close; clamped
          // strictly past the watermark (micros->millis truncation could
          // otherwise land AT it, which Spark rejects / would re-fire)
          state.setTimeoutTimestamp(math.max(
            open.map(_._2).min / 1000L + gapMillis,
            state.getCurrentWatermarkMs() + 1L))
        } else {
          state.remove()
        }
        def microsTs(us: Long): java.sql.Timestamp = {
          val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          t
        }
        closed.sortBy(_._1).iterator.map { case (s, e, c) =>
          ClosedSession(key, microsTs(s), microsTs(e), c)
        }
    }
  }
}
